"""tree_pallas kernel math == production plane pipeline (CPU).

The Pallas compilation path is TPU-only (and a measured negative result —
see the module docstring); what this pins is the `_kernel_body`/`_kernel_dyn`
math, which reformulates the whole tree sweep as one-hot/mask matmuls, against
`physics/step._precompute_planes` (itself conformance-tested vs MuJoCo).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexterity_tpu import manipulation
from dexterity_tpu.physics import step as phys_step
from dexterity_tpu.physics import tree_pallas


@pytest.mark.parametrize('scene', ['reorient'])
def test_reference_sweep_matches_planes(scene):
  task = manipulation.build_task(scene, 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  model = task.compile()
  assert tree_pallas.supports(model)
  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
  d = state.data
  b = 4
  key = jax.random.PRNGKey(1)
  qpos = (jnp.tile(d.qpos[:, None], (1, b))
          + 1e-3 * jax.random.normal(key, (model.nq, b)))
  qvel = (jnp.tile(d.qvel[:, None], (1, b))
          + 1e-2 * jax.random.normal(key, (model.nv, b)))
  mp = jnp.tile(d.mocap_pos[:, :, None], (1, 1, b))
  mq = jnp.tile(d.mocap_quat[:, :, None], (1, 1, b))

  pre = phys_step._precompute_planes(model, qpos, qvel, mp, mq)
  out = tree_pallas._reference_sweep(model, qpos, qvel,
                                     mp.reshape(-1, b), mq.reshape(-1, b))

  np.testing.assert_allclose(out['xpos'].reshape(3, model.nbody, b),
                             pre['xpos_p'], atol=1e-6)
  np.testing.assert_allclose(out['cdof'].reshape(6, model.nv, b),
                             pre['cdof6'], atol=1e-6)
  np.testing.assert_allclose(out['gpos'].reshape(3, model.ngeom, b),
                             jnp.stack(pre['gpos']), atol=1e-6)
  np.testing.assert_allclose(out['gmat'].reshape(9, model.ngeom, b),
                             jnp.stack(pre['gmat']), atol=1e-6)
  np.testing.assert_allclose(out['qm'].reshape(model.nv, model.nv, b),
                             pre['qm'], rtol=1e-6, atol=1e-7)
  np.testing.assert_allclose(out['qfrc_bias'], pre['qfrc_bias'],
                             rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(out['ten_length'], pre['ten_length'],
                             atol=1e-7)
