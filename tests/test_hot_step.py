"""Hot (plane-form SoA) substep == AoS reference pipeline.

The planner/env hot path (physics/step.py step_hot) recomputes FK, geom
frames, CRB inertia, RNE bias and the constraint stage from component
planes (physics/math.py plane note).  These tests pin its numerics to the
AoS pipeline — which is itself conformance-tested against MuJoCo
(tests/test_physics_conformance.py) — so plane-form agreement here implies
MuJoCo agreement end-to-end.

Scenes: reorient (free joint + tendons + contacts) and juggle (mocap
welds, MPL polynomial joint/tendon coupling equalities).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexterity_tpu import manipulation
from dexterity_tpu.physics import kinematics, smooth
from dexterity_tpu.physics import step as phys_step


def _contact_rich_state(name, variant, n_warm=20, seed=0):
  task = manipulation.build_task(name, variant)
  env = manipulation._environment.GoalEnvironment(task)
  model = task.compile()
  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(seed))
  data = state.data
  # Random control, a few full steps to reach a contact-rich state.
  key = jax.random.PRNGKey(seed + 1)
  lo = model.actuator_ctrlrange[:, 0]
  hi = model.actuator_ctrlrange[:, 1]
  ctrl = lo + (hi - lo) * jax.random.uniform(key, (model.nu,))
  data = data.replace(ctrl=jnp.where(jnp.isfinite(ctrl), ctrl, 0.0))
  step = jax.jit(lambda d: phys_step.step(model, d))
  for _ in range(n_warm):
    data = step(data)
  return model, data


@pytest.fixture(scope='module')
def reorient():
  return _contact_rich_state('reorient', 'state_dense')


@pytest.fixture(scope='module')
def juggle():
  return _contact_rich_state('juggle', 'state_sparse', n_warm=5)


def test_body_poses_planes_match(reorient):
  model, data = reorient
  ref = kinematics.fwd_position(model, data)
  xpos_p, xquat_p, cdof6 = kinematics.body_poses_planes(
      model, data.qpos, data.mocap_pos, data.mocap_quat)
  np.testing.assert_allclose(xpos_p.T, ref.xpos, atol=1e-12)
  np.testing.assert_allclose(xquat_p.T, ref.xquat, atol=1e-12)
  np.testing.assert_allclose(cdof6.T, ref.cdof, atol=1e-12)
  gpos, gmat = kinematics.frame_planes(
      xpos_p, xquat_p, model.geom_bodyid, model.geom_pos, model.geom_quat,
      data.qpos.dtype)
  np.testing.assert_allclose(jnp.stack(gpos).T, ref.geom_xpos, atol=1e-12)
  np.testing.assert_allclose(
      jnp.stack(gmat).T.reshape(model.ngeom, 3, 3), ref.geom_xmat,
      atol=1e-12)


def test_crb_rne_planes_match(reorient):
  model, data = reorient
  data = kinematics.fwd_position(model, data)
  data = kinematics.fwd_velocity_kinematics(model, data)
  ref_m = smooth.crb(model, data).qM
  ref_bias = smooth.rne(model, data).qfrc_bias

  xpos_p, xquat_p, cdof6 = kinematics.body_poses_planes(
      model, data.qpos, data.mocap_pos, data.mocap_quat)
  body10, xipos3 = smooth.inertia_origin_planes(model, xpos_p, xquat_p)
  qm = smooth.crb_planes(model, body10, cdof6)
  bias, cvel6 = smooth.rne_planes(model, body10, cdof6, data.qvel)

  np.testing.assert_allclose(qm, ref_m, rtol=1e-9, atol=1e-12)
  np.testing.assert_allclose(bias, ref_bias, rtol=1e-9, atol=1e-10)
  np.testing.assert_allclose(cvel6.T, data.cvel, rtol=1e-9, atol=1e-12)
  np.testing.assert_allclose(xipos3.T, data.xipos, atol=1e-12)


def test_xfrc_planes_match(reorient):
  model, data = reorient
  data = kinematics.fwd_position(model, data)
  key = jax.random.PRNGKey(3)
  data = data.replace(
      xfrc_applied=jax.random.normal(key, (model.nbody, 6)))
  ref = smooth.xfrc_accumulate(model, data)
  xpos_p, xquat_p, cdof6 = kinematics.body_poses_planes(
      model, data.qpos, data.mocap_pos, data.mocap_quat)
  _, xipos3 = smooth.inertia_origin_planes(model, xpos_p, xquat_p)
  got = smooth.xfrc_planes(model, xipos3, cdof6, data.xfrc_applied)
  np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize('scene', ['reorient', 'juggle'])
def test_step_hot_matches_step(scene, request):
  model, data = request.getfixturevalue(scene)
  ref = jax.jit(lambda d: phys_step.step(model, d))(data)
  hot = jax.jit(lambda d: phys_step.step_hot(model, d))(data)
  np.testing.assert_allclose(hot.qpos, ref.qpos, rtol=1e-7, atol=1e-9)
  np.testing.assert_allclose(hot.qvel, ref.qvel, rtol=1e-7, atol=1e-8)
  np.testing.assert_allclose(hot.qacc, ref.qacc, rtol=1e-6, atol=1e-6)
  np.testing.assert_allclose(hot.qfrc_constraint, ref.qfrc_constraint,
                             rtol=1e-6, atol=1e-6)
  np.testing.assert_allclose(hot.qfrc_bias, ref.qfrc_bias,
                             rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize('scene', ['reorient', 'juggle'])
def test_step_hot_b_matches_vmap(scene, request):
  """Batch-minor step_hot_b == vmap(step_hot) on a perturbed batch."""
  model, data = request.getfixturevalue(scene)
  b = 4
  key = jax.random.PRNGKey(7)
  import jax.tree_util as jtu
  bdata = jtu.tree_map(
      lambda x: jnp.broadcast_to(x[None], (b,) + x.shape), data)
  dq = 1e-3 * jax.random.normal(key, (b, model.nq))
  bdata = bdata.replace(qpos=bdata.qpos + dq)
  ref = jax.jit(jax.vmap(lambda d: phys_step.step_hot(model, d)))(bdata)
  got = jax.jit(lambda d: phys_step.step_hot_b(model, d))(bdata)
  np.testing.assert_allclose(got.qpos, ref.qpos, rtol=1e-6, atol=1e-8)
  np.testing.assert_allclose(got.qvel, ref.qvel, rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(got.qacc, ref.qacc, rtol=1e-4, atol=1e-3)


def test_step_n_b_midphase_per_call_matches(reorient):
  """Hoisted midphase (one pair selection per call) == per-substep
  selection for n=1 exactly, and to integrator-noise level over a
  5-substep burst (the slot set is stable across a control step)."""
  model, data = reorient
  import jax.tree_util as jtu
  b = 3
  bdata = jtu.tree_map(
      lambda x: jnp.broadcast_to(x[None], (b,) + x.shape), data)
  dq = 1e-3 * jax.random.normal(jax.random.PRNGKey(9), (b, model.nq))
  bdata = bdata.replace(qpos=bdata.qpos + dq)
  for n, tol in ((1, 0.0), (5, 1e-5)):
    a = jax.jit(lambda dd: phys_step.step_n_b(
        model, dd, n, refresh='none', midphase='per_substep'))(bdata)
    c = jax.jit(lambda dd: phys_step.step_n_b(
        model, dd, n, refresh='none', midphase='per_call'))(bdata)
    np.testing.assert_allclose(c.qpos, a.qpos, atol=max(tol, 0.0))
    np.testing.assert_allclose(c.qvel, a.qvel, atol=max(tol * 100, 0.0))


def test_step_n_b_matches_vmap(reorient):
  model, data = reorient
  b, n = 3, 10
  import jax.tree_util as jtu
  bdata = jtu.tree_map(
      lambda x: jnp.broadcast_to(x[None], (b,) + x.shape), data)
  dq = 1e-3 * jax.random.normal(jax.random.PRNGKey(9), (b, model.nq))
  bdata = bdata.replace(qpos=bdata.qpos + dq)
  ref = jax.jit(jax.vmap(lambda d: phys_step.step_n(model, d, n,
                                                    refresh='position')))(
      bdata)
  got = jax.jit(lambda d: phys_step.step_n_b(model, d, n,
                                             refresh='position'))(bdata)
  np.testing.assert_allclose(got.qpos, ref.qpos, rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(got.qvel, ref.qvel, rtol=1e-4, atol=1e-4)
  np.testing.assert_allclose(got.site_xpos, ref.site_xpos,
                             rtol=1e-5, atol=1e-6)


def test_implicit_damping_tracks_euler(reorient):
  """Option.implicit_damping (planning model): folding h*diag(damping)
  into the Newton solve stays close to MuJoCo-Euler semantics for a
  single substep (the per-step deviation is O(h^2); over many contact-
  rich steps trajectories diverge chaotically, so only the one-step
  deviation and long-horizon stability are pinned)."""
  model, data = reorient
  mi = model.replace(opt=model.opt.replace(implicit_damping=True))
  a = jax.jit(lambda d: phys_step.step_hot(model, d))(data)
  b = jax.jit(lambda d: phys_step.step_hot(mi, d))(data)
  # qvel deviates most on the heavily-damped wrist dofs (that is the
  # integrator-family difference); qpos stays h-times tighter.
  np.testing.assert_allclose(b.qpos, a.qpos, atol=5e-4)
  np.testing.assert_allclose(b.qvel, a.qvel, atol=3e-1)
  # Long-horizon stability under the implicit form.
  d = data
  si = jax.jit(lambda d: phys_step.step_hot(mi, d))
  for _ in range(50):
    d = si(d)
  assert bool(jnp.all(jnp.isfinite(d.qpos)))
  assert bool(jnp.all(jnp.abs(d.qvel) < 1e3))


def test_step_n_trajectory_matches_full_steps(reorient):
  model, data = reorient
  n = 20
  out_hot = jax.jit(lambda d: phys_step.step_n(model, d, n))(data)
  step = jax.jit(lambda d: phys_step.step(model, d))
  d = data
  for _ in range(n):
    d = step(d)
  np.testing.assert_allclose(out_hot.qpos, d.qpos, rtol=1e-6, atol=1e-8)
  np.testing.assert_allclose(out_hot.qvel, d.qvel, rtol=1e-5, atol=1e-6)
