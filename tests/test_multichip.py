"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: multi-chip tests via xla_force_host_platform_device_count).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexterity_tpu.parallel import sharding


def test_mesh_has_8_devices():
  assert len(jax.devices()) == 8
  mesh = sharding.make_mesh()
  assert mesh.shape[sharding.BATCH_AXIS] == 8


def test_shard_batch_places_leading_axis():
  mesh = sharding.make_mesh()
  x = jnp.arange(16.0).reshape(8, 2)
  xs = sharding.shard_batch(mesh, x)
  assert len(xs.sharding.device_set) == 8
  np.testing.assert_allclose(np.asarray(xs), np.asarray(x))


def test_sharded_physics_step():
  """A batch of hand physics steps sharded across the mesh executes and
  matches the unsharded result."""
  from dexterity_tpu.core import types as T
  from dexterity_tpu.models import hands
  from dexterity_tpu.physics import step as physics_step

  hand = hands.AdroitHand()
  model = hand.spec.compile()
  mesh = sharding.make_mesh()
  batch = 8

  data = T.make_data(model)
  rng = np.random.RandomState(0)
  qpos = jnp.asarray(rng.uniform(-0.1, 0.3, (batch, model.nq)))
  datas = jax.vmap(lambda q: data.replace(qpos=q))(qpos)

  stepped_local = jax.jit(jax.vmap(
      lambda d: physics_step.step(model, d)))(datas)

  datas_sharded = sharding.shard_batch(mesh, datas)
  with mesh:
    stepped = jax.jit(jax.vmap(
        lambda d: physics_step.step(model, d)))(datas_sharded)
  np.testing.assert_allclose(np.asarray(stepped.qpos),
                             np.asarray(stepped_local.qpos), atol=1e-12)


@pytest.mark.slow
def test_population_sharded_planner():
  """shard_map population solve returns the same kind of result as the
  single-device solve and executes cross-device collectives."""
  from dexterity_tpu import manipulation
  from dexterity_tpu.planners import distributed
  from dexterity_tpu.planners import predictive_sampling as ps

  task = manipulation.build_task('reach', 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  planner = ps.PredictiveSampling(
      task, ps.PredictiveSamplingConfig(horizon=2, num_samples=16))
  mesh = sharding.make_mesh()
  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
  pstate = planner.init_state()
  with mesh:
    action, pstate2 = jax.jit(
        lambda d, g, p, k: distributed.sharded_solve(
            planner, mesh, d, g, p, k))(
        state.data, state.task.goal, pstate, jax.random.PRNGKey(1))
  assert action.shape == (planner.nu,)
  assert np.isfinite(float(pstate2.best_return))
  assert np.all(np.isfinite(np.asarray(action)))


@pytest.mark.slow
def test_sharded_solve_matches_unsharded_argmax():
  """The population-sharded solve picks exactly the action an unsharded
  evaluation of the same candidate set picks (VERDICT r1 item 3 regression:
  collectives must not change the argmax)."""
  from dexterity_tpu import manipulation
  from dexterity_tpu.planners import distributed
  from dexterity_tpu.planners import predictive_sampling as ps

  task = manipulation.build_task('reach', 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  planner = ps.PredictiveSampling(
      task, ps.PredictiveSamplingConfig(horizon=2, num_samples=16))
  mesh = sharding.make_mesh()
  n_dev = mesh.shape[sharding.BATCH_AXIS]
  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
  pstate = planner.init_state()
  key = jax.random.PRNGKey(1)

  with mesh:
    action, pstate2 = jax.jit(
        lambda d, g, p, k: distributed.sharded_solve(
            planner, mesh, d, g, p, k))(
        state.data, state.task.goal, pstate, key)

  # Reconstruct every shard's candidate set (same fold_in / noise scheme as
  # distributed.sharded_solve) and evaluate unsharded.
  cfg = planner.config
  per_shard = max(1, cfg.num_samples // n_dev)
  rng = planner._hi - planner._lo
  cands = []
  for idx in range(n_dev):
    k = jax.random.fold_in(key, idx)
    noise = (jax.random.normal(k, (per_shard, cfg.horizon, planner.nu),
                               planner.dtype) * cfg.noise_scale * rng)
    c = jnp.concatenate([pstate.nominal[None], pstate.nominal[None] + noise])
    cands.append(jnp.clip(c, planner._lo, planner._hi))
  cands = jnp.concatenate(cands)
  returns = jax.jit(jax.vmap(
      lambda a: planner.rollout_return(state.data, state.task.goal, a)))(
          cands)
  best = int(jnp.argmax(returns))
  np.testing.assert_allclose(np.asarray(action), np.asarray(cands[best][0]),
                             atol=0)
  np.testing.assert_allclose(float(pstate2.best_return),
                             float(returns[best]), rtol=1e-6)
