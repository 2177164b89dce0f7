"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: multi-chip tests via xla_force_host_platform_device_count).
"""

import jax
import jax.numpy as jnp
import numpy as np

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


def _reach_planner(num_samples=16, horizon=4):
  """Small reach planner at CEM fidelity (iterations=2, noise_decay,
  spline-knot noise) — the validated planner's structure at test scale."""
  from dexterity_tpu import manipulation
  from dexterity_tpu.planners import predictive_sampling as ps

  task = manipulation.build_task('reach', 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  planner = ps.PredictiveSampling(
      task, ps.PredictiveSamplingConfig(
          horizon=horizon, num_samples=num_samples, num_knots=2,
          iterations=2, noise_decay=0.5))
  return env, planner


def test_sharded_solve_matches_solve():
  """Config-parity regression (VERDICT r3 item 1): the population-sharded
  solve runs the full validated planner (CEM iterations + noise decay +
  spline-knot noise + reduced planning model) and returns the SAME plan as
  the single-device `solve` given the same key."""
  from dexterity_tpu.planners import distributed

  env, planner = _reach_planner()
  mesh = sharding.make_mesh()
  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
  pstate = planner.init_state()
  key = jax.random.PRNGKey(1)

  with mesh:
    action_s, pstate_s = jax.jit(
        lambda d, g, p, k: distributed.sharded_solve(
            planner, mesh, d, g, p, k))(
        state.data, state.task.goal, pstate, key)
  action_u, pstate_u = jax.jit(planner.solve)(
      state.data, state.task.goal, pstate, key)

  np.testing.assert_allclose(np.asarray(action_s), np.asarray(action_u),
                             atol=1e-6)
  np.testing.assert_allclose(np.asarray(pstate_s.nominal),
                             np.asarray(pstate_u.nominal), atol=1e-6)
  np.testing.assert_allclose(float(pstate_s.best_return),
                             float(pstate_u.best_return), rtol=1e-5)


def test_sharded_solve_batch_matches_solve_batch():
  """Multi-stream form: sharded_solve_batch == solve_batch per stream."""
  from dexterity_tpu.planners import distributed

  env, planner = _reach_planner()
  mesh = sharding.make_mesh()
  g = 2
  keys = jax.random.split(jax.random.PRNGKey(0), g)
  states, _ = jax.jit(jax.vmap(env.reset))(keys)
  pstates = jax.vmap(lambda _: planner.init_state())(jnp.arange(g))
  solve_keys = jax.random.split(jax.random.PRNGKey(1), g)

  with mesh:
    actions_s, pstates_s = jax.jit(
        lambda d, go, p, k: distributed.sharded_solve_batch(
            planner, mesh, d, go, p, k))(
        states.data, states.task.goal, pstates, solve_keys)
  actions_u, pstates_u = jax.jit(planner.solve_batch)(
      states.data, states.task.goal, pstates, solve_keys)

  np.testing.assert_allclose(np.asarray(actions_s), np.asarray(actions_u),
                             atol=1e-6)
  np.testing.assert_allclose(np.asarray(pstates_s.nominal),
                             np.asarray(pstates_u.nominal), atol=1e-6)
