"""Planner regression tests: both MPC families must beat a passive policy
on reach within a few control steps (small configs to bound compile time)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexterity_tpu import manipulation


@functools.lru_cache(maxsize=None)
def _reach():
  env = manipulation.load('reach', 'state_dense')
  return env, jax.jit(env.reset), jax.jit(env.step)


def _mean_dist(state):
  return float(np.mean(np.asarray(state.task.goal_distance)))


def test_predictive_sampling_improves_reach():
  from dexterity_tpu.planners import predictive_sampling as ps
  env, reset, step = _reach()
  planner = ps.PredictiveSampling(
      env.task, ps.PredictiveSamplingConfig(horizon=3, num_samples=32,
                                            noise_scale=0.3))
  solve = jax.jit(planner.solve)
  state, _ = reset(jax.random.PRNGKey(0))
  passive = state
  pstate = planner.init_state()
  for t in range(8):
    action, pstate = solve(state.data, state.task.goal, pstate,
                           jax.random.PRNGKey(t))
    state, _ = step(state, action)
    passive, _ = step(passive, jnp.zeros(planner.nu))
  assert _mean_dist(state) < 0.75 * _mean_dist(passive), (
      _mean_dist(state), _mean_dist(passive))


def test_batched_rollouts_match_vmap():
  """rollout_returns_batched (step_n_b path) == vmap(rollout_return)."""
  from dexterity_tpu.planners import predictive_sampling as ps
  env = manipulation.load('reorient', 'state_dense')
  planner = ps.PredictiveSampling(
      env.task, ps.PredictiveSamplingConfig(
          horizon=3, num_samples=4, failure_penalty=30.0))
  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
  key = jax.random.PRNGKey(5)
  mid = (planner._lo + planner._hi) / 2.0
  acts = mid[None, None] + planner._sample_noise(key, 4)
  acts = jnp.clip(acts, planner._lo, planner._hi)
  ref = jax.jit(jax.vmap(
      lambda a: planner.rollout_return(state.data, state.task.goal, a)))(
          acts)
  got = jax.jit(lambda a: planner.rollout_returns_batched(
      state.data, state.task.goal, a))(acts)
  np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_ilqr_improves_reach():
  from dexterity_tpu.planners import ilqr
  env, reset, step = _reach()
  planner = ilqr.ILQR(env.task, ilqr.ILQRConfig(
      horizon=3, iterations=2, line_search_steps=3))
  solve = jax.jit(planner.solve)
  state, _ = reset(jax.random.PRNGKey(1))
  passive = state
  pstate = planner.init_state()
  for t in range(6):
    action, pstate = solve(state.data, state.task.goal, pstate)
    state, _ = step(state, action)
    passive, _ = step(passive, jnp.zeros(planner.nu))
  assert _mean_dist(state) < 0.8 * _mean_dist(passive), (
      _mean_dist(state), _mean_dist(passive))


@pytest.mark.slow
def test_sqp_improves_reach():
  """SQP (condensed box-QP over the same linearizations) makes progress
  on reach vs the passive rollout — BASELINE configs[3] 'iLQR/SQP'."""
  from dexterity_tpu.planners import sqp
  env, reset, step = _reach()
  planner = sqp.SQP(env.task, sqp.SQPConfig(
      horizon=3, iterations=2, line_search_steps=3, qp_iterations=2))
  solve = jax.jit(planner.solve)
  state, _ = reset(jax.random.PRNGKey(1))
  passive = state
  pstate = planner.init_state()
  for t in range(6):
    action, pstate = solve(state.data, state.task.goal, pstate)
    state, _ = step(state, action)
    passive, _ = step(passive, jnp.zeros(planner.nu))
  assert _mean_dist(state) < 0.8 * _mean_dist(passive), (
      _mean_dist(state), _mean_dist(passive))


def test_solve_batch_matches_vmapped_solve():
  """solve_batch (the multi-stream serving/bench path) == vmap(solve):
  same key schedule, same candidate populations, same chosen plans."""
  from dexterity_tpu.planners import predictive_sampling as ps
  env, reset, step = _reach()
  planner = ps.PredictiveSampling(
      env.task, ps.PredictiveSamplingConfig(horizon=2, num_samples=8,
                                            iterations=2, noise_scale=0.3))
  g = 3
  keys = jax.random.split(jax.random.PRNGKey(1), g)
  states, _ = jax.jit(jax.vmap(env.reset))(keys)
  pstates = jax.vmap(lambda _: planner.init_state())(jnp.arange(g))
  solve_keys = jax.random.split(jax.random.PRNGKey(2), g)

  a_ref, ps_ref = jax.jit(jax.vmap(planner.solve))(
      states.data, states.task.goal, pstates, solve_keys)
  a_b, ps_b = jax.jit(planner.solve_batch)(
      states.data, states.task.goal, pstates, solve_keys)

  np.testing.assert_allclose(np.asarray(a_b), np.asarray(a_ref),
                             rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(np.asarray(ps_b.nominal),
                             np.asarray(ps_ref.nominal),
                             rtol=1e-5, atol=1e-6)
