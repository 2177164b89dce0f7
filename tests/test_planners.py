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
