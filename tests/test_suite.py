"""Suite-level conformance (reference: manipulation/manipulation_test.py,
loader_test.py): every registered task loads, resets, and steps with random
actions; observations match specs; discounts in [0, 1].

The heavy compiled environments are cached per module to bound compile time.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexterity_tpu import manipulation

_EPISODES = 2
_STEPS = 5


def test_registry_nonempty():
  assert len(manipulation.ALL_TASKS) >= 4
  assert ('reach', 'state_dense') in manipulation.ALL_TASKS
  assert ('reach', 'state_sparse') in manipulation.ALL_TASKS
  assert ('reorient', 'state_dense') in manipulation.ALL_TASKS
  assert ('juggle', 'state_sparse') in manipulation.ALL_TASKS
  assert set(manipulation.TASKS_BY_DOMAIN) == {'reach', 'reorient', 'juggle'}


@functools.lru_cache(maxsize=None)
def _env_and_fns(domain, task):
  env = manipulation.load(domain, task)
  return env, jax.jit(env.reset), jax.jit(env.step)


@pytest.mark.parametrize('domain,task', manipulation.ALL_TASKS)
def test_task_runs_episodes(domain, task):
  env, reset, step = _env_and_fns(domain, task)
  spec = env.action_spec()
  rng = np.random.RandomState(0)
  for ep in range(_EPISODES):
    state, ts = reset(jax.random.PRNGKey(ep))
    assert bool(state.task.goal_ok)
    assert int(ts.step_type) == 0
    for _ in range(_STEPS):
      action = rng.uniform(np.where(np.isfinite(spec.minimum),
                                    spec.minimum, -1),
                           np.where(np.isfinite(spec.maximum),
                                    spec.maximum, 1))
      state, ts = step(state, jnp.asarray(action))
      assert 0.0 <= float(ts.discount) <= 1.0
      for k, v in ts.observation.items():
        assert np.all(np.isfinite(np.asarray(v))), k
      assert np.isfinite(float(ts.reward))


def test_action_spec_finite_where_limited():
  env, _, _ = _env_and_fns('reach', 'state_dense')
  spec = env.action_spec()
  assert spec.shape == (24,)
  assert np.all(np.isfinite(spec.minimum[np.isfinite(spec.minimum)]))
  names = spec.name.split('\t')
  assert len(names) == 24
  assert all(n.startswith('adroit_hand_joint') for n in names)


def test_observation_keys_match_reference_taxonomy():
  env, reset, _ = _env_and_fns('reach', 'state_dense')
  _, ts = reset(jax.random.PRNGKey(0))
  keys = set(ts.observation.keys())
  assert 'goal_state' in keys
  assert 'adroit_hand/joint_positions_sin_cos' in keys
  assert 'adroit_hand/joint_velocities' in keys
  assert 'adroit_hand/fingertip_positions' in keys
  assert ts.observation['goal_state'].shape == (15,)


def test_reach_oracle_reward(oracle_steps=30):
  """Oracle drives the sparse reward toward 0
  (reference: manipulation/tasks/reach_test.py:12-35)."""
  env, reset, step = _env_and_fns('reach', 'state_sparse')
  hand = env.task.hand
  state, ts = reset(jax.random.PRNGKey(42))
  # Oracle: goal aux slots [15:] carry the sampled joint configuration;
  # map through joint_positions_to_control (reference oracle_reach.py:38-44).
  # Recomputed every step — the goal switches after 5 in-threshold steps
  # (steps_before_changing_goal semantics, task.py:154-165).
  first_reward = None
  best_reward = -np.inf
  saw_success = 0
  for _ in range(oracle_steps):
    ctrl = hand.joint_positions_to_control(np.asarray(state.task.goal[15:]))
    state, ts = step(state, jnp.asarray(ctrl))
    if first_reward is None:
      first_reward = float(ts.reward)
    best_reward = max(best_reward, float(ts.reward))
    saw_success = max(saw_success, int(state.task.successes))
  assert first_reward <= 0.0
  # The oracle registered at least one solve and the sparse reward hit 0.
  assert saw_success >= 1
  assert best_reward == 0.0


@functools.lru_cache(maxsize=None)
def _juggle_env():
  env = manipulation.load('juggle', 'state_sparse')
  return env, jax.jit(env.reset), jax.jit(env.step)


def test_juggle_runs():
  """2-step juggle smoke (kept out of the slow set so CI covers the domain;
  the full random-rollout coverage lives in test_task_runs_episodes)."""
  env, reset, step = _juggle_env()
  state, ts = reset(jax.random.PRNGKey(0))
  a = jnp.zeros(env.action_spec().shape[0])
  state, ts = step(state, a)
  assert float(ts.reward) == 0.0  # reference: reward stubbed (juggle.py:143)
  assert np.all(np.isfinite(np.asarray(state.data.qpos)))


def test_load_contract_time_limit_and_seed():
  """`load()` honors time_limit/seed/strip_singleton_obs_buffer_dim
  (reference: manipulation/__init__.py:57-86)."""
  env = manipulation.load('reach', 'state_dense', seed=7, time_limit=0.1)
  # 0.1 s at 50 Hz control -> 5 steps.
  assert env._step_limit == 5
  assert env.default_seed == 7
  reset, step = jax.jit(env.reset), jax.jit(env.step)
  state, ts = reset(jax.random.PRNGKey(0))
  a = jnp.zeros(env.action_spec().shape[0])
  for i in range(5):
    state, ts = step(state, a)
  assert bool(ts.last())

  env2 = manipulation.load('reach', 'state_dense',
                           strip_singleton_obs_buffer_dim=False)
  _, ts2 = jax.jit(env2.reset)(jax.random.PRNGKey(0))
  for k, v in ts2.observation.items():
    assert v.shape[0] == 1, k


def test_unsupported_observable_options_raise():
  import dataclasses

  from dexterity_tpu.manipulation.shared import observations
  from dexterity_tpu.models.observables import HandObservables

  bad = dataclasses.replace(
      observations.ObservationSet.STATE_ONLY.value.proprio, buffer_size=4)
  with pytest.raises(NotImplementedError):
    HandObservables(None, 'h/', options={'joint_positions': bad})


def test_vision_preset_returns_pixels():
  """VISION_ONLY realizes camera observables as (84,84,3) uint8 pixels
  (reference: shared/cameras.py:53-64, observations.py VISION preset)."""
  pytest.importorskip('mujoco')
  from dexterity_tpu.manipulation.shared import observations
  from dexterity_tpu.manipulation.tasks import reach

  task = reach.reach_task(
      observation_set=observations.ObservationSet.VISION_ONLY,
      use_dense_reward=True)
  env = manipulation._environment.GoalEnvironment(task)
  reset, step = jax.jit(env.reset), jax.jit(env.step)
  state, ts = reset(jax.random.PRNGKey(0))
  img = ts.observation['front_close']
  assert img.shape == (84, 84, 3)
  assert img.dtype == jnp.uint8
  assert int(np.asarray(img).max()) > 0  # not all black
  # Privileged proprio must be absent under VISION_ONLY.
  assert 'adroit_hand/joint_velocities' not in ts.observation
  assert 'adroit_hand/joint_positions_sin_cos' in ts.observation
  state, ts = step(state, jnp.zeros(env.action_spec().shape[0]))
  assert ts.observation['front_close'].shape == (84, 84, 3)


def test_step_batch_matches_vmapped_step():
  """env.step_batch == vmap(env.step) — including the goal-switch path
  (step_batch runs the resample under a scalar cond; a mixed batch where
  one env switches and others don't must still match per-env)."""
  env, reset, step = _env_and_fns('reach', 'state_dense')
  genv = env._env if hasattr(env, '_env') else env
  b = 3
  keys = jax.random.split(jax.random.PRNGKey(4), b)
  states, _ = jax.jit(jax.vmap(genv.reset))(keys)
  # Force env 0 over the goal-switch threshold.
  counter = states.task.success_change_counter
  counter = counter.at[0].set(
      jnp.asarray(genv.task.steps_before_changing_goal + 1, counter.dtype))
  states = states.replace(task=states.task.replace(
      success_change_counter=counter))
  actions = jnp.zeros((b,) + genv.action_spec().shape)

  s_ref, ts_ref = jax.jit(jax.vmap(genv.step))(states, actions)
  s_b, ts_b = jax.jit(genv.step_batch)(states, actions)

  np.testing.assert_allclose(np.asarray(s_b.data.qpos),
                             np.asarray(s_ref.data.qpos), atol=1e-12)
  np.testing.assert_allclose(np.asarray(s_b.task.goal),
                             np.asarray(s_ref.task.goal), atol=1e-12)
  np.testing.assert_allclose(np.asarray(ts_b.reward),
                             np.asarray(ts_ref.reward), atol=1e-12)
  np.testing.assert_array_equal(np.asarray(s_b.task.goal_changed),
                                np.asarray(s_ref.task.goal_changed))
  assert bool(s_b.task.goal_changed[0]) and not bool(
      s_b.task.goal_changed[1])
