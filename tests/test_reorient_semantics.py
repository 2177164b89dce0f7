"""ReOrient episode semantics (reference: tasks/reorient_test.py:13-49 +
task.py discount/termination contract)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexterity_tpu import manipulation


@functools.lru_cache(maxsize=None)
def _env():
  env = manipulation.load('reorient', 'state_dense')
  return env, jax.jit(env.reset), jax.jit(env.step)


def test_reward_components_at_goal():
  """Orientation 1/(d+0.1), success bonus 800, ctrl penalty -0.1||u||^2
  (reference: reorient.py:238-284)."""
  env, reset, step = _env()
  task = env.task
  model = env.model

  from dexterity_tpu.environment import TaskState
  from dexterity_tpu.core import types as T

  data = T.make_data(model)
  goal = jnp.asarray([1.0, 0, 0, 0])

  def tstate(dist):
    return TaskState(
        goal=goal, goal_distance=jnp.asarray([dist]),
        successes=jnp.asarray(0), success_change_counter=jnp.asarray(0),
        solve_start_time=jnp.asarray(0.0),
        exceeded_single_goal_time=jnp.asarray(False),
        success_registered=jnp.asarray(False),
        goal_changed=jnp.asarray(False),
        failure_termination=jnp.asarray(False),
        goal_ok=jnp.asarray(True))

  # At the goal (distance 0): orientation 1/0.1=10 + bonus 800.
  r_goal = float(task.get_reward(model, data, tstate(0.0)))
  assert abs(r_goal - (10.0 + 800.0)) < 1e-4
  # Just outside the tolerance: no bonus.
  r_near = float(task.get_reward(model, data, tstate(0.11)))
  assert abs(r_near - 1.0 / 0.21) < 1e-4
  # Control penalty.
  data_u = data.replace(ctrl=jnp.ones(model.nu))
  r_u = float(task.get_reward(model, data_u, tstate(0.11)))
  assert abs(r_u - (1.0 / 0.21 - 0.1 * model.nu)) < 1e-3


def test_fall_termination_and_discount():
  """Prop on the ground => failure termination with discount 1.0
  (truncation, reference: reorient.py:222-235)."""
  env, reset, step = _env()
  state, ts = reset(jax.random.PRNGKey(0))
  qadr = env.task._prop_qadr
  # Teleport the cube to the ground plane.
  qpos = state.data.qpos.at[qadr:qadr + 3].set(
      jnp.asarray([0.3, 0.3, 0.019]))
  state = state.replace(data=state.data.replace(qpos=qpos))
  state2, ts2 = step(state, jnp.zeros(env.action_spec().shape[0]))
  assert bool(state2.task.failure_termination)
  assert int(ts2.step_type) == 2  # LAST
  assert float(ts2.discount) == 1.0  # truncation, not terminal success
