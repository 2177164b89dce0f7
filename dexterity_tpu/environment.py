"""Batched goal environments (reference: dexterity/environment.py + the
composer.Environment episode loop).

`GoalEnvironment` compiles a GoalTask once into pure `reset(key)` /
`step(state, action)` functions: jit-, vmap- and shard_map-compatible.  The
reference's retry-forever-on-GoalInitializationError semantics
(environment.py:14-33) become a bounded in-graph resampling loop plus a
`goal_ok` flag.

`InteractiveEnvironment` is the single-env stateful wrapper with the
dm_env-style reset()/step() surface the reference exposes (used by the
explore app and examples).
"""

from __future__ import annotations

import enum
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu import task as task_lib
from dexterity_tpu.core import types as T
from dexterity_tpu.physics import step as physics_step
from dexterity_tpu.utils.structs import pytree_dataclass


class StepType(enum.IntEnum):
  FIRST = 0
  MID = 1
  LAST = 2


@pytree_dataclass
class TaskState:
  goal: jax.Array
  goal_distance: jax.Array
  successes: jax.Array               # i32
  success_change_counter: jax.Array  # i32
  solve_start_time: jax.Array        # f
  exceeded_single_goal_time: jax.Array  # bool
  success_registered: jax.Array      # bool
  goal_changed: jax.Array            # bool
  failure_termination: jax.Array     # bool
  goal_ok: jax.Array                 # bool (goal sampling succeeded)


@pytree_dataclass
class EnvState:
  data: T.Data
  task: TaskState
  eff_state: Any
  key: jax.Array
  step_count: jax.Array


@pytree_dataclass
class TimeStep:
  step_type: jax.Array
  reward: jax.Array
  discount: jax.Array
  observation: Dict[str, jax.Array]

  def first(self):
    return self.step_type == StepType.FIRST

  def mid(self):
    return self.step_type == StepType.MID

  def last(self):
    return self.step_type == StepType.LAST


class GoalEnvironment:
  """Compiled batched goal environment."""

  def __init__(self, task: task_lib.GoalTask, dtype=None,
               goal_retries: int = 10,
               time_limit: Optional[float] = None,
               seed: Optional[int] = None,
               strip_singleton_obs_buffer_dim: bool = True):
    self.task = task
    self.model = task.compile()
    # Default dtype follows the jax x64 config (f32 in production, f64 in
    # conformance tests) so model/env dtypes stay consistent.
    self.dtype = dtype if dtype is not None else jnp.zeros(0).dtype
    self._goal_retries = goal_retries
    self._slices = task.effector_slices(self.model)
    self._action_spec = task.action_spec(self.model)
    self.default_seed = seed
    self._strip_obs_buffer_dim = strip_singleton_obs_buffer_dim
    # Episode truncation: explicit time_limit (seconds, like
    # composer.Environment) overrides the task's own step limit.
    if time_limit is not None and np.isfinite(time_limit):
      self._step_limit = int(round(time_limit / task.control_timestep))
    else:
      self._step_limit = task.step_limit

  def _observations(self, model, data, tstate, eff_state):
    obs = self.task.observables(model, data, tstate, eff_state)
    if not self._strip_obs_buffer_dim:
      obs = {k: v[None] for k, v in obs.items()}
    return obs

  # -- specs ------------------------------------------------------------

  def action_spec(self):
    return self._action_spec

  def observation_spec(self):
    state, _ = jax.eval_shape(self.reset, jax.random.PRNGKey(0))
    del state
    _, ts = jax.eval_shape(self.reset, jax.random.PRNGKey(0))
    from dexterity_tpu.utils import specs
    return {k: specs.Array(shape=tuple(v.shape), dtype=v.dtype, name=k)
            for k, v in ts.observation.items()}

  # -- helpers ----------------------------------------------------------

  def _sample_goal(self, data, key):
    """Bounded retry around the goal generator (GoalInitializationError
    semantics without host control flow)."""
    gen = self.task.goal_generator

    def body(carry):
      goal, d, ok, key, tries = carry
      key, sub = jax.random.split(key)
      goal2, d2, ok2 = gen.next_goal(self.model, d, sub)
      return (goal2, d2, ok2, key, tries + 1)

    def cond(carry):
      _, _, ok, _, tries = carry
      return jnp.logical_and(~ok, tries < self._goal_retries)

    gen_shape = (gen.full_goal_shape() if hasattr(gen, 'full_goal_shape')
                 else gen.goal_spec().shape)
    goal0 = jnp.zeros(gen_shape, self.dtype)
    carry = (goal0, data, jnp.asarray(False), key, jnp.asarray(0))
    goal, data, ok, _, _ = jax.lax.while_loop(cond, body, carry)
    return goal, data, ok

  def _apply_effectors(self, data, eff_state, action):
    new_state = dict(eff_state)
    for eff, (lo, hi) in zip(self.task.hand_effectors, self._slices):
      sub = jnp.clip(action[lo:hi],
                     jnp.asarray(self._action_spec.minimum[lo:hi], self.dtype),
                     jnp.asarray(self._action_spec.maximum[lo:hi], self.dtype))
      data, st = eff.set_control(self.model, data, new_state.get(eff.prefix, {}), sub)
      new_state[eff.prefix] = st
    return data, new_state

  def _initial_eff_state(self):
    return {eff.prefix: eff.initial_state(self.model)
            for eff in self.task.hand_effectors}

  def _task_state_after_goal(self, goal, ok, time, goal_distance):
    return TaskState(
        goal=goal,
        goal_distance=goal_distance,
        successes=jnp.asarray(0, jnp.int32),
        success_change_counter=jnp.asarray(0, jnp.int32),
        solve_start_time=jnp.asarray(time, self.dtype),
        exceeded_single_goal_time=jnp.asarray(False),
        success_registered=jnp.asarray(False),
        goal_changed=jnp.asarray(True),
        failure_termination=jnp.asarray(False),
        goal_ok=ok)

  # -- public pure API ---------------------------------------------------

  def reset(self, key: jax.Array):
    """Returns (EnvState, TimeStep)."""
    model = self.model
    key, k_init, k_goal_init, k_goal = jax.random.split(key, 4)
    data = T.make_data(model, dtype=self.dtype)
    data = physics_step.fwd_position(model, data)
    data = self.task.initialize_episode(model, data, k_init)
    data = self.task.goal_generator.initialize_episode(
        model, data, k_goal_init)
    goal, data, ok = self._sample_goal(data, k_goal)
    data = self.task.on_goal_update(
        model, data, TaskState(
            goal=goal, goal_distance=jnp.zeros(()), successes=jnp.zeros((), jnp.int32),
            success_change_counter=jnp.zeros((), jnp.int32),
            solve_start_time=jnp.zeros(()),
            exceeded_single_goal_time=jnp.asarray(False),
            success_registered=jnp.asarray(False),
            goal_changed=jnp.asarray(True),
            failure_termination=jnp.asarray(False), goal_ok=ok))
    data = physics_step.forward(model, data)
    cur = self.task.goal_generator.current_state(model, data)
    tstate = self._task_state_after_goal(
        goal, ok, data.time,
        self.task.goal_generator.goal_distance(goal, cur))
    eff_state = self._initial_eff_state()
    state = EnvState(data=data, task=tstate, eff_state=eff_state, key=key,
                     step_count=jnp.asarray(0, jnp.int32))
    obs = self._observations(model, data, tstate, eff_state)
    ts = TimeStep(step_type=jnp.asarray(StepType.FIRST, jnp.int32),
                  reward=jnp.asarray(0.0, self.dtype),
                  discount=jnp.asarray(1.0, self.dtype),
                  observation=obs)
    return state, ts

  def _switch_flag(self, tstate):
    """before_step goal-switch predicate (reference task.py:154-165)."""
    return tstate.success_change_counter > self.task.steps_before_changing_goal

  def step(self, state: EnvState, action: jax.Array):
    """Returns (EnvState, TimeStep)."""
    tstate = state.task
    data = state.data
    key, k_goal = jax.random.split(state.key)

    # before_step: goal switching.  NOTE: under vmap this cond lowers to
    # a select that executes BOTH branches for every env — for tasks
    # whose goal generator settles physics (reach) that multiplies the
    # step cost ~100x.  Batched callers should use step_batch(), which
    # skips the whole resample under one scalar predicate.
    switch = self._switch_flag(tstate)

    def do_switch(operand):
      data, key = operand
      goal, data, ok = self._sample_goal(data, key)
      return goal, data, ok

    def no_switch(operand):
      data, _ = operand
      return tstate.goal, data, tstate.goal_ok

    goal, data, goal_ok = jax.lax.cond(switch, do_switch, no_switch,
                                       (data, k_goal))
    return self._step_after_switch(state, action, key, switch, goal, data,
                                   goal_ok)

  def step_batch(self, state: EnvState, actions: jax.Array):
    """Batched step (leading batch axis on state/actions): identical
    semantics to vmap(step) — pinned by tests — but the goal resample
    runs under a SCALAR lax.cond on 'any env switches', so the common
    no-switch step skips the resample entirely instead of executing it
    masked for every env (the vmap(cond) -> select pathology; reach's
    settle-based goal generator made vmapped stepping ~100x slower)."""
    tstate = state.task
    keys = jax.vmap(jax.random.split)(state.key)
    key, k_goal = keys[:, 0], keys[:, 1]

    # Static bypass: tasks that never switch goals mid-episode (threshold
    # INT_MAX, e.g. juggle) skip the cond entirely — even an untaken
    # branch costs the full batched Data round-tripping the conditional.
    if self.task.steps_before_changing_goal >= 2**31 - 1:
      switch = jnp.zeros(tstate.successes.shape, bool)
      return jax.vmap(self._step_after_switch)(
          state, actions, key, switch, tstate.goal, state.data,
          tstate.goal_ok)

    switch = jax.vmap(self._switch_flag)(tstate)          # (B,)

    def do_switches(operand):
      data_b, ks = operand
      goal2, data2, ok2 = jax.vmap(self._sample_goal)(data_b, ks)

      def sel(a, b):
        return jnp.where(switch.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)

      return (sel(goal2, tstate.goal),
              jax.tree_util.tree_map(sel, data2, data_b),
              sel(ok2, tstate.goal_ok))

    def no_switches(operand):
      data_b, _ = operand
      return tstate.goal, data_b, tstate.goal_ok

    goal, data, goal_ok = jax.lax.cond(
        jnp.any(switch), do_switches, no_switches, (state.data, k_goal))
    return jax.vmap(self._step_after_switch)(state, actions, key, switch,
                                             goal, data, goal_ok)

  def _step_after_switch(self, state, action, key, switch, goal, data,
                         goal_ok):
    """Everything in step() after goal switching (per-env)."""
    model = self.model
    tstate = state.task
    tstate = tstate.replace(
        goal=goal,
        goal_ok=goal_ok,
        goal_changed=switch,
        success_change_counter=jnp.where(
            switch, 0, tstate.success_change_counter),
        exceeded_single_goal_time=jnp.where(
            switch, False, tstate.exceeded_single_goal_time),
        solve_start_time=jnp.where(switch, data.time,
                                   tstate.solve_start_time),
        success_registered=jnp.where(switch, False,
                                     tstate.success_registered))
    data = self.task.on_goal_update(model, data, tstate)

    # Effectors.
    data, eff_state = self._apply_effectors(data, state.eff_state, action)

    # Physics.
    data = physics_step.step_n(model, data, self.task.n_substeps)

    # after_step (reference task.py:167-185).
    gen = self.task.goal_generator
    cur = gen.current_state(model, data)
    dist = gen.goal_distance(tstate.goal, cur)
    success_now = jnp.all(dist <= self.task.success_threshold)
    counter = jnp.where(success_now, tstate.success_change_counter + 1,
                        tstate.success_change_counter)
    new_success = success_now & ~tstate.success_registered
    successes = tstate.successes + new_success.astype(jnp.int32)
    registered = tstate.success_registered | success_now
    max_time_per_goal = self.task.max_time_per_goal
    if max_time_per_goal is not None:
      exceeded = tstate.exceeded_single_goal_time | (
          ~success_now
          & (data.time - tstate.solve_start_time > max_time_per_goal))
    else:
      exceeded = tstate.exceeded_single_goal_time
    failure = self.task.failure_termination(model, data)
    tstate = tstate.replace(
        goal_distance=dist, success_change_counter=counter,
        successes=successes, success_registered=registered,
        exceeded_single_goal_time=exceeded, failure_termination=failure)

    # Termination / reward / discount (reference task.py:187-204).
    solved = successes >= self.task.successes_needed
    terminate = solved | exceeded | failure
    discount = jnp.where(solved & ~failure, 0.0, 1.0).astype(self.dtype)
    reward = jnp.asarray(
        self.task.get_reward(model, data, tstate), self.dtype)
    obs = self._observations(model, data, tstate, eff_state)

    step_count = state.step_count + 1
    if self._step_limit is not None:
      terminate = terminate | (step_count >= self._step_limit)
    step_type = jnp.where(terminate, StepType.LAST,
                          StepType.MID).astype(jnp.int32)
    new_state = EnvState(data=data, task=tstate, eff_state=eff_state,
                         key=key, step_count=step_count)
    ts = TimeStep(step_type=step_type, reward=reward, discount=discount,
                  observation=obs)
    return new_state, ts


# Plain tasks (no goal machinery) run under the same compiled environment;
# the base Task exposes a null goal generator (see task.py).
Environment = GoalEnvironment


class InteractiveEnvironment:
  """Stateful single-env wrapper with the dm_env-style interface."""

  def __init__(self, env: GoalEnvironment, seed: Optional[int] = None):
    self._env = env
    self._reset = jax.jit(env.reset)
    self._step = jax.jit(env.step)
    self._key = jax.random.PRNGKey(seed or 0)
    self._state = None

  def action_spec(self):
    return self._env.action_spec()

  def observation_spec(self):
    return self._env.observation_spec()

  @property
  def state(self) -> EnvState:
    return self._state

  @property
  def task(self):
    return self._env.task

  def reset(self):
    from dexterity_tpu import exception
    for _ in range(20):  # reference: retry forever; bounded here
      self._key, sub = jax.random.split(self._key)
      self._state, ts = self._reset(sub)
      if bool(self._state.task.goal_ok):
        self._needs_reset = False
        return _to_numpy(ts)
    raise exception.GoalInitializationError(
        'goal sampling failed across retries')

  def step(self, action):
    if self._state is None or getattr(self, '_needs_reset', False):
      return self.reset()
    self._state, ts = self._step(self._state, jnp.asarray(action))
    if bool(ts.last()):
      self._needs_reset = True
    return _to_numpy(ts)


def _to_numpy(ts: TimeStep):
  return jax.tree_util.tree_map(np.asarray, ts)
