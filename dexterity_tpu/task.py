"""Task and GoalTask (reference: dexterity/task.py).

A Task composes an arena, hands and effectors into one ModelSpec and defines
pure episode hooks.  Effector action slices into the merged action vector
are computed statically at compile time (replacing the reference's per-step
regex matching over tab-joined spec names, dexterity/task.py:39-45,63-73).

GoalTask carries the goal-reaching episode logic configuration; the actual
per-step state machine (goal switching, success counting, termination,
discounts — semantics of dexterity/task.py:112-228) is executed by
`environment.GoalEnvironment` as jittable pure functions.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from dexterity_tpu import effector as effector_lib
from dexterity_tpu import goal as goal_lib
from dexterity_tpu.utils import specs as spec_utils


class Task:
  """Base class for dexterous manipulation tasks."""

  def __init__(self, arena, hands: Sequence, hand_effectors: Sequence) -> None:
    if len(set(hand.name for hand in hands)) != len(hands):
      raise ValueError('Each hand must have a unique name.')
    if len(set(eff.prefix for eff in hand_effectors)) != len(hand_effectors):
      raise ValueError('Each effector must have a unique prefix.')
    self._arena = arena
    self._hands = tuple(hands)
    self._hand_effectors = tuple(hand_effectors)
    self._control_timestep = 0.02
    self._physics_timestep = 0.02
    self._model = None

  def set_timesteps(self, control_timestep: float, physics_timestep: float):
    self._control_timestep = control_timestep
    self._physics_timestep = physics_timestep
    self._arena.spec.option.timestep = physics_timestep

  @property
  def control_timestep(self) -> float:
    return self._control_timestep

  @property
  def physics_timestep(self) -> float:
    return self._physics_timestep

  @property
  def n_substeps(self) -> int:
    return max(1, round(self._control_timestep / self._physics_timestep))

  # -- compilation -------------------------------------------------------

  def compile(self):
    """Compiles the composed spec; wires effectors. Idempotent."""
    if self._model is None:
      self._model = self._arena.spec.compile()
      for eff in self._hand_effectors:
        eff.after_compile(self._model)
      self.after_compile(self._model)
    return self._model

  def after_compile(self, model) -> None:
    """Subclass hook once the model exists."""

  def action_spec(self, model=None) -> spec_utils.BoundedArray:
    model = model if model is not None else self.compile()
    return spec_utils.merge_specs(
        [eff.action_spec(model) for eff in self._hand_effectors])

  def effector_slices(self, model=None) -> Tuple[Tuple[int, int], ...]:
    """Static (start, stop) action slices per effector."""
    model = model if model is not None else self.compile()
    out = []
    ofs = 0
    for eff in self._hand_effectors:
      n = eff.action_spec(model).shape[0]
      out.append((ofs, ofs + n))
      ofs += n
    return tuple(out)

  # -- pure episode hooks ---------------------------------------------------

  def initialize_episode(self, model, data, key):
    """Returns data after per-episode physics edits."""
    del key
    return data

  def observables(self, model, data, task_state, eff_state) -> dict:
    """Returns the observation dict (static keyset)."""
    del task_state, eff_state
    return {}

  def get_reward(self, model, data, task_state):
    del model, data, task_state
    return 0.0

  def failure_termination(self, model, data):
    """Task-specific failure predicate (e.g. prop fell)."""
    import jax.numpy as jnp
    del model, data
    return jnp.asarray(False)

  def rollout_failure(self, model, data):
    """Failure predicate for *planner rollouts*: may be a cheap
    position-level proxy of failure_termination (rollouts refresh only
    position kinematics, so contact-based predicates are unavailable).
    Defaults to the exact predicate."""
    return self.failure_termination(model, data)

  # Kinematics refresh level planner rollouts need per control step so the
  # task's planning reward / rollout_failure read consistent state:
  # 'position' (frames + sites), or 'none' when they read qpos directly
  # (see physics/step.py step_n).
  plan_refresh = 'position'

  def on_goal_update(self, model, data, task_state):
    """Hook after a goal is (re)sampled — e.g. move visual hint bodies."""
    del model, task_state
    return data

  # -- accessors -------------------------------------------------------------

  @property
  def arena(self):
    return self._arena

  @property
  def hands(self) -> Tuple:
    return self._hands

  @property
  def hand_effectors(self) -> Tuple:
    return self._hand_effectors

  @property
  def step_limit(self) -> Optional[int]:
    return None

  @property
  def time_limit(self) -> float:
    return float('inf')

  # Non-goal tasks run under the same environment machinery with a null
  # goal: zero-dim goal, never-successful threshold, no switching.
  @property
  def goal_generator(self):
    return _NULL_GOAL

  @property
  def success_threshold(self) -> float:
    return -float('inf')

  @property
  def successes_needed(self) -> int:
    return 2 ** 31 - 1

  @property
  def steps_before_changing_goal(self) -> int:
    return 2 ** 31 - 1

  @property
  def max_time_per_goal(self) -> Optional[float]:
    return None


class _NullGoalGenerator(goal_lib.GoalGenerator):
  """Zero-dimensional goal for plain (non-goal) tasks."""

  def goal_spec(self):
    return spec_utils.Array(shape=(0,), dtype=np.float64, name='null_goal')

  def full_goal_shape(self):
    return (0,)

  def next_goal(self, model, data, key):
    import jax.numpy as jnp
    del key
    return jnp.zeros((0,), data.qpos.dtype), data, jnp.asarray(True)

  def current_state(self, model, data):
    import jax.numpy as jnp
    return jnp.zeros((0,))

  def goal_distance(self, goal_state, current_state):
    import jax.numpy as jnp
    return jnp.ones((1,))  # never within a -inf threshold

  @property
  def name(self) -> str:
    return 'null_goal'


_NULL_GOAL = _NullGoalGenerator()


class GoalTask(Task):
  """Goal-reaching task configuration (reference: task.py:112-228)."""

  def __init__(self, arena, hands, hand_effectors,
               goal_generator: goal_lib.GoalGenerator,
               success_threshold: float,
               successes_needed: int = 1,
               steps_before_changing_goal: int = 0,
               max_time_per_goal: Optional[float] = None) -> None:
    super().__init__(arena, hands, hand_effectors)
    self._goal_generator = goal_generator
    self._success_threshold = success_threshold
    self._successes_needed = successes_needed
    self._steps_before_changing_goal = steps_before_changing_goal
    self._max_time_per_goal = max_time_per_goal

  @property
  def goal_generator(self) -> goal_lib.GoalGenerator:
    return self._goal_generator

  @property
  def success_threshold(self) -> float:
    return self._success_threshold

  @property
  def successes_needed(self) -> int:
    return self._successes_needed

  @property
  def steps_before_changing_goal(self) -> int:
    return self._steps_before_changing_goal

  @property
  def max_time_per_goal(self) -> Optional[float]:
    return self._max_time_per_goal
