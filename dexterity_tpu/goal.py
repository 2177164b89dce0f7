"""Goal generation interface (reference: dexterity/goal.py:10-73).

Pure-function protocol: goal sampling and distance computations operate on
(model, data, key) and return arrays — vmappable across environment
batches.  `next_goal` additionally returns an `ok` flag replacing the
reference's GoalInitializationError control flow inside jit.
"""

from __future__ import annotations

import abc

from dexterity_tpu.utils import specs


class GoalGenerator(abc.ABC):
  """Abstract goal generator."""

  def after_compile(self, model) -> None:
    """Hook called once after the task model is compiled."""

  @abc.abstractmethod
  def goal_spec(self) -> specs.Array:
    ...

  def initialize_episode(self, model, data, key):
    """Episode-init physics edits; returns data."""
    del key
    return data

  @abc.abstractmethod
  def next_goal(self, model, data, key):
    """Samples a goal. Returns (goal, data, ok) — data may carry physics
    side effects that must be rolled back by the caller if undesired."""
    ...

  @abc.abstractmethod
  def current_state(self, model, data):
    ...

  def relative_goal(self, goal_state, current_state):
    return goal_state - current_state

  @abc.abstractmethod
  def goal_distance(self, goal_state, current_state):
    ...

  @property
  @abc.abstractmethod
  def name(self) -> str:
    ...
