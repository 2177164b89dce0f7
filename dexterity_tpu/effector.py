"""Effector interface (reference: dexterity/effector.py:8-34).

An effector turns an action sub-vector into actuator controls.  The TPU-
native protocol is pure: `set_control` maps (model, data, state, command) ->
(data, state) where `state` is the effector's own pytree (EMA filters,
previous-action buffers, ...).  Effector index slices into the merged task
action vector are computed once at compile time, replacing the reference's
per-step regex routing (dexterity/task.py:39-45).
"""

from __future__ import annotations

import abc
from typing import Any, Dict

from dexterity_tpu.utils import specs


class Effector(abc.ABC):
  """Abstract effector."""

  def after_compile(self, model) -> None:
    """Hook called once after the task model is compiled."""

  def initial_state(self, model) -> Dict[str, Any]:
    """Returns the effector's initial per-episode state pytree."""
    return {}

  @abc.abstractmethod
  def action_spec(self, model) -> specs.BoundedArray:
    ...

  @abc.abstractmethod
  def set_control(self, model, data, state, command):
    """Applies `command`; returns (data, new_state)."""
    ...

  @property
  @abc.abstractmethod
  def prefix(self) -> str:
    ...
