"""Generic actuator-group effector
(reference: dexterity/effectors/mujoco_actuation.py).

`ActuatorEffector` drives a named subset of the compiled model's actuators.
The action spec is built from ctrlrange exactly as `create_action_spec`
(mujoco_actuation.py:48-67): names are '{prefix}{i}' tab-joined.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from dexterity_tpu import effector
from dexterity_tpu.utils import specs


class ActuatorEffector(effector.Effector):
  """Effector for a set of actuators of the compiled model."""

  def __init__(self, actuator_names: Sequence[str], prefix: str):
    self._actuator_names = tuple(actuator_names)
    self._prefix = prefix
    self._indices: Optional[np.ndarray] = None

  def after_compile(self, model) -> None:
    self._indices = np.asarray(
        [model.actuator_names.index(n) for n in self._actuator_names],
        np.int32)

  def indices(self, model=None) -> np.ndarray:
    """Compiled actuator indices (lazily resolved when a model is given)."""
    if self._indices is None and model is not None:
      self.after_compile(model)
    assert self._indices is not None, 'after_compile() not called'
    return self._indices

  def action_spec(self, model) -> specs.BoundedArray:
    idx = self.indices(model)
    rng = np.asarray(model.actuator_ctrlrange)[idx]
    names = '\t'.join(f'{self._prefix}{i}' for i in range(len(idx)))
    # Unlimited ctrl stays +/-inf (MuJoCo ctrllimited semantics).
    return specs.BoundedArray(
        shape=(len(idx),), dtype=np.float64, name=names,
        minimum=rng[:, 0], maximum=rng[:, 1])

  def set_control(self, model, data, state, command):
    ctrl = data.ctrl.at[jnp.asarray(self.indices())].set(command)
    return data.replace(ctrl=ctrl), state

  @property
  def prefix(self) -> str:
    return self._prefix


# Backwards-compatible alias matching the reference class name.
MujocoEffector = ActuatorEffector
