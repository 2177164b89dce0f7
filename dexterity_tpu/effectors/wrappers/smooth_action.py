"""EMA-smoothing effector wrapper
(reference: dexterity/effectors/wrappers/smooth_action.py:10-63).

smoothed = alpha * command + (1 - alpha) * previous, reset per episode.
alpha = 1 passes commands through unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp

from dexterity_tpu.effectors.wrappers import base


class SmoothAction(base.Wrapper):

  def __init__(self, wrapped, alpha: float):
    if not 0.0 < alpha <= 1.0:
      raise ValueError('`alpha` must be in (0, 1].')
    super().__init__(wrapped)
    self._alpha = alpha

  def initial_state(self, model):
    state = dict(self._wrapped.initial_state(model))
    n = self.action_spec(model).shape[0]
    state['smooth_prev'] = jnp.zeros(n)
    state['smooth_first'] = jnp.asarray(True)
    return state

  def set_control(self, model, data, state, command):
    command = jnp.asarray(command)
    prev = state['smooth_prev']
    smoothed = jnp.where(state['smooth_first'], command,
                         self._alpha * command + (1 - self._alpha) * prev)
    data, state = self._wrapped.set_control(model, data, state, smoothed)
    state = dict(state)
    state['smooth_prev'] = smoothed
    state['smooth_first'] = jnp.asarray(False)
    return data, state
