"""Effector wrapper storing the last command
(reference: dexterity/effectors/wrappers/previous_action.py:10-34).

The stored action lives in the effector state pytree (key
'previous_action'), available to observables / penalties.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dexterity_tpu.effectors.wrappers import base


class PreviousAction(base.Wrapper):

  def initial_state(self, model):
    state = dict(self._wrapped.initial_state(model))
    n = self.action_spec(model).shape[0]
    state['previous_action'] = jnp.zeros(n)
    return state

  def set_control(self, model, data, state, command):
    data, state = self._wrapped.set_control(model, data, state, command)
    state = dict(state)
    state['previous_action'] = jnp.asarray(command)
    return data, state

  @staticmethod
  def previous_action(state):
    return state['previous_action']
