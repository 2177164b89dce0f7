"""Spec merging and effector wrapper semantics
(reference: task_test.py:17-139, smooth_action_test.py, spec_utils)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dexterity_tpu.utils import specs


def test_merge_specs():
  a = specs.BoundedArray(shape=(2,), dtype=np.float64, name='a0\ta1',
                         minimum=np.array([-1.0, -2.0]),
                         maximum=np.array([1.0, 2.0]))
  b = specs.BoundedArray(shape=(1,), dtype=np.float32, name='b0',
                         minimum=np.array([0.0]), maximum=np.array([3.0]))
  merged = specs.merge_specs([a, b])
  assert merged.shape == (3,)
  assert merged.name == 'a0\ta1\tb0'
  np.testing.assert_allclose(merged.minimum, [-1, -2, 0])
  np.testing.assert_allclose(merged.maximum, [1, 2, 3])


def test_merge_specs_empty_raises():
  with pytest.raises(ValueError):
    specs.merge_specs([])


def test_bounded_array_validate():
  s = specs.BoundedArray(shape=(2,), dtype=np.float64, name=None,
                         minimum=np.zeros(2), maximum=np.ones(2))
  s.validate(np.array([0.5, 0.5]))
  with pytest.raises(ValueError):
    s.validate(np.array([2.0, 0.0]))
  with pytest.raises(ValueError):
    s.validate(np.zeros(3))


class _FakeEffector:
  """Records commands (reference DummyEffector, task_test.py:17-40)."""

  def __init__(self, n=3, prefix='fake'):
    self.n = n
    self._prefix = prefix
    self.received = []

  def after_compile(self, model):
    pass

  def initial_state(self, model):
    return {}

  def action_spec(self, model):
    return specs.BoundedArray(shape=(self.n,), dtype=np.float64,
                              name='\t'.join(f'{self._prefix}{i}'
                                             for i in range(self.n)),
                              minimum=-np.ones(self.n),
                              maximum=np.ones(self.n))

  def set_control(self, model, data, state, command):
    self.received.append(np.asarray(command))
    return data, state

  @property
  def prefix(self):
    return self._prefix


def test_smooth_action_ema():
  """EMA smoothing algebra (reference: smooth_action_test.py:14-44)."""
  from dexterity_tpu.effectors.wrappers import smooth_action
  inner = _FakeEffector()
  eff = smooth_action.SmoothAction(inner, alpha=0.3)
  state = eff.initial_state(None)
  cmds = [np.array([1.0, 0.0, -1.0]), np.array([0.0, 1.0, 0.0]),
          np.array([0.5, 0.5, 0.5])]
  expected = None
  for c in cmds:
    _, state = eff.set_control(None, None, state, jnp.asarray(c))
    expected = c if expected is None else 0.3 * c + 0.7 * expected
    np.testing.assert_allclose(np.asarray(inner.received[-1]), expected,
                               atol=1e-12)


def test_smooth_action_alpha_validation():
  from dexterity_tpu.effectors.wrappers import smooth_action
  with pytest.raises(ValueError):
    smooth_action.SmoothAction(_FakeEffector(), alpha=0.0)
  with pytest.raises(ValueError):
    smooth_action.SmoothAction(_FakeEffector(), alpha=1.5)


def test_previous_action():
  from dexterity_tpu.effectors.wrappers import previous_action
  inner = _FakeEffector()
  eff = previous_action.PreviousAction(inner)
  state = eff.initial_state(None)
  np.testing.assert_allclose(np.asarray(state['previous_action']),
                             np.zeros(3))
  cmd = jnp.asarray([0.1, 0.2, 0.3])
  _, state = eff.set_control(None, None, state, cmd)
  np.testing.assert_allclose(np.asarray(state['previous_action']),
                             [0.1, 0.2, 0.3])


def test_task_validations():
  """Unique names / prefixes (reference: task_test.py:106-112)."""
  from dexterity_tpu import task as task_lib

  class _H:
    name = 'h'

  with pytest.raises(ValueError):
    task_lib.Task(arena=None, hands=[_H(), _H()],
                  hand_effectors=[_FakeEffector(prefix='a'),
                                  _FakeEffector(prefix='b')])

  class _H2:
    name = 'h2'

  with pytest.raises(ValueError):
    task_lib.Task(arena=None, hands=[_H(), _H2()],
                  hand_effectors=[_FakeEffector(prefix='a'),
                                  _FakeEffector(prefix='a')])
