"""Determinism (SURVEY.md §5 race-detection analogue): same seed ->
bitwise-identical trajectories; different seeds -> different episodes."""

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu.core import types as T
from dexterity_tpu.models import hands
from dexterity_tpu.physics import step as physics_step


def test_physics_step_deterministic():
  hand = hands.AdroitHand()
  model = hand.spec.compile()
  data = T.make_data(model)
  rng = np.random.RandomState(0)
  data = data.replace(qpos=jnp.asarray(rng.uniform(-0.2, 0.4, model.nq)),
                      ctrl=jnp.asarray(rng.uniform(-0.3, 0.3, model.nu)))
  step = jax.jit(lambda d: physics_step.step_n(model, d, 20))
  a = step(data)
  b = step(data)
  np.testing.assert_array_equal(np.asarray(a.qpos), np.asarray(b.qpos))
  np.testing.assert_array_equal(np.asarray(a.qvel), np.asarray(b.qvel))


def test_env_reset_deterministic():
  import functools
  from tests.test_suite import _env_and_fns
  env, reset, step = _env_and_fns('reach', 'state_dense')
  s1, t1 = reset(jax.random.PRNGKey(7))
  s2, t2 = reset(jax.random.PRNGKey(7))
  np.testing.assert_array_equal(np.asarray(s1.task.goal),
                                np.asarray(s2.task.goal))
  np.testing.assert_array_equal(np.asarray(s1.data.qpos),
                                np.asarray(s2.data.qpos))
  s3, _ = reset(jax.random.PRNGKey(8))
  assert not np.array_equal(np.asarray(s1.task.goal),
                            np.asarray(s3.task.goal))


def test_checkpoint_roundtrip(tmp_path):
  from dexterity_tpu.utils import checkpoint
  hand = hands.AdroitHand()
  model = hand.spec.compile()
  data = T.make_data(model)
  data = data.replace(qpos=data.qpos + 0.123)
  path = str(tmp_path / 'state')
  checkpoint.save(path, data)
  loaded = checkpoint.load(path, data)
  np.testing.assert_array_equal(np.asarray(loaded.qpos),
                                np.asarray(data.qpos))
