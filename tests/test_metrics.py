"""In-graph episode metric accumulation (utils.metrics)."""

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu.utils import metrics as metrics_lib


def test_accumulates_returns_and_episodes():
  m = metrics_lib.init(batch_size=3)
  # Step 1: rewards only, nothing done.
  m = metrics_lib.update(m, jnp.asarray([1.0, 2.0, 3.0]),
                         jnp.asarray([False, False, False]),
                         jnp.asarray([0, 0, 0]))
  assert int(m.episodes) == 0
  assert int(m.env_steps) == 3
  # Step 2: env 1 finishes with a success.
  m = metrics_lib.update(m, jnp.asarray([1.0, 1.0, 0.0]),
                         jnp.asarray([False, True, False]),
                         jnp.asarray([0, 2, 0]))
  s = metrics_lib.summary(m)
  assert s['episodes'] == 1
  assert s['mean_return'] == 3.0       # 2.0 + 1.0
  assert s['mean_length'] == 2
  assert s['success_rate'] == 1.0
  # Env 1's running counters were reset.
  np.testing.assert_allclose(np.asarray(m.cur_return), [2.0, 0.0, 3.0])
  np.testing.assert_array_equal(np.asarray(m.cur_length), [2, 0, 2])


def test_update_is_jittable():
  m = metrics_lib.init(batch_size=2)

  @jax.jit
  def step(m):
    return metrics_lib.update(m, jnp.asarray([0.5, 0.5]),
                              jnp.asarray([True, False]),
                              jnp.asarray([1, 0]))

  m = step(m)
  assert int(m.episodes) == 1
  assert metrics_lib.summary(m)['success_rate'] == 1.0
