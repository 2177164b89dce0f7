"""In-graph episode metric accumulation (SURVEY.md §5 metrics/logging).

The reference surfaces episode statistics through host-side counters
(`task.py:222-228` successes printed by `examples/oracle_reach.py:69-75`).
The TPU-native equivalent keeps a small metrics pytree in the training
loop carry — accumulated entirely on device (no host callbacks), readable
at any point with `summary()`.  Works under jit/vmap/scan and composes
with `envs.batched.BatchedEnvironment` auto-reset (accumulation happens on
the pre-reset terminal state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dexterity_tpu.utils.structs import pytree_dataclass


@pytree_dataclass
class EpisodeMetrics:
  """Running episode statistics for a batch of B environments."""
  episodes: jax.Array        # () i32 completed episodes
  env_steps: jax.Array       # () i32 total env steps taken
  return_sum: jax.Array      # () f   sum of completed-episode returns
  length_sum: jax.Array      # () i32 sum of completed-episode lengths
  success_sum: jax.Array     # () i32 completed episodes with >=1 success
  cur_return: jax.Array      # (B,) running return of the live episode
  cur_length: jax.Array      # (B,) i32 running length


def init(batch_size: int, dtype=jnp.float32) -> EpisodeMetrics:
  return EpisodeMetrics(
      episodes=jnp.zeros((), jnp.int32),
      env_steps=jnp.zeros((), jnp.int32),
      return_sum=jnp.zeros((), dtype),
      length_sum=jnp.zeros((), jnp.int32),
      success_sum=jnp.zeros((), jnp.int32),
      cur_return=jnp.zeros((batch_size,), dtype),
      cur_length=jnp.zeros((batch_size,), jnp.int32))


def update(metrics: EpisodeMetrics, reward: jax.Array, done: jax.Array,
           successes: jax.Array) -> EpisodeMetrics:
  """Accumulates one batched step.

  Args:
    reward: (B,) step rewards.
    done: (B,) bool, True where the episode ended this step.
    successes: (B,) i32 success counters of the (pre-reset) state.
  """
  cur_return = metrics.cur_return + reward
  cur_length = metrics.cur_length + 1
  donef = done.astype(cur_return.dtype)
  donei = done.astype(jnp.int32)
  return EpisodeMetrics(
      episodes=metrics.episodes + donei.sum(dtype=jnp.int32),
      env_steps=metrics.env_steps + reward.shape[0],
      return_sum=metrics.return_sum + (cur_return * donef).sum(),
      length_sum=metrics.length_sum + (cur_length * donei).sum(dtype=jnp.int32),
      success_sum=metrics.success_sum
      + (donei * (successes > 0).astype(jnp.int32)).sum(dtype=jnp.int32),
      cur_return=cur_return * (1.0 - donef),
      cur_length=cur_length * (1 - donei))


def summary(metrics: EpisodeMetrics) -> dict:
  """Host-side scalar summary (call outside jit, e.g. for logging)."""
  n = max(int(metrics.episodes), 1)
  return {
      'episodes': int(metrics.episodes),
      'env_steps': int(metrics.env_steps),
      'mean_return': float(metrics.return_sum) / n,
      'mean_length': float(metrics.length_sum) / n,
      'success_rate': float(metrics.success_sum) / n,
  }
