"""Batched environment utilities: vmapped reset/step with auto-reset.

The TPU-native analogue of running thousands of reference environments:
one `BatchedEnvironment` holds B independent episodes as a single sharded
pytree; `step` auto-resets episodes that terminated (the standard RL
training loop contract).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dexterity_tpu import environment as env_lib


class BatchedEnvironment:
  """Auto-resetting batch of GoalEnvironments (one compiled program)."""

  def __init__(self, env: env_lib.GoalEnvironment, batch_size: int):
    self.env = env
    self.batch_size = batch_size
    self._reset = jax.vmap(env.reset)
    # step_batch == vmap(step) semantically (pinned by tests), but skips
    # the goal resample under a scalar cond when no env switches goal.
    self._step = env.step_batch

  def reset(self, key: jax.Array):
    keys = jax.random.split(key, self.batch_size)
    return self._reset(keys)

  def _merge_resets(self, new_state, done):
    """Resets done episodes in place.  The reset (goal rejection
    sampling, settle substeps) costs several env steps' worth of physics,
    so it runs under a SCALAR lax.cond on "any episode ended" — on the
    overwhelming majority of steps (no episode boundary anywhere in the
    batch) the whole reset computation is skipped at runtime, not just
    masked."""
    def with_reset(ns):
      reset_state, _ = self._reset(ns.key)

      def select(a, b):
        shape = (-1,) + (1,) * (a.ndim - 1)
        return jnp.where(done.reshape(shape), a, b)

      return jax.tree_util.tree_map(select, reset_state, ns)

    return jax.lax.cond(jnp.any(done), with_reset, lambda ns: ns,
                        new_state)

  def step(self, state, actions):
    """Steps all envs; episodes that ended are reset in place.

    Returns (state, timestep) where ended episodes report their terminal
    timestep and the state already holds the next episode's start.
    """
    new_state, ts = self._step(state, actions)
    done = ts.step_type == env_lib.StepType.LAST
    return self._merge_resets(new_state, done), ts

  def step_with_metrics(self, state, actions, metrics):
    """Like step(), additionally accumulating in-graph episode metrics
    (utils.metrics.EpisodeMetrics) on the pre-reset terminal state."""
    from dexterity_tpu.utils import metrics as metrics_lib
    new_state, ts = self._step(state, actions)
    done = ts.step_type == env_lib.StepType.LAST
    metrics = metrics_lib.update(
        metrics, ts.reward, done, new_state.task.successes)
    return self._merge_resets(new_state, done), ts, metrics
