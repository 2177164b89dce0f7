"""Population-sharded predictive sampling over a device mesh.

The per-solve candidate population splits across the mesh's batch axis via
shard_map; every device rolls out its shard of candidates through the full
contact physics, reduces to a local best, and a cross-device all_gather +
argmax picks the global winner (the collective rides ICI within a slice and
DCN across hosts — BASELINE.json north-star reduction pattern).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from dexterity_tpu.parallel.sharding import BATCH_AXIS
from dexterity_tpu.planners.predictive_sampling import (PlannerState,
                                                        PredictiveSampling)

try:
  shard_map = jax.shard_map  # jax >= 0.5
except AttributeError:  # pragma: no cover
  from jax.experimental.shard_map import shard_map


def sharded_solve(planner: PredictiveSampling, mesh, data, goal,
                  pstate: PlannerState, key: jax.Array):
  """One population-sharded MPC solve. All inputs replicated; the candidate
  axis lives only inside the shard_map body."""
  cfg = planner.config
  n_dev = mesh.shape[BATCH_AXIS]
  per_shard = max(1, cfg.num_samples // n_dev)
  rng = planner._hi - planner._lo

  def body(data, goal, nominal, key):
    idx = jax.lax.axis_index(BATCH_AXIS)
    key = jax.random.fold_in(key, idx)
    # Promote replicated inputs to shard-varying so scan carries typecheck
    # (values mix with per-shard candidates inside the rollouts).
    def _vary(x):
      if hasattr(jax.lax, 'pcast'):
        return jax.lax.pcast(x, BATCH_AXIS, to='varying')
      return jax.lax.pvary(x, BATCH_AXIS)
    data = jax.tree_util.tree_map(_vary, data)
    goal = _vary(goal)
    nominal = _vary(nominal)
    noise = (jax.random.normal(
        key, (per_shard, cfg.horizon, planner.nu), planner.dtype)
        * cfg.noise_scale * rng)
    # Every shard also evaluates the unperturbed nominal (free insurance
    # against regressions; duplicates cost nothing).
    cands = jnp.concatenate([nominal[None], nominal[None] + noise])
    cands = jnp.clip(cands, planner._lo, planner._hi)
    returns = jax.vmap(
        lambda a: planner.rollout_return(data, goal, a))(cands)
    li = jnp.argmax(returns)
    local_best_r = returns[li]
    local_best_seq = cands[li]
    # Cross-shard reduction.
    all_r = jax.lax.all_gather(local_best_r, BATCH_AXIS)     # (n_dev,)
    all_seq = jax.lax.all_gather(local_best_seq, BATCH_AXIS)
    gi = jnp.argmax(all_r)
    best_seq = all_seq[gi]
    action = best_seq[0]
    nominal_next = jnp.concatenate([best_seq[1:], best_seq[-1:]])
    # Outputs are identical on every shard; emit with a leading shard axis
    # (out_specs P('batch')) and slice one copy outside.
    return (action[None], nominal_next[None], all_r[gi][None])

  fn = shard_map(body, mesh=mesh,
                 in_specs=(P(), P(), P(), P()),
                 out_specs=(P(BATCH_AXIS), P(BATCH_AXIS), P(BATCH_AXIS)))
  action, nominal, best_r = fn(data, goal, pstate.nominal, key)
  return action[0], PlannerState(nominal=nominal[0], best_return=best_r[0])
