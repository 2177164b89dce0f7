"""Sampling-based contact-pair pruning (import-time).

The TPU-native generalization of the reference's contype/conaffinity
pruning pass (dexterity/utils/mujoco_collisions.py:17-61): instead of a
single trial compile, the kinematic reachable set is sampled and candidate
pairs are classified by their distance statistics:

  * never-close pairs (min distance over samples > `near`)  -> pruned;
  * always-overlapping pairs (penetrating in the reference pose and in
    nearly all samples, or several mm deep in the median sampled pose) ->
    pruned as primitive-fitting artifacts of adjacent pieces (their
    meshes don't actually touch);
  * everything else stays as a candidate pair.

Runs entirely on the framework's own batched FK + narrow phase (no MuJoCo
dependency) and is deterministic given the seed.
"""

from __future__ import annotations

from typing import Optional, Set, Tuple

import numpy as np

from dexterity_tpu.core import spec as S
from dexterity_tpu.core import types as T


def pair_distance_stats(model: T.Model, num_samples: int = 256,
                        seed: int = 0):
  """Returns (pair_min_dist, pair_dist0, pair_frac_overlap) arrays."""
  import jax
  import jax.numpy as jnp
  from dexterity_tpu.physics import kinematics
  from dexterity_tpu.physics.collision import narrowphase, primitives

  # Exhaustive narrow phase (midphase disabled) for complete statistics.
  model = model.replace(opt=model.opt.replace(midphase_cap=0))

  rng = np.random.RandomState(seed)
  lo = np.asarray(model.jnt_range)[:, 0].copy()
  hi = np.asarray(model.jnt_range)[:, 1].copy()
  limited = np.asarray(model.jnt_limited)
  lo = np.where(limited, lo, -0.5)
  hi = np.where(limited, hi, 0.5)

  qpos_batch = np.tile(np.asarray(model.qpos0), (num_samples, 1))
  for ji in range(model.njnt):
    if model.jnt_type[ji] in (int(T.JointType.HINGE), int(T.JointType.SLIDE)):
      qadr = model.jnt_qposadr[ji]
      qpos_batch[:, qadr] = rng.uniform(lo[ji], hi[ji], num_samples)
  qpos_batch[0] = np.asarray(model.qpos0)

  def dists(qpos):
    data = T.make_data(model)
    data = data.replace(qpos=qpos)
    data = kinematics.fwd_position(model, data)
    data = narrowphase.collision(model, data)
    return data.contact.dist

  cpu = jax.devices('cpu')[0]
  with jax.default_device(cpu):
    d = jax.jit(jax.vmap(dists))(jnp.asarray(qpos_batch))
  d = np.asarray(d)                                # (samples, npoint)

  groups, _ = primitives._pair_groups(model)
  pair_of_row = np.concatenate(
      [np.repeat(np.asarray(grp['pair'], np.int32), grp['k'])
       for grp in groups.values()])
  npair = model.npair
  pair_min = np.full(npair, np.inf)
  pair_d0 = np.full(npair, np.inf)
  pair_frac = np.zeros(npair)
  pair_med = np.full(npair, np.inf)
  point_min = d.min(axis=0)
  point_d0 = d[0]
  per_sample_point = d
  for p in range(npair):
    rows = np.where(pair_of_row == p)[0]
    pair_min[p] = point_min[rows].min()
    pair_d0[p] = point_d0[rows].min()
    per_sample = per_sample_point[:, rows].min(axis=1)
    pair_frac[p] = (per_sample < 0).mean()
    pair_med[p] = np.median(per_sample)
  return pair_min, pair_d0, pair_frac, pair_med


def prune_spec_pairs(spec: S.ModelSpec, num_samples: int = 256,
                     near: float = 0.004, overlap_frac: float = 0.98,
                     seed: int = 0, verbose: bool = False) -> S.ModelSpec:
  """Computes the dropped-pair set and stores it on the spec."""
  model = spec.compile()
  pair_min, pair_d0, pair_frac, pair_med = pair_distance_stats(
      model, num_samples=num_samples, seed=seed)

  explicit = {tuple(sorted((p.geom1, p.geom2))) for p in spec.pairs}
  dropped: Set[Tuple[str, str]] = set()
  n_far = n_artifact = 0
  for p in range(model.npair):
    g1 = model.geom_names[model.pair_geom1[p]]
    g2 = model.geom_names[model.pair_geom2[p]]
    key = tuple(sorted((g1, g2)))
    if key in explicit:
      continue
    if pair_min[p] > near:
      n_far += 1
      dropped.add(key)
    elif ((pair_d0[p] < 0 and pair_frac[p] >= overlap_frac)
          or (pair_med[p] < -0.003 and pair_frac[p] >= 0.9)):
      # Second clause: pairs whose *typical* pose penetrates several mm
      # are primitive-bloat artifacts of adjacent pieces (the source
      # meshes never touch there), not genuine self-collision pairs.
      n_artifact += 1
      dropped.add(key)
  spec.pruned_pairs |= dropped
  if verbose:
    print(f'prune: {model.npair} pairs -> kept '
          f'{model.npair - len(dropped)} (far {n_far}, artifact {n_artifact})')
  return spec
