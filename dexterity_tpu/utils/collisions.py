"""Collision predicates (reference: dexterity/utils/mujoco_collisions.py:95-127).

Masks are computed per candidate PAIR (static); at runtime contact slots
carry their pair index (dynamic under the midphase), so a check is one
gather + reduction over data.contact.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dexterity_tpu.core.types import Model


def group_mask(model: Model, prefixes1, prefixes2) -> np.ndarray:
  """Static (npair,) mask of pairs between two geom-name prefix groups."""

  def in_group(gid, prefixes):
    name = model.geom_names[gid]
    return any(name.startswith(p) for p in prefixes)

  mask = np.zeros(model.npair, bool)
  for i in range(model.npair):
    g1, g2 = model.pair_geom1[i], model.pair_geom2[i]
    mask[i] = ((in_group(g1, prefixes1) and in_group(g2, prefixes2))
               or (in_group(g1, prefixes2) and in_group(g2, prefixes1)))
  return mask


def self_mask(model: Model, prefix: str) -> np.ndarray:
  """Static mask of pairs internal to one entity prefix."""
  return group_mask(model, [prefix], [prefix])


def has_collision(data, pair_mask: np.ndarray, margin: float = 0.0):
  """True if any contact among the masked pairs penetrates (dist < margin)."""
  if not pair_mask.any():
    return jnp.asarray(False)
  pair = data.contact.pair
  slot_in_group = jnp.asarray(pair_mask)[jnp.maximum(pair, 0)] & (pair >= 0)
  return jnp.any(slot_in_group & (data.contact.dist < margin))