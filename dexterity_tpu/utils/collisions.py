"""Collision predicates on the static contact-slot tables
(reference: dexterity/utils/mujoco_collisions.py:95-127).

Masks over candidate contact points are computed once per model; runtime
checks are vectorized reductions over data.contact.dist.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dexterity_tpu.core.types import Model


def _point_geoms(model: Model):
  from dexterity_tpu.physics.collision import primitives
  pair_of_row = primitives.contact_row_table(model)
  g1 = np.asarray([model.pair_geom1[p] for p in pair_of_row], np.int32)
  g2 = np.asarray([model.pair_geom2[p] for p in pair_of_row], np.int32)
  return g1, g2


def group_mask(model: Model, prefixes1, prefixes2) -> np.ndarray:
  """Static mask of contact points between two geom-name prefix groups."""
  g1, g2 = _point_geoms(model)

  def in_group(gid, prefixes):
    name = model.geom_names[gid]
    return any(name.startswith(p) for p in prefixes)

  mask = np.zeros(len(g1), bool)
  for i in range(len(g1)):
    a1 = in_group(g1[i], prefixes1)
    a2 = in_group(g2[i], prefixes2)
    b1 = in_group(g1[i], prefixes2)
    b2 = in_group(g2[i], prefixes1)
    mask[i] = (a1 and a2) or (b1 and b2)
  return mask


def self_mask(model: Model, prefix: str) -> np.ndarray:
  """Static mask of contact points internal to one entity prefix."""
  return group_mask(model, [prefix], [prefix])


def has_collision(data, mask: np.ndarray, margin: float = 0.0):
  """True if any masked contact point penetrates (dist < margin)."""
  if not mask.any():
    return jnp.asarray(False)
  return jnp.any(data.contact.dist[np.where(mask)[0]] < margin)
