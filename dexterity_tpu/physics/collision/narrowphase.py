"""Narrow-phase collision: candidate pairs -> contact points (static shapes).

The candidate pair list is fixed at compile time (Model.pair_*); every pair
is tested every step and inactive pairs are masked by distance, keeping all
shapes static for XLA.  Placeholder: primitive routines land with the contact
module.
"""

from __future__ import annotations

from dexterity_tpu.core.types import Data, Model


def collision(model: Model, data: Data) -> Data:
  if model.npair == 0:
    return data
  from dexterity_tpu.physics.collision import primitives
  return primitives.collide_all(model, data)
