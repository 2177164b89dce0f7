"""Soft-constraint assembly and solver (MuJoCo constraint model).

Constraint rows (equality, friction loss, joint/tendon limits, contacts in a
pyramidal cone) are assembled with static shapes; inactive rows get zero
impedance.  The solver minimizes the convex primal objective over qacc with a
fixed-iteration projected Newton — jit/vmap friendly.

Placeholder until the constraint milestone: zero constraint force.
"""

from __future__ import annotations

import jax.numpy as jnp

from dexterity_tpu.core.types import Data, Model


def solve(model: Model, data: Data, qfrc_smooth) -> Data:
  del qfrc_smooth
  return data.replace(
      qfrc_constraint=jnp.zeros_like(data.qacc_smooth),
      qacc=data.qacc_smooth)
