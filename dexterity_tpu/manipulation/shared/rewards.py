"""Reward shaping utilities (reference: manipulation/shared/rewards.py)."""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Reward:
  value: jnp.ndarray
  weight: float


def weighted_average(rewards: Mapping[str, Reward]):
  """Weighted sum of shaped reward components (rewards.py:8-15)."""
  total = 0.0
  for reward in rewards.values():
    total = total + reward.value * reward.weight
  return total


def tanh_squared(x, margin: float, loss_at_margin: float = 0.95):
  """tanh^2 shaping loss (rewards.py:18-28); jnp, batched-safe."""
  if not margin > 0:
    raise ValueError('`margin` must be positive.')
  if not 0.0 < loss_at_margin < 1.0:
    raise ValueError('`loss_at_margin` must be between 0 and 1.')
  error = jnp.linalg.norm(jnp.atleast_1d(x), axis=-1)
  w = np.arctanh(np.sqrt(loss_at_margin)) / margin
  s = jnp.tanh(w * error)
  return s * s


def tolerance(x, lower: float, upper: float):
  """1.0 inside [lower, upper], else 0.0 (dm_control rewards.tolerance
  with margin=0, as used by reorient.py:265-269)."""
  return jnp.where((x >= lower) & (x <= upper), 1.0, 0.0)
