"""Forward dynamics pipeline and step function.

`forward(model, data)` recomputes every derived quantity from (qpos, qvel,
ctrl, mocap); `step(model, data)` = forward + Euler integration.  Both are
pure and jit/vmap/shard_map-friendly — the TPU-native replacement for the
reference's `physics.step()` / `physics.forward()` C boundary
(SURVEY.md §2.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dexterity_tpu.core.types import Data, Model
from dexterity_tpu.physics import constraint as constraint_mod
from dexterity_tpu.physics import kinematics, smooth


def fwd_position(model: Model, data: Data) -> Data:
  data = kinematics.fwd_position(model, data)
  data = smooth.crb(model, data)
  from dexterity_tpu.physics.collision import narrowphase
  data = narrowphase.collision(model, data)
  return data


def fwd_velocity(model: Model, data: Data) -> Data:
  data = kinematics.fwd_velocity_kinematics(model, data)
  data = smooth.actuation(model, data)
  data = smooth.passive(model, data)
  data = smooth.rne(model, data)
  return data


def fwd_acceleration(model: Model, data: Data) -> Data:
  qfrc_smooth = (data.qfrc_passive + data.qfrc_actuator + data.qfrc_applied
                 + smooth.xfrc_accumulate(model, data) - data.qfrc_bias)
  # qacc_smooth (an M-solve) is not needed on the hot path: the constraint
  # solver's objective uses qfrc_smooth directly.
  data = constraint_mod.solve(model, data, qfrc_smooth)
  return data


def forward(model: Model, data: Data) -> Data:
  data = fwd_position(model, data)
  data = fwd_velocity(model, data)
  data = fwd_acceleration(model, data)
  return data


def step(model: Model, data: Data) -> Data:
  data = forward(model, data)
  data = smooth.euler(model, data)
  return data


def step_n(model: Model, data: Data, n: int) -> Data:
  """n physics substeps under lax.scan (control_dt / physics_dt)."""
  def body(d, _):
    return step(model, d), ()
  data, _ = jax.lax.scan(body, data, (), length=n)
  return data
