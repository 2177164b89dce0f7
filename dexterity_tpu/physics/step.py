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


def step_hot(model: Model, data: Data) -> Data:
  """One physics substep via the plane-form (SoA) pipeline.

  Same semantics as `step` (equality modulo float reassociation is pinned
  by tests/test_hot_step.py) but no AoS derived tensors are materialized:
  body poses, geom frames, inertias and the tree contractions all run on
  component planes (see physics/math.py plane note), which is ~2x faster
  per substep at planner batch sizes on TPU.  Derived Data fields other
  than the integrator carry are left stale — callers that need frames or
  contacts after the step must refresh (step_n does).
  """
  from dexterity_tpu.physics import constraint as constraint_mod
  from dexterity_tpu.physics.collision import primitives
  dtype = data.qpos.dtype

  xpos_p, xquat_p, cdof6 = kinematics.body_poses_planes(
      model, data.qpos, data.mocap_pos, data.mocap_quat)
  gpos, gmat = kinematics.frame_planes(
      xpos_p, xquat_p, model.geom_bodyid, model.geom_pos, model.geom_quat,
      dtype)
  # Group form, never concatenated into a Contact: the constraint stage's
  # top-K selection consumes the groups directly (one-hot contractions at
  # static offsets), saving the 13-plane payload copy per substep.
  contact_groups = primitives.collide_group_planes(
      model, gpos, gmat, data.qpos[0] * 0, dtype)
  body10, xipos3 = smooth.inertia_origin_planes(model, xpos_p, xquat_p)
  qm = smooth.crb_planes(model, body10, cdof6)
  qfrc_bias, _ = smooth.rne_planes(model, body10, cdof6, data.qvel)

  if model.ntendon:
    dof_qposadr = kinematics._dof_qposadr(model)
    ten_length = model.tendon_moment @ data.qpos[dof_qposadr]
    ten_velocity = model.tendon_moment @ data.qvel
  else:
    ten_length = jnp.zeros((0,), dtype)
    ten_velocity = jnp.zeros((0,), dtype)

  updates = dict(qM=qm, cdof=cdof6.T,
                 ten_length=ten_length, ten_velocity=ten_velocity,
                 qfrc_bias=qfrc_bias)
  if model.neq:
    # CONNECT/WELD row assembly reads AoS body poses (tiny arrays).
    updates.update(xpos=xpos_p.T, xquat=xquat_p.T)
  data = data.replace(**updates)

  data = smooth.actuation(model, data)
  data = smooth.passive(model, data)
  qfrc_smooth = (data.qfrc_passive + data.qfrc_actuator + data.qfrc_applied
                 + smooth.xfrc_planes(model, xipos3, cdof6,
                                      data.xfrc_applied)
                 - data.qfrc_bias)
  data = constraint_mod.solve(model, data, qfrc_smooth,
                              contact_groups=contact_groups)
  return smooth.euler_from_smooth(model, data, qfrc_smooth)


# True integrator state plus the per-dof/per-actuator dynamics outputs a
# caller may read after the control step (e.g. the joint_torques observable
# reads qfrc_* and qacc).  Everything else in Data is derived geometry that
# is recomputed from qpos anyway.
_STEP_CARRY = ('time', 'qpos', 'qvel', 'qacc', 'qacc_smooth', 'qfrc_bias',
               'qfrc_passive', 'qfrc_actuator', 'qfrc_constraint',
               'qfrc_constraint_axis', 'actuator_length',
               'actuator_velocity', 'actuator_force')


def step_n(model: Model, data: Data, n: int,
           refresh: str = 'full') -> Data:
  """n physics substeps under lax.scan (control_dt / physics_dt).

  Only the minimal state rides the scan carry — the large derived products
  (frames, contacts, mass matrix) stay out of the loop, which keeps the
  carry small and lets XLA fuse freely.  After the scan, derived
  quantities are refreshed once (MuJoCo mj_step1-style), so observables /
  rewards / failure predicates read quantities consistent with the
  post-step qpos instead of values one substep stale.  (qM/qLD are NOT
  refreshed; re-run smooth.crb if needed.)

  refresh:
    'full' — position + collision + velocity kinematics (env contract).
    'position' — frames/sites only; the cheap mode for planner rollouts
      whose rewards are position-level (contacts and cvel stay stale).
  """
  def body(carry, _):
    d = step_hot(model, data.replace(**carry))
    return {f: getattr(d, f) for f in _STEP_CARRY}, ()

  carry0 = {f: getattr(data, f) for f in _STEP_CARRY}
  carry, _ = jax.lax.scan(body, carry0, (), length=n)
  data = data.replace(**carry)
  data = kinematics.fwd_position(model, data)
  if refresh == 'position':
    return data
  from dexterity_tpu.physics.collision import narrowphase
  data = narrowphase.collision(model, data)
  data = kinematics.fwd_velocity_kinematics(model, data)
  return data
