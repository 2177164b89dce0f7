"""Smooth (unconstrained) dynamics: inertia, bias, passive, actuation.

Design note (TPU-first): instead of translating the sequential CRBA/RNEA
recursions, the joint-space inertia is assembled as one batched contraction
M = Jᵀ I J over stacked per-body COM Jacobians — a matmul the MXU executes
directly, and the form vmap vectorizes best over large env batches.  The bias
force uses the same world-origin Plücker algebra with a single
ancestor-mask contraction for the backward pass.

Semantics follow MuJoCo (so reference dm_control rollouts can be matched
within tolerance — see BASELINE.md): affine actuator gain/bias, per-dof
armature, implicit joint damping in the Euler integrator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu.core.types import (ActuatorTrn, BiasType, Data, JointType,
                                      Model)
from dexterity_tpu.physics import kinematics
from dexterity_tpu.physics import math as tmath


# ---------------------------------------------------------------------------
# Inertia
# ---------------------------------------------------------------------------


def com_jacobians(model: Model, data: Data) -> jax.Array:
  """(nbody, 6, nv) spatial Jacobians at each body COM: rows [ang, lin]."""
  mask = jnp.asarray(kinematics.ancestor_mask(model))      # (nbody, nv)
  ang = data.cdof[:, :3]                                    # (nv, 3)
  lin0 = data.cdof[:, 3:]                                   # (nv, 3)
  # lin at com c: lin0 + ang x c
  lin = lin0[None] + jnp.cross(
      jnp.broadcast_to(ang[None], (model.nbody, model.nv, 3)),
      data.xipos[:, None, :])                               # (nbody, nv, 3)
  ang_b = jnp.broadcast_to(ang[None], (model.nbody, model.nv, 3))
  jac = jnp.concatenate([ang_b, lin], axis=-1)              # (nbody, nv, 6)
  jac = jac * mask[:, :, None]
  return jnp.swapaxes(jac, 1, 2)                            # (nbody, 6, nv)


def crb(model: Model, data: Data) -> Data:
  """Joint-space inertia M = Σ_b J_bᵀ diag(I_b^world, m_b·1) J_b (+armature)."""
  jac = com_jacobians(model, data)                          # (nbody, 6, nv)
  iw = tmath.inertia_world(model.body_mass, model.body_inertia, data.ximat)
  jang = jac[:, :3, :]
  jlin = jac[:, 3:, :]
  m_ang = jnp.einsum('biv,bij,bjw->vw', jang, iw, jang)
  m_lin = jnp.einsum('b,biv,biw->vw', model.body_mass, jlin, jlin)
  qm = m_ang + m_lin
  qm_arm = qm + jnp.diag(model.dof_armature)
  qld = jax.scipy.linalg.cholesky(qm_arm, lower=True)
  return data.replace(qM=qm_arm, qLD=qld)


def solve_m(data: Data, vec: jax.Array) -> jax.Array:
  """Solves M x = vec using the cached Cholesky factor."""
  y = jax.scipy.linalg.solve_triangular(data.qLD, vec, lower=True)
  return jax.scipy.linalg.solve_triangular(data.qLD.T, y, lower=False)


# ---------------------------------------------------------------------------
# Bias forces (coriolis + centrifugal + gravity) — RNEA in Plücker coords
# ---------------------------------------------------------------------------


def _motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
  """Spatial cross product of motion vectors: v ×ₘ m."""
  vang, vlin = v[..., :3], v[..., 3:]
  mang, mlin = m[..., :3], m[..., 3:]
  ang = jnp.cross(vang, mang)
  lin = jnp.cross(vang, mlin) + jnp.cross(vlin, mang)
  return jnp.concatenate([ang, lin], axis=-1)


def _inertia_mul(mass, com, iw, motion):
  """Spatial inertia (about world origin) applied to a motion vector.

  Args:
    mass: () body mass.
    com: (3,) world COM.
    iw: (3, 3) world rotational inertia about COM.
    motion: (6,) [ang, lin0].

  Returns:
    (6,) force vector [torque-about-origin, force].
  """
  ang, lin0 = motion[:3], motion[3:]
  h = mass * (lin0 + jnp.cross(ang, com))        # linear momentum
  l0 = iw @ ang + jnp.cross(com, h)              # angular momentum @ origin
  return jnp.concatenate([l0, h])


def rne(model: Model, data: Data) -> Data:
  """qfrc_bias = C(q, v)·v + G(q), via Newton–Euler with qacc = 0."""
  dtype = data.qpos.dtype
  iw = tmath.inertia_world(model.body_mass, model.body_inertia, data.ximat)

  # Forward pass: per-body velocity (already in cvel) and bias acceleration.
  cacc = [jnp.concatenate([jnp.zeros(3, dtype), -model.opt.gravity])]
  cvel_list = [jnp.zeros(6, dtype)]
  for b in range(1, model.nbody):
    parent = model.body_parentid[b]
    vel = cvel_list[parent]
    acc = cacc[parent]
    jadr, jnum = model.body_jntadr[b], model.body_jntnum[b]
    for k in range(jnum):
      ji = jadr + k
      dadr = model.jnt_dofadr[ji]
      jtype = JointType(model.jnt_type[ji])
      if jtype in (JointType.HINGE, JointType.SLIDE):
        cdof_d = data.cdof[dadr]
        qd = data.qvel[dadr]
        # Screw axis is fixed in the parent chain: its time-derivative is
        # the accumulated velocity × axis.
        acc = acc + _motion_cross(vel, cdof_d) * qd
        vel = vel + cdof_d * qd
      else:
        # BALL / FREE: the rotational screw axes are fixed in the *child*
        # body, so their derivative uses the full child spatial velocity
        # (the antisymmetric self-terms cancel in the qvel-weighted sum).
        width = _dof_width(model, ji)
        contrib = sum(data.cdof[d] * data.qvel[d]
                      for d in range(dadr, dadr + width))
        vel_full = vel + contrib
        rot_start = dadr + 3 if jtype == JointType.FREE else dadr
        for d in range(rot_start, dadr + width):
          acc = acc + _motion_cross(vel_full, data.cdof[d]) * data.qvel[d]
        vel = vel_full
    cvel_list.append(vel)
    cacc.append(acc)

  cvel = jnp.stack(cvel_list)                    # (nbody, 6)
  cacc = jnp.stack(cacc)                         # (nbody, 6)

  # Per-body bias force: f = I a + v ×* (I v).
  def body_force(b):
    iv = _inertia_mul(model.body_mass[b], data.xipos[b], iw[b], cvel[b])
    ia = _inertia_mul(model.body_mass[b], data.xipos[b], iw[b], cacc[b])
    return ia + _force_cross(cvel[b], iv)

  forces = jnp.stack([body_force(b) for b in range(model.nbody)])

  # Backward pass as a mask contraction: qfrc_bias_i = Σ_{b ∈ subtree(i)}
  # cdof_i · f_b  ==  Σ_b ancestor_mask[b, i] (cdof_i · f_b).
  mask = jnp.asarray(kinematics.ancestor_mask(model), dtype=dtype)
  qfrc_bias = jnp.einsum('vk,bk,bv->v', data.cdof, forces, mask)
  return data.replace(qfrc_bias=qfrc_bias, cvel=cvel)


def _force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
  """Motion ×* force: dual cross product."""
  vang, vlin = v[:3], v[3:]
  tau0, force = f[:3], f[3:]
  return jnp.concatenate([
      jnp.cross(vang, tau0) + jnp.cross(vlin, force),
      jnp.cross(vang, force),
  ])


def _dof_width(model: Model, ji: int) -> int:
  from dexterity_tpu.core.types import DOF_WIDTH
  return DOF_WIDTH[JointType(model.jnt_type[ji])]


# ---------------------------------------------------------------------------
# Applied / passive / actuator forces
# ---------------------------------------------------------------------------


def xfrc_accumulate(model: Model, data: Data) -> jax.Array:
  """Projects xfrc_applied (world force/torque at body COM) into qfrc."""
  force = data.xfrc_applied[:, :3]
  torque = data.xfrc_applied[:, 3:]
  tau0 = torque + jnp.cross(data.xipos, force)   # torque about origin
  fvec = jnp.concatenate([tau0, force], axis=-1)  # (nbody, 6)
  mask = jnp.asarray(kinematics.ancestor_mask(model), dtype=force.dtype)
  return jnp.einsum('vk,bk,bv->v', data.cdof, fvec, mask)


def passive(model: Model, data: Data) -> Data:
  """Viscous joint damping (frictionloss is handled by the constraint
  solver; joint/tendon springs unused by the dexterity models)."""
  qfrc = -model.dof_damping * data.qvel
  return data.replace(qfrc_passive=qfrc)


def actuation(model: Model, data: Data) -> Data:
  """Actuator forces: force = gain·ctrl + bias(length, velocity).

  Supports MuJoCo <position> (kp/kv via affine bias) and <general> affine
  actuators on joints and fixed tendons — the full set used by the three
  vendored hands (shadow_hand_position_actuators.xml, adroit_hand.xml:398-423,
  mpl_*.xml actuators).
  """
  dtype = data.qpos.dtype
  nu = model.nu
  if nu == 0:
    return data.replace(qfrc_actuator=jnp.zeros(model.nv, dtype))

  dof_qposadr = kinematics._dof_qposadr(model)

  lengths = []
  velocities = []
  moments = []  # (nu, nv)
  for u in range(nu):
    trnid = model.actuator_trnid[u]
    gear = model.actuator_gear[u]
    if model.actuator_trntype[u] == int(ActuatorTrn.JOINT):
      qadr = model.jnt_qposadr[trnid]
      dadr = model.jnt_dofadr[trnid]
      lengths.append(data.qpos[qadr] * gear)
      velocities.append(data.qvel[dadr] * gear)
      moments.append(jnp.zeros(model.nv, dtype).at[dadr].set(gear))
    else:  # TENDON
      lengths.append(data.ten_length[trnid] * gear)
      velocities.append(data.ten_velocity[trnid] * gear)
      moments.append(model.tendon_moment[trnid] * gear)

  length = jnp.stack(lengths)
  velocity = jnp.stack(velocities)
  moment = jnp.stack(moments)                    # (nu, nv)

  ctrl = jnp.clip(data.ctrl, model.actuator_ctrlrange[:, 0],
                  model.actuator_ctrlrange[:, 1])

  gain = model.actuator_gainprm[:, 0]
  force = gain * ctrl
  biastype = np.asarray(model.actuator_biastype)
  affine = jnp.asarray((biastype == int(BiasType.AFFINE)).astype(np.float64),
                       dtype=dtype)
  bias = (model.actuator_biasprm[:, 0]
          + model.actuator_biasprm[:, 1] * length
          + model.actuator_biasprm[:, 2] * velocity)
  force = force + affine * bias
  force = jnp.clip(force, model.actuator_forcerange[:, 0],
                   model.actuator_forcerange[:, 1])

  qfrc_actuator = moment.T @ force
  return data.replace(
      actuator_length=length, actuator_velocity=velocity,
      actuator_force=force, qfrc_actuator=qfrc_actuator)


# ---------------------------------------------------------------------------
# Integration
# ---------------------------------------------------------------------------


def integrate_pos(model: Model, qpos: jax.Array, qvel: jax.Array,
                  dt) -> jax.Array:
  """mj_integratePos: qpos ← qpos ⊕ qvel·dt (quaternion-aware)."""
  out = qpos
  for ji in range(model.njnt):
    jtype = JointType(model.jnt_type[ji])
    qadr, dadr = model.jnt_qposadr[ji], model.jnt_dofadr[ji]
    if jtype == JointType.FREE:
      out = out.at[qadr:qadr + 3].set(
          qpos[qadr:qadr + 3] + dt * qvel[dadr:dadr + 3])
      quat = tmath.quat_integrate(
          qpos[qadr + 3:qadr + 7], qvel[dadr + 3:dadr + 6], dt)
      out = out.at[qadr + 3:qadr + 7].set(quat)
    elif jtype == JointType.BALL:
      quat = tmath.quat_integrate(qpos[qadr:qadr + 4],
                                  qvel[dadr:dadr + 3], dt)
      out = out.at[qadr:qadr + 4].set(quat)
    else:
      out = out.at[qadr].set(qpos[qadr] + dt * qvel[dadr])
  return out


def euler(model: Model, data: Data) -> Data:
  """Semi-implicit Euler with implicit joint damping (MuJoCo 'Euler').

  Solves (M + h·diag(damping)) qacc = qfrc_total(v) so stiff per-joint
  damping (shadow/adroit wrists) is unconditionally stable, then
  v⁺ = v + h·qacc, q⁺ = q ⊕ h·v⁺.
  """
  h = model.opt.timestep
  qfrc = (data.qfrc_passive + data.qfrc_actuator + data.qfrc_applied
          + xfrc_accumulate(model, data) - data.qfrc_bias
          + data.qfrc_constraint)
  mhb = data.qM + h * jnp.diag(model.dof_damping)
  qacc = jax.scipy.linalg.solve(mhb, qfrc, assume_a='pos')
  qvel = data.qvel + h * qacc
  qpos = integrate_pos(model, data.qpos, qvel, h)
  return data.replace(qpos=qpos, qvel=qvel, qacc=qacc, time=data.time + h)
