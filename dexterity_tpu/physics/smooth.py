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
  # Note: no eager factorization — the constraint solver factorizes its own
  # regularized Hessian and the smooth-only path solves lazily.
  return data.replace(qM=qm_arm)


def solve_m(data: Data, vec: jax.Array) -> jax.Array:
  """Solves M x = vec."""
  from dexterity_tpu.physics import linalg_pallas
  return linalg_pallas.cholesky_solve(data.qM, vec)


# ---------------------------------------------------------------------------
# Plane-form (SoA) inertia & dynamics — the hot-substep implementations.
#
# The AoS paths above materialize (B, nbody, 6, nv)-class tensors whose
# 3/6-wide minor dims waste ~97% of each TPU vector register (measured
# round-2 trace).  The plane forms below keep every scalar component a
# full-width (n,) array and express the tree reductions as matmuls with
# static masks, so the only materialized batched tensors are (B, k, n)
# with n = nbody/nv/ngeom on the minor axis.  See physics/math.py.
# ---------------------------------------------------------------------------


def _subtree_mask_np(model: Model) -> np.ndarray:
  """(nbody, nbody) S[b, d] = 1 if body d is in the subtree rooted at b."""
  s = np.zeros((model.nbody, model.nbody))
  for d in range(model.nbody):
    i = d
    while True:
      s[i, d] = 1.0
      if i == 0:
        break
      i = model.body_parentid[i]
  return s


def _dof_upper_mask_np(model: Model) -> np.ndarray:
  """(nv, nv) U[v, w] = 1 iff dof v is an ancestor dof of body(w) and
  v <= w: the upper-triangular CRB sparsity pattern.  Relies on the
  topological dof ordering (ancestor dofs have smaller indices), which the
  compiler guarantees (asserted here)."""
  anc = kinematics.ancestor_mask(model)                 # (nbody, nv)
  db = np.asarray(model.dof_bodyid, np.int32)
  full = anc[db]                                        # full[w, v]
  up = np.zeros((model.nv, model.nv))
  for w in range(model.nv):
    for v in range(model.nv):
      if full[w, v] and v <= w:
        up[v, w] = 1.0
  # A deeper body's dofs must not precede an ancestor's (same-body pairs
  # are ancestor relations in both directions and are fine either way —
  # the subtree composite is identical).
  for v in range(model.nv):
    for w in range(v + 1, model.nv):
      assert not (full[v, w] and not full[w, v]), (
          'dof ordering is not topological; CRB mask would drop terms')
  return up


def inertia_origin_planes(model: Model, xpos_p, xquat_p):
  """Spatial-inertia params about the world origin per body.

  Returns (body10 (10, nbody), xipos3 (3, nbody)): body10 rows are
  [m, h(3), I_o(6 upper-tri xx,xy,xz,yy,yz,zz)], h = m·com,
  I_o = I_com + m((c·c)δ − ccᵀ).  Linear in body composition, so subtree
  sums of these rows give the CRB composite inertias."""
  dtype = xpos_p.dtype
  bdims = (1,) * (xpos_p.ndim - 2)      # trailing batch dims (batch-minor)
  pos, mat = kinematics.frame_planes(
      xpos_p, xquat_p, np.arange(model.nbody), model.body_ipos,
      model.body_iquat, dtype)
  i1 = model.body_inertia[:, 0].astype(dtype).reshape((-1,) + bdims)
  i2 = model.body_inertia[:, 1].astype(dtype).reshape((-1,) + bdims)
  i3 = model.body_inertia[:, 2].astype(dtype).reshape((-1,) + bdims)
  m = model.body_mass.astype(dtype).reshape((-1,) + bdims)

  def iw(a, b):
    # I_com[a, b] = Σ_k I_k R[a, k] R[b, k]
    return (i1 * mat[3 * a + 0] * mat[3 * b + 0]
            + i2 * mat[3 * a + 1] * mat[3 * b + 1]
            + i3 * mat[3 * a + 2] * mat[3 * b + 2])

  cx, cy, cz = pos
  cc = cx * cx + cy * cy + cz * cz
  ixx = iw(0, 0) + m * (cc - cx * cx)
  ixy = iw(0, 1) - m * cx * cy
  ixz = iw(0, 2) - m * cx * cz
  iyy = iw(1, 1) + m * (cc - cy * cy)
  iyz = iw(1, 2) - m * cy * cz
  izz = iw(2, 2) + m * (cc - cz * cz)
  # `m` is a (nbody, 1…) constant plane; broadcast it to the batched plane
  # shape so the stack is uniform in batch-minor mode.
  body10 = jnp.stack([jnp.broadcast_to(m, cx.shape), m * cx, m * cy, m * cz,
                      ixx, ixy, ixz, iyy, iyz, izz])
  return body10, jnp.stack(pos)


def _spatial_inertia_apply(p10, m6):
  """Applies origin-frame spatial inertias to motion planes.

  Args:
    p10: (10, n) params [m, h, I_o].
    m6: (6, n) motion planes [ang, lin(origin)].

  Returns:
    (6, n) force planes [torque-about-origin, force].
  """
  m, hx, hy, hz = p10[0], p10[1], p10[2], p10[3]
  ixx, ixy, ixz, iyy, iyz, izz = (p10[4], p10[5], p10[6], p10[7], p10[8],
                                  p10[9])
  wx, wy, wz = m6[0], m6[1], m6[2]
  vx, vy, vz = m6[3], m6[4], m6[5]
  tx = ixx * wx + ixy * wy + ixz * wz + (hy * vz - hz * vy)
  ty = ixy * wx + iyy * wy + iyz * wz + (hz * vx - hx * vz)
  tz = ixz * wx + iyz * wy + izz * wz + (hx * vy - hy * vx)
  fx = m * vx + (wy * hz - wz * hy)
  fy = m * vy + (wz * hx - wx * hz)
  fz = m * vz + (wx * hy - wy * hx)
  return jnp.stack([tx, ty, tz, fx, fy, fz])


def crb_planes(model: Model, body10: jax.Array, cdof6: jax.Array):
  """Joint-space inertia via the classic CRB algorithm as three matmuls:
  subtree-composite inertias (static subtree mask), per-dof spatial force
  f_w = I^C_{body(w)} cdof_w (elementwise planes), and
  M[v, w] = cdof_v · f_w on the static ancestor-dof sparsity pattern.
  Identical result to the AoS J^T I J contraction (tests/test_hot_step.py)
  with no (nbody, 6, nv) tensor ever materialized."""
  dtype = body10.dtype
  sub = jnp.asarray(_subtree_mask_np(model), dtype)      # (nbody, nbody)
  # HIGHEST precision: TPU f32 matmuls default to one bf16 MXU pass, whose
  # ~4e-3 input rounding is larger than qM's smallest eigenvalues (the
  # ~1.7e-5 fingertip inertias) — the result loses positive-definiteness
  # and the constraint Cholesky NaNs.  These contractions are tiny, so the
  # multi-pass f32 cost is noise.
  hi = jax.lax.Precision.HIGH   # bf16x3: ~6e-8 rel, 300x margin over the
  # 1.7e-5 fingertip-inertia eigenvalues at half the passes of HIGHEST;
  # one bf16 pass (DEFAULT, ~4e-3) loses positive-definiteness (round-2).
  comp = jnp.einsum('cn...,mn->cm...', body10, sub,
                    precision=hi)                        # (10, nbody, ...)
  db = np.asarray(model.dof_bodyid, np.int32)
  f6 = _spatial_inertia_apply(comp[:, db], cdof6)        # (6, nv, ...)
  g = jnp.einsum('cv...,cw...->vw...', cdof6, f6,
                 precision=hi)                           # (nv, nv, ...)
  bdims = (1,) * (cdof6.ndim - 2)
  up = jnp.asarray(_dof_upper_mask_np(model), dtype)
  u = g * up.reshape(up.shape + bdims)
  eye = jnp.eye(model.nv, dtype=dtype)
  qm = u + jnp.swapaxes(u, 0, 1) * (1.0 - eye).reshape(eye.shape + bdims)
  arm = jnp.diag(model.dof_armature.astype(dtype))
  return qm + arm.reshape(arm.shape + bdims)


def _motion_cross_planes(v6, m6):
  """Spatial motion cross product on planes: v ×ₘ m."""
  ax, ay, az = v6[0], v6[1], v6[2]
  bx, by, bz = m6[0], m6[1], m6[2]
  cx, cy, cz = v6[3], v6[4], v6[5]
  dx, dy, dz = m6[3], m6[4], m6[5]
  return jnp.stack([
      ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx,
      (ay * dz - az * dy) + (cy * bz - cz * by),
      (az * dx - ax * dz) + (cz * bx - cx * bz),
      (ax * dy - ay * dx) + (cx * by - cy * bx)])


def _force_cross_planes(v6, f6):
  """Motion ×* force on planes."""
  ax, ay, az = v6[0], v6[1], v6[2]
  cx, cy, cz = v6[3], v6[4], v6[5]
  tx, ty, tz = f6[0], f6[1], f6[2]
  fx, fy, fz = f6[3], f6[4], f6[5]
  return jnp.stack([
      (ay * tz - az * ty) + (cy * fz - cz * fy),
      (az * tx - ax * tz) + (cz * fx - cx * fz),
      (ax * ty - ay * tx) + (cx * fy - cy * fx),
      ay * fz - az * fy, az * fx - ax * fz, ax * fy - ay * fx])


def rne_planes(model: Model, body10: jax.Array, cdof6: jax.Array,
               qvel: jax.Array):
  """qfrc_bias = C(q, v)·v + G(q) in plane form (single-jointed trees).

  Same two-mask-contraction structure as the AoS `rne` (velocity prefix
  sum, per-dof bias acceleration, backward mask contraction); returns
  (qfrc_bias (nv,), cvel6 (6, nbody))."""
  dtype = cdof6.dtype
  bdims = (1,) * (cdof6.ndim - 2)       # trailing batch dims (batch-minor)
  hi = jax.lax.Precision.HIGH           # see crb_planes precision note
  mask = jnp.asarray(kinematics.ancestor_mask(model), dtype)   # (nbody, nv)
  w6 = cdof6 * qvel[None]                          # (6, nv, ...)
  cvel6 = jnp.einsum('cv...,nv->cn...', w6, mask, precision=hi)

  db = np.asarray(model.dof_bodyid, np.int32)
  ref6 = cvel6[:, db]                              # (6, nv, ...)
  trans_free = np.zeros(model.nv, bool)
  for ji in range(model.njnt):
    if model.jnt_type[ji] == int(JointType.FREE):
      d = model.jnt_dofadr[ji]
      trans_free[d:d + 3] = True
  if trans_free.any():
    ref6 = jnp.where(
        jnp.asarray(trans_free).reshape((1, -1) + bdims), 0.0, ref6)

  tau6 = _motion_cross_planes(ref6, cdof6) * qvel[None]
  grav6 = jnp.concatenate([jnp.zeros(3, dtype),
                           -model.opt.gravity.astype(dtype)])
  cacc6 = (grav6.reshape((6, 1) + bdims)
           + jnp.einsum('cv...,nv->cn...', tau6, mask, precision=hi))

  iv = _spatial_inertia_apply(body10, cvel6)
  ia = _spatial_inertia_apply(body10, cacc6)
  f6 = ia + _force_cross_planes(cvel6, iv)         # (6, nbody, ...)

  btot = jnp.einsum('cn...,nv->cv...', f6, mask, precision=hi)
  qfrc_bias = jnp.einsum('cv...,cv...->v...', cdof6, btot, precision=hi)
  return qfrc_bias, cvel6


def xfrc_planes(model: Model, xipos3: jax.Array, cdof6: jax.Array,
                xfrc_applied: jax.Array) -> jax.Array:
  """Plane-form xfrc_accumulate: projects world COM wrenches into qfrc."""
  dtype = cdof6.dtype
  com = (xipos3[0], xipos3[1], xipos3[2])
  force = tuple(xfrc_applied[:, c].astype(dtype) for c in range(3))
  torque = tuple(xfrc_applied[:, 3 + c].astype(dtype) for c in range(3))
  tau0 = tmath.cross_p(com, force)
  f6 = jnp.stack([torque[0] + tau0[0], torque[1] + tau0[1],
                  torque[2] + tau0[2]] + list(force))
  hi = jax.lax.Precision.HIGH           # see crb_planes precision note
  mask = jnp.asarray(kinematics.ancestor_mask(model), dtype)
  return jnp.einsum('cv...,cv...->v...', cdof6,
                    jnp.einsum('cn...,nv->cv...', f6, mask, precision=hi),
                    precision=hi)


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
  """qfrc_bias = C(q, v)·v + G(q), via Newton–Euler with qacc = 0.

  Level-wise vectorized forward sweep when every body has at most one
  joint; general recursion otherwise.
  """
  from dexterity_tpu.physics import tree
  tables = tree.tree_tables(model)
  dtype = data.qpos.dtype
  iw = tmath.inertia_world(model.body_mass, model.body_inertia, data.ximat)

  if tables.single_jointed:
    cvel, cacc = _vel_acc_matmul(model, data, dtype)
  else:
    cvel, cacc = _vel_acc_unrolled(model, data, dtype)

  # Per-body bias force (vectorized): f = I a + v ×* (I v).
  iv = _inertia_mul_batch(model.body_mass, data.xipos, iw, cvel)
  ia = _inertia_mul_batch(model.body_mass, data.xipos, iw, cacc)
  forces = ia + _force_cross_batch(cvel, iv)

  # Backward pass as a mask contraction: qfrc_bias_i = Σ_{b ∈ subtree(i)}
  # cdof_i · f_b  ==  Σ_b ancestor_mask[b, i] (cdof_i · f_b).
  mask = jnp.asarray(kinematics.ancestor_mask(model), dtype=dtype)
  qfrc_bias = (data.cdof * (mask.T @ forces)).sum(axis=1)
  return data.replace(qfrc_bias=qfrc_bias, cvel=cvel)


def _vel_acc_matmul(model: Model, data: Data, dtype):
  """Velocity and bias acceleration as two ancestor-mask contractions.

  cvel[b] = Σ_{dofs i on the path to b} cdof_i qvel_i is a tree prefix sum
  — one matmul with the static ancestor mask.  The bias-acceleration
  per-dof term τ_i = (v ×ₘ cdof_i) qvel_i needs only a per-dof reference
  velocity v computable from cvel (the child body's full velocity for
  rotational/scalar dofs — self-terms cancel in the weighted sum — and the
  parent's for free-joint translations, which is zero for world-attached
  free bodies), so cacc is a second matmul over τ.  Replaces the
  depth-many level sweeps with two contractions + elementwise work.
  """
  mask = jnp.asarray(kinematics.ancestor_mask(model), dtype=dtype)  # (nb,nv)
  weighted = data.cdof * data.qvel[:, None]                # (nv, 6)
  cvel = mask @ weighted                                   # (nbody, 6)

  # Per-dof reference velocity.
  dof_body = np.asarray(model.dof_bodyid, np.int32)
  ref_vel = cvel[dof_body]                                 # (nv, 6)
  # Free-joint translational dofs use the parent (world) velocity = 0.
  trans_free = np.zeros(model.nv, bool)
  for ji in range(model.njnt):
    if model.jnt_type[ji] == int(JointType.FREE):
      d = model.jnt_dofadr[ji]
      trans_free[d:d + 3] = True
  if trans_free.any():
    ref_vel = jnp.where(jnp.asarray(trans_free)[:, None], 0.0, ref_vel)

  tau = _motion_cross(ref_vel, data.cdof) * data.qvel[:, None]  # (nv, 6)
  grav_base = jnp.concatenate([jnp.zeros(3, dtype),
                               -model.opt.gravity.astype(dtype)])
  cacc = grav_base[None, :] + mask @ tau
  # World row: gravity base only (mask row 0 is zero anyway).
  return cvel, cacc


def _vel_acc_unrolled(model: Model, data: Data, dtype):
  """General body-at-a-time sweep (multi-joint bodies)."""
  cacc = [jnp.concatenate([jnp.zeros(3, dtype),
                           -model.opt.gravity.astype(dtype)])]
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
        acc = acc + _motion_cross(vel, cdof_d) * qd
        vel = vel + cdof_d * qd
      else:
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
  return jnp.stack(cvel_list), jnp.stack(cacc)


def _inertia_mul_batch(mass, com, iw, motion):
  """Vectorized spatial-inertia application: (nbody,…) -> (nbody, 6)."""
  ang, lin0 = motion[..., :3], motion[..., 3:]
  h = mass[:, None] * (lin0 + jnp.cross(ang, com))
  l0 = jnp.einsum('bij,bj->bi', iw, ang) + jnp.cross(com, h)
  return jnp.concatenate([l0, h], axis=-1)


def _force_cross_batch(v, f):
  vang, vlin = v[..., :3], v[..., 3:]
  tau0, force = f[..., :3], f[..., 3:]
  return jnp.concatenate([
      jnp.cross(vang, tau0) + jnp.cross(vlin, force),
      jnp.cross(vang, force),
  ], axis=-1)


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

  # Static transmission tables -> vectorized gathers/scatters.
  trntype = np.asarray(model.actuator_trntype)
  trnid = np.asarray(model.actuator_trnid)
  u_jnt = np.where(trntype == int(ActuatorTrn.JOINT))[0]
  u_ten = np.where(trntype == int(ActuatorTrn.TENDON))[0]
  gear = model.actuator_gear

  length = jnp.zeros(nu, dtype)
  velocity = jnp.zeros(nu, dtype)
  moment = jnp.zeros((nu, model.nv), dtype)
  if len(u_jnt):
    qadr = np.asarray([model.jnt_qposadr[t] for t in trnid[u_jnt]])
    dadr = np.asarray([model.jnt_dofadr[t] for t in trnid[u_jnt]])
    length = length.at[u_jnt].set(data.qpos[qadr] * gear[u_jnt])
    velocity = velocity.at[u_jnt].set(data.qvel[dadr] * gear[u_jnt])
    moment = moment.at[u_jnt, dadr].set(gear[u_jnt])
  if len(u_ten):
    tids = trnid[u_ten]
    length = length.at[u_ten].set(data.ten_length[tids] * gear[u_ten])
    velocity = velocity.at[u_ten].set(
        data.ten_velocity[tids] * gear[u_ten])
    moment = moment.at[u_ten].set(
        model.tendon_moment[tids] * gear[u_ten][:, None])

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
  """mj_integratePos: qpos ← qpos ⊕ qvel·dt (quaternion-aware,
  vectorized per joint class)."""
  out = qpos
  types = np.asarray(model.jnt_type)
  scalar = np.where((types == int(JointType.HINGE))
                    | (types == int(JointType.SLIDE)))[0]
  if len(scalar):
    qadr = np.asarray([model.jnt_qposadr[j] for j in scalar])
    dadr = np.asarray([model.jnt_dofadr[j] for j in scalar])
    out = out.at[qadr].set(qpos[qadr] + dt * qvel[dadr])
  for ji in np.where(types == int(JointType.BALL))[0]:
    qadr, dadr = model.jnt_qposadr[ji], model.jnt_dofadr[ji]
    quat = tmath.quat_integrate(qpos[qadr:qadr + 4],
                                qvel[dadr:dadr + 3], dt)
    out = out.at[qadr:qadr + 4].set(quat)
  for ji in np.where(types == int(JointType.FREE))[0]:
    qadr, dadr = model.jnt_qposadr[ji], model.jnt_dofadr[ji]
    out = out.at[qadr:qadr + 3].set(
        qpos[qadr:qadr + 3] + dt * qvel[dadr:dadr + 3])
    quat = tmath.quat_integrate(
        qpos[qadr + 3:qadr + 7], qvel[dadr + 3:dadr + 6], dt)
    out = out.at[qadr + 3:qadr + 7].set(quat)
  return out


def euler(model: Model, data: Data) -> Data:
  """Semi-implicit Euler with implicit joint damping (MuJoCo 'Euler').

  Solves (M + h·diag(damping)) qacc = qfrc_total(v) so stiff per-joint
  damping (shadow/adroit wrists) is unconditionally stable, then
  v⁺ = v + h·qacc, q⁺ = q ⊕ h·v⁺.
  """
  qfrc_smooth = (data.qfrc_passive + data.qfrc_actuator + data.qfrc_applied
                 + xfrc_accumulate(model, data) - data.qfrc_bias)
  return euler_from_smooth(model, data, qfrc_smooth)


def euler_from_smooth(model: Model, data: Data,
                      qfrc_smooth: jax.Array) -> Data:
  """`euler` given the already-computed smooth force (hot path: avoids
  re-projecting xfrc_applied)."""
  h = model.opt.timestep
  if model.opt.implicit_damping:
    # The constraint solve already used M' = M + h*diag(damping): its qacc
    # is the implicitly-damped acceleration — integrate directly.
    qacc_implicit = data.qacc
  else:
    qfrc = qfrc_smooth + data.qfrc_constraint
    from dexterity_tpu.physics import linalg_pallas
    mhb = data.qM + h * jnp.diag(model.dof_damping)
    qacc_implicit = linalg_pallas.cholesky_solve(mhb, qfrc)
  qvel = data.qvel + h * qacc_implicit
  qpos = integrate_pos(model, data.qpos, qvel, h)
  # data.qacc keeps the explicit (constraint-stage) acceleration, matching
  # MuJoCo's mj_Euler which integrates with the damping-implicit solve but
  # leaves mjData.qacc as mj_forward computed it (warmstart + sensors).
  return data.replace(qpos=qpos, qvel=qvel, time=data.time + h)
