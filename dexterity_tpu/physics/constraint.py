"""Soft-constraint assembly and convex Newton solver (MuJoCo semantics).

Row types (static layout, inactive rows masked by zero weight):
  equality (JOINT / TENDON / CONNECT / WELD)  — bilateral
  dof frictionloss                            — Huber (force in [-fl, fl])
  joint limits (2 rows per limited joint)     — unilateral
  tendon limits (2 rows per limited tendon)   — unilateral
  contacts: top-K deepest candidate points, pyramidal cone
            (2*(condim-1) rows per point, or 1 when condim == 1)

The parametrization matches MuJoCo exactly (verified numerically against
mjData.efc_* in tools/check_constraint.py):
  impedance d(r): solimp spline
  aref = -B (J qvel) - K d(r) r,  B = 2/(dmax tc), K = d/(dmax^2 tc^2 dr^2)
  R = (1-d)/d * invweight,  D = 1/R
with invweight per row type (dof_invweight0, body_invweight0 sums, and the
pyramid factor 2 mu^2 (1 + mu^2)).

The top-K contact selection is the TPU-native answer to MuJoCo's dynamic
constraint counts: the narrow phase scores every candidate point (static
shape), lax.top_k picks the deepest K, and all row data (Jacobians included)
is gathered dynamically — shapes stay static, XLA stays happy.

Solver: projected Newton on qacc with exact Hessian (M + J^T D_active J),
Cholesky solve, and backtracking line search — fixed iteration counts from
Model.opt, vmap/jit friendly.

Reference semantics replaced: mj_fwdConstraint / physics.step C boundary
(SURVEY.md §2.7, §3.3).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu.core.types import (Data, EqType, JointType, Model,
                                      num_contact_points)
from dexterity_tpu.physics import kinematics

# Row-type codes used for cost shaping.
_BILATERAL = 0
_FRICTIONLOSS = 1
_UNILATERAL = 2


class Rows(NamedTuple):
  J: jax.Array        # (nrow, nv)
  aref: jax.Array     # (nrow,)
  d: jax.Array        # (nrow,) impedance (0 for disabled rows)
  invweight: jax.Array  # (nrow,)
  fl: jax.Array       # (nrow,) frictionloss bound (only for FL rows)
  kind: np.ndarray    # (nrow,) static row-type codes
  # Static: True for rows whose force is transmitted through the joint
  # structure (limits, frictionloss, JOINT/TENDON equalities) — the rows a
  # joint torque sensor sees.  False for contacts and CONNECT/WELD wrenches
  # (external to the joints; MuJoCo accounts them in cfrc_ext).
  transmitted: np.ndarray  # (nrow,) bool


def impedance(solimp: jax.Array, r: jax.Array) -> jax.Array:
  """MuJoCo solimp spline d(r)."""
  d0, dmax, width, mid, power = (solimp[..., 0], solimp[..., 1],
                                 solimp[..., 2], solimp[..., 3],
                                 solimp[..., 4])
  x = jnp.clip(jnp.abs(r) / jnp.maximum(width, 1e-12), 0.0, 1.0)
  mid = jnp.clip(mid, 1e-4, 1 - 1e-4)
  power = jnp.maximum(power, 1.0)
  y_lo = (x / mid) ** power * mid
  y_hi = 1.0 - ((1.0 - x) / (1.0 - mid)) ** power * (1.0 - mid)
  y = jnp.where(x < mid, y_lo, y_hi)
  return d0 + y * (dmax - d0)


def _kbi(solref: jax.Array, solimp: jax.Array, r: jax.Array, vel: jax.Array,
         timestep) -> tuple[jax.Array, jax.Array]:
  """Returns (d, aref) for rows with violation r and velocity vel."""
  d = impedance(solimp, r)
  dmax = solimp[..., 1]
  tc, dr = solref[..., 0], solref[..., 1]
  tc = jnp.maximum(tc, 2.0 * timestep)
  # Direct parametrization when solref is non-positive.
  direct = solref[..., 0] <= 0
  b_std = 2.0 / jnp.maximum(dmax * tc, 1e-12)
  k_std = d / jnp.maximum(dmax * dmax * tc * tc * dr * dr, 1e-12)
  b = jnp.where(direct, -solref[..., 1], b_std)
  k = jnp.where(direct, -solref[..., 0] * d, k_std)
  aref = -b * vel - k * r
  return d, aref


def _kbi_shared(solref, solimp, r_imp, r, vel, timestep):
  """Like _kbi but the impedance argument (r_imp, e.g. a multi-row
  residual norm) differs from the per-row stiffness residual r —
  MuJoCo's convention for CONNECT/WELD equalities."""
  d = impedance(solimp, r_imp)
  dmax = solimp[..., 1]
  tc, dr = solref[..., 0], solref[..., 1]
  tc = jnp.maximum(tc, 2.0 * timestep)
  direct = solref[..., 0] <= 0
  b_std = 2.0 / jnp.maximum(dmax * tc, 1e-12)
  k_std = d / jnp.maximum(dmax * dmax * tc * tc * dr * dr, 1e-12)
  b = jnp.where(direct, -solref[..., 1], b_std)
  k = jnp.where(direct, -solref[..., 0] * d, k_std)
  return d, -b * vel - k * r


# ---------------------------------------------------------------------------
# Row assembly
# ---------------------------------------------------------------------------


def _cw_geom(model: Model, data: Data, ei: int, etype: EqType, dtype):
  """CONNECT/WELD rows: (J (k,nv), res (k,)) with k=3 (connect) or 6 (weld).

  MuJoCo data layout (verified numerically against mjData.efc_* with
  nonzero anchor/relpose, see tests/test_weld_mocap.py):
    CONNECT: data[0:3] anchor in body1 frame; data[3:6] the same point in
      body2 frame (resolved at compile).
    WELD: data[0:3] anchor in body2 frame; data[3:6] body1-frame point
      (relpose position); data[6:10] relpose quat; data[10] torquescale.
  """
  from dexterity_tpu.physics import math as tmath
  data_e = model.eq_data[ei]
  b1 = model.eq_obj1[ei]
  b2 = model.eq_obj2[ei]
  q1 = data.xquat[b1]
  q2 = data.xquat[b2]
  if etype == EqType.CONNECT:
    a1, a2 = data_e[0:3], data_e[3:6]
  else:
    a1, a2 = data_e[3:6], data_e[0:3]
  p1 = data.xpos[b1] + tmath.quat_rotate(q1, a1.astype(dtype))
  p2 = data.xpos[b2] + tmath.quat_rotate(q2, a2.astype(dtype))
  jac1p, jac1r = kinematics.jac_point(model, data, b1, p1)
  jac2p, jac2r = kinematics.jac_point(model, data, b2, p2)
  res_p = p1 - p2
  jrows = jac1p - jac2p                           # (3, nv)
  if etype == EqType.CONNECT:
    return jrows, res_p
  # Rotation residual: torquescale * vec(q2^-1 q1 qrel); its velocity
  # Jacobian is ts * 0.5 (e_w I - [e_vec]x) R2^T (jacr1 - jacr2).
  ts = jnp.where(data_e[10] > 0, data_e[10], 1.0).astype(dtype)
  qrel = data_e[6:10].astype(dtype)
  qrel = qrel / jnp.maximum(jnp.linalg.norm(qrel), 1e-15)
  e_q = tmath.quat_mul(tmath.quat_mul(tmath.quat_inv(q2), q1), qrel)
  res_r = ts * e_q[1:]
  e_w, e_v = e_q[0], e_q[1:]
  skew = jnp.array([[0.0, -e_v[2], e_v[1]],
                    [e_v[2], 0.0, -e_v[0]],
                    [-e_v[1], e_v[0], 0.0]], dtype=dtype)
  r2t = tmath.quat_to_mat(q2).T
  gmat = 0.5 * (e_w * jnp.eye(3, dtype=dtype) - skew) @ r2t
  jrot = ts * (gmat @ (jac1r - jac2r))            # (3, nv)
  return jnp.concatenate([jrows, jrot]), jnp.concatenate([res_p, res_r])


def _qpos_tangent(model: Model, qpos: jax.Array, qvel: jax.Array,
                  dtype) -> jax.Array:
  """Exact d(qpos)/dt given qvel: the tangent map of mj_integratePos at
  dt → 0 (quaternion joints: q̇ = ½ q ⊗ (0, ω_local))."""
  from dexterity_tpu.physics import math as tmath
  out = jnp.zeros_like(qpos)
  types = np.asarray(model.jnt_type)
  scalar = np.where((types == int(JointType.HINGE))
                    | (types == int(JointType.SLIDE)))[0]
  if len(scalar):
    qadr = np.asarray([model.jnt_qposadr[j] for j in scalar])
    dadr = np.asarray([model.jnt_dofadr[j] for j in scalar])
    out = out.at[qadr].set(qvel[dadr])
  def _qdot(q, omega):
    return 0.5 * tmath.quat_mul(q, jnp.concatenate(
        [jnp.zeros((1,), dtype), omega]))
  for ji in np.where(types == int(JointType.BALL))[0]:
    qadr, dadr = model.jnt_qposadr[ji], model.jnt_dofadr[ji]
    out = out.at[qadr:qadr + 4].set(
        _qdot(qpos[qadr:qadr + 4], qvel[dadr:dadr + 3]))
  for ji in np.where(types == int(JointType.FREE))[0]:
    qadr, dadr = model.jnt_qposadr[ji], model.jnt_dofadr[ji]
    out = out.at[qadr:qadr + 3].set(qvel[dadr:dadr + 3])
    out = out.at[qadr + 3:qadr + 7].set(
        _qdot(qpos[qadr + 3:qadr + 7], qvel[dadr + 3:dadr + 6]))
  return out


def _cw_jdot_qvel(model: Model, data: Data, cw: list, dtype) -> jax.Array:
  """J̇q̇ for all CONNECT/WELD rows (concatenated, eq order), via a jvp
  through FK: MuJoCo's equality aref subtracts this bias so the row's
  *true* residual acceleration (J q̈ + J̇q̇) tracks -b·vel - k·res
  (verified exact against mjData.efc_aref; see tests/test_weld_mocap.py)."""
  qvel = data.qvel

  def rowvels(qpos):
    d2 = kinematics.fwd_position(model, data.replace(qpos=qpos))
    outs = []
    for ei, etype in cw:
      jrows, _ = _cw_geom(model, d2, ei, etype, dtype)
      outs.append(jrows @ qvel)
    return jnp.concatenate(outs)

  qdot = _qpos_tangent(model, data.qpos, qvel, dtype)
  _, jdq = jax.jvp(rowvels, (data.qpos,), (qdot,))
  return jdq


def _eq_rows(model: Model, data: Data, dtype):
  """Equality constraint rows.  Also returns a static per-row flag: True
  for dof-space rows (JOINT/TENDON), False for CONNECT/WELD wrenches."""
  js, refs, ds, iws, trans = [], [], [], [], []
  h = model.opt.timestep
  dof_qposadr = kinematics._dof_qposadr(model)
  cw = [(ei, EqType(model.eq_type[ei])) for ei in range(model.neq)
        if EqType(model.eq_type[ei]) in (EqType.CONNECT, EqType.WELD)]
  jdq_all = _cw_jdot_qvel(model, data, cw, dtype) if cw else None
  cw_off = 0
  for ei in range(model.neq):
    etype = EqType(model.eq_type[ei])
    solref = model.eq_solref[ei]
    solimp = model.eq_solimp[ei]
    data_e = model.eq_data[ei]
    if etype == EqType.JOINT:
      j1 = model.eq_obj1[ei]
      j2 = model.eq_obj2[ei]
      a1 = model.jnt_qposadr[j1]
      d1 = model.jnt_dofadr[j1]
      q1 = data.qpos[a1] - model.qpos0[a1]
      if j2 >= 0:
        a2 = model.jnt_qposadr[j2]
        d2 = model.jnt_dofadr[j2]
        q2 = data.qpos[a2] - model.qpos0[a2]
      else:
        q2 = jnp.zeros((), dtype)
      powers = jnp.stack([q2 ** k for k in range(5)])
      poly = jnp.dot(data_e[:5], powers)
      dpoly = jnp.dot(data_e[1:5],
                      jnp.stack([(k + 1) * q2 ** k for k in range(4)]))
      res = q1 - poly
      row = jnp.zeros(model.nv, dtype).at[d1].set(1.0)
      vel = data.qvel[d1]
      if j2 >= 0:
        row = row.at[d2].add(-dpoly)
        vel = vel - dpoly * data.qvel[d2]
      dd, aref = _kbi(solref, solimp, res, vel, h)
      js.append(row)
      refs.append(aref)
      ds.append(dd)
      trans.append(True)
      iw = model.dof_invweight0[d1]
      if j2 >= 0:
        iw = iw + model.dof_invweight0[d2]
      iws.append(iw)
    elif etype == EqType.TENDON:
      t1 = model.eq_obj1[ei]
      t2 = model.eq_obj2[ei]
      ref0 = model.tendon_moment @ model.qpos0[dof_qposadr]
      l1 = data.ten_length[t1] - ref0[t1]
      row = model.tendon_moment[t1]
      vel = data.ten_velocity[t1]
      iw = model.tendon_invweight0[t1]
      if t2 >= 0:
        l2 = data.ten_length[t2] - ref0[t2]
        powers = jnp.stack([l2 ** k for k in range(5)])
        poly = jnp.dot(data_e[:5], powers)
        dpoly = jnp.dot(data_e[1:5],
                        jnp.stack([(k + 1) * l2 ** k for k in range(4)]))
        res = l1 - poly
        row = row - dpoly * model.tendon_moment[t2]
        vel = vel - dpoly * data.ten_velocity[t2]
        iw = iw + model.tendon_invweight0[t2]
      else:
        res = l1 - data_e[0]
      dd, aref = _kbi(solref, solimp, res, vel, h)
      js.append(row)
      refs.append(aref)
      ds.append(dd)
      iws.append(iw)
      trans.append(True)
    elif etype in (EqType.CONNECT, EqType.WELD):
      b1 = model.eq_obj1[ei]
      b2 = model.eq_obj2[ei]
      k = 3 if etype == EqType.CONNECT else 6
      jrows, res = _cw_geom(model, data, ei, etype, dtype)
      vel = jrows @ data.qvel
      jdq = jdq_all[cw_off:cw_off + k]
      cw_off += k
      # MuJoCo evaluates the impedance once per equality, at the norm of
      # the full residual (all 3 or 6 rows), not per row; and its aref
      # subtracts the J̇q̇ bias so the true residual acceleration is servoed.
      r_norm = jnp.linalg.norm(res)
      iw_p = (model.body_invweight0[b1, 0] + model.body_invweight0[b2, 0])
      iw_r = (model.body_invweight0[b1, 1] + model.body_invweight0[b2, 1])
      for a in range(k):
        dd, aref = _kbi_shared(solref, solimp, r_norm, res[a], vel[a], h)
        js.append(jrows[a])
        refs.append(aref - jdq[a])
        ds.append(dd)
        iws.append(iw_p if a < 3 else iw_r)
        trans.append(False)
    else:
      raise NotImplementedError(etype)
  return js, refs, ds, iws, trans


def _fl_rows(model: Model, data: Data, dtype):
  """Dof frictionloss rows (static row set: dofs with fl > 0).

  Returns diag-row parts (dof idx, aref, d, invweight, fl): J = e_dof."""
  h = model.opt.timestep
  fl_np = np.asarray(jax.device_get(model.dof_frictionloss))
  idx = np.where(fl_np > 0)[0]
  n = len(idx)
  if n == 0:
    z = jnp.zeros((0,), dtype)
    return np.zeros(0, np.int64), z, z, z, z
  solref = jnp.broadcast_to(jnp.asarray([0.02, 1.0], dtype), (n, 2))
  solimp = jnp.broadcast_to(
      jnp.asarray([0.9, 0.95, 0.001, 0.5, 2.0], dtype), (n, 5))
  dd, aref = _kbi(solref, solimp, jnp.zeros(n, dtype), data.qvel[idx], h)
  return idx, aref, dd, model.dof_invweight0[idx], model.dof_frictionloss[idx]


def _jnt_limit_rows(model: Model, data: Data, dtype):
  """Scalar-joint limit rows as diag rows: J = sign * e_dof.

  Returns (dof idx, sign, aref, d, invweight) with both sides stacked
  (side 0 rows then side 1 rows — reference efc ordering)."""
  h = model.opt.timestep
  jids = [ji for ji in range(model.njnt)
          if model.jnt_limited[ji]
          and JointType(model.jnt_type[ji]) in (JointType.HINGE,
                                                JointType.SLIDE)]
  if not jids:
    z = jnp.zeros((0,), dtype)
    return (np.zeros(0, np.int64), np.zeros(0), z, z, z)
  jids_np = np.asarray(jids)
  qadr = np.asarray([model.jnt_qposadr[j] for j in jids])
  dadr = np.asarray([model.jnt_dofadr[j] for j in jids])
  arefs, dds = [], []
  for side, sign in ((0, 1.0), (1, -1.0)):
    dist = sign * (data.qpos[qadr] - model.jnt_range[jids_np, side])
    margin = model.jnt_margin[jids_np]
    active = dist < margin
    r = jnp.where(active, dist - margin, 0.0)
    dd, aref = _kbi(model.jnt_solref[jids_np], model.jnt_solimp[jids_np],
                    r, sign * data.qvel[dadr], h)
    arefs.append(aref)
    dds.append(jnp.where(active, dd, 0.0))
  n = len(jids)
  return (np.concatenate([dadr, dadr]),
          np.concatenate([np.ones(n), -np.ones(n)]),
          jnp.concatenate(arefs), jnp.concatenate(dds),
          jnp.concatenate([model.dof_invweight0[dadr]] * 2))


def _ten_limit_rows(model: Model, data: Data, dtype):
  """Tendon limit rows (dense: tendon_moment rows)."""
  h = model.opt.timestep
  tids = [ti for ti in range(model.ntendon) if model.tendon_limited[ti]]
  if not tids:
    z = jnp.zeros((0,), dtype)
    return jnp.zeros((0, model.nv), dtype), z, z, z
  tids_np = np.asarray(tids)
  js, arefs, dds, iws = [], [], [], []
  for side, sign in ((0, 1.0), (1, -1.0)):
    dist = sign * (data.ten_length[tids_np]
                   - model.tendon_range[tids_np, side])
    margin = model.tendon_margin[tids_np]
    active = dist < margin
    r = jnp.where(active, dist - margin, 0.0)
    dd, aref = _kbi(model.tendon_solref[tids_np],
                    model.tendon_solimp[tids_np], r,
                    sign * data.ten_velocity[tids_np], h)
    js.append(sign * model.tendon_moment[tids_np])
    arefs.append(aref)
    dds.append(jnp.where(active, dd, 0.0))
    iws.append(model.tendon_invweight0[tids_np])
  return (jnp.concatenate(js), jnp.concatenate(arefs),
          jnp.concatenate(dds), jnp.concatenate(iws))


def _contact_parts(model: Model, data: Data, dtype, groups=None):
  """Top-K contact rows with a pyramidal friction cone.

  Returns per selected point: rows for condim==1 (normal only) or
  2*(condim-1) pyramid rows.  All candidate points share the model-wide
  maximum condim for static shape; rows beyond a point's condim get zero
  impedance.

  TPU structure: the top-K residual comes straight from the top_k values
  (no gather); the selected geometry arrives through one one-hot MXU
  contraction over the Contact planes; the selected slots' pair ids are
  resolved to parameters by a second one-hot against the static
  (NPARAM, npair) table (constant MXU operand); body ancestor masks use a
  tiny one-hot over nbody; and the directional jacobians are
  (k,3)x(3,nv) matmuls — the whole stage has no per-env dynamic gathers.

  Args:
    groups: optional narrow-phase group list (collide_group_planes).
      When given, the 13 payload planes are selected by per-group one-hot
      contractions at static offsets and summed — the groups are never
      concatenated into a Contact (hot path).  When None, reads
      data.contact (refresh/conformance path).
  """
  from dexterity_tpu.core import types as T
  from dexterity_tpu.physics.collision.primitives import (
      _pair_param_planes, onehot_select)
  if model.npair == 0 or (groups is not None and not groups):
    return None

  h = model.opt.timestep
  max_condim = max(model.pair_condim) if model.npair else 1

  if groups is None:
    c = data.contact
    score = c.dist - c.margin                           # (npoint,)
  else:
    score = jnp.concatenate([g['dist'] - g['margin'] for g in groups])
  npoint = score.shape[0]
  k_sel = min(model.opt.contact_top_k, npoint)

  if jax.default_backend() == 'tpu' and k_sel < npoint:
    # ApproxTopK (PartialReduce) instead of a full 846-wide stable sort —
    # the sort was ~7% of the hot substep.  recall_target misses only
    # boundary-rank (shallow, inactive) candidates; penetrating contacts
    # number far fewer than K and always survive.  CPU keeps exact top_k
    # (conformance tests run there).
    neg_score, sel = jax.lax.approx_max_k(-score, k_sel,
                                          recall_target=0.95)
    sel = sel.astype(jnp.int32)
  else:
    neg_score, sel = jax.lax.top_k(-score, k_sel)       # deepest first
  score_sel = -neg_score
  active = score_sel < 0
  r = jnp.minimum(score_sel, 0.0)

  if groups is None:
    payload = jnp.concatenate(
        [c.pos, c.frame,
         jnp.maximum(c.pair, 0).astype(dtype)[None]], axis=0)
    selp = onehot_select(sel, payload)                  # (13, k)
  else:
    hi_p = jax.lax.Precision.HIGH     # see crb_planes precision note
    selp = 0.0
    off = 0
    for g in groups:
      n = g['dist'].shape[0]
      payload_g = jnp.stack(
          list(g['pos']) + list(g['frame'])
          + [g['pair'].astype(dtype)])                  # (13, n)
      oh = (sel[:, None] == jnp.arange(off, off + n)[None, :])
      selp = selp + jnp.einsum('kn,pn->pk', oh.astype(dtype), payload_g,
                               precision=hi_p)
      off += n
  pos = selp[0:3]                                       # (3, k) planes
  nrm = selp[3:6]
  t1d = selp[6:9]
  t2d = selp[9:12]
  pid = jnp.round(selp[12]).astype(jnp.int32)           # (k,) pair ids

  # Pair parameters from the static table (constant operand — nothing
  # parameter-sized ever exists per env/slot).
  table = jnp.asarray(
      _pair_param_planes(model, np.arange(model.npair)), dtype)
  par = onehot_select(pid, table)                       # (NPARAM, k)
  solref = par[T.PARAM_SOLREF].T                        # (k, 2)
  solimp = par[T.PARAM_SOLIMP].T                        # (k, 5)
  mu3 = par[T.PARAM_FRICTION]                           # (3, k)
  condim = par[T.PARAM_CONDIM]
  b1 = jnp.round(par[T.PARAM_BODY1]).astype(jnp.int32)
  b2 = jnp.round(par[T.PARAM_BODY2]).astype(jnp.int32)
  iw_t = par[T.PARAM_IW]

  # mask[b2] - mask[b1] via one-hot over nbody (nbody is tiny).
  mask = jnp.asarray(kinematics.ancestor_mask(model), dtype=dtype)
  bodies = jnp.arange(model.nbody)
  ob = ((b2[:, None] == bodies[None, :]).astype(dtype)
        - (b1[:, None] == bodies[None, :]).astype(dtype))
  maskdiff = ob @ mask                                  # (k, nv)

  ang = data.cdof[:, :3]                                # (nv, 3)
  lin = data.cdof[:, 3:]
  hi = jax.lax.Precision.HIGH         # see crb_planes precision note

  def cross_planes(u, v):
    return jnp.stack([u[1] * v[2] - u[2] * v[1],
                      u[2] * v[0] - u[0] * v[2],
                      u[0] * v[1] - u[1] * v[0]])

  def jac_t(d3):
    # Translational row for direction d at point pos (body2 minus body1):
    # J[k, v] = maskdiff * (d . lin_v + (pos x d) . ang_v).
    return maskdiff * (jnp.einsum('ck,vc->kv', d3, lin, precision=hi)
                       + jnp.einsum('ck,vc->kv', cross_planes(pos, d3), ang,
                                    precision=hi))

  def jac_r(d3):
    return maskdiff * jnp.einsum('ck,vc->kv', d3, ang, precision=hi)

  jn = jac_t(nrm)
  qvel = data.qvel

  if max_condim == 1:
    dd, aref = _kbi(solref, solimp, r, jn @ qvel, h)
    dd = jnp.where(active, dd, 0.0)
    return ('dense', jn, aref, dd, iw_t)

  # Friction-direction jacobians and per-dim coefficients.  The pyramid
  # rows Jn +/- mu_j Jf_j are NOT materialized: the solver consumes the
  # factored (jn, jf, mu) form (ContactBlock) — matvec/rmatvec/Hessian
  # expand the rows arithmetically from k-row directional blocks, which
  # keeps a (2*ndim*k, nv) tensor (and its bf16 MXU operand copies) out
  # of every Newton iteration.
  ndim_rows = max_condim - 1
  dirs = [jac_t(t1d), jac_t(t2d)]
  mus = [mu3[0], mu3[0]]
  if ndim_rows > 2:
    dirs += [jac_r(nrm), jac_r(t1d), jac_r(t2d)][:ndim_rows - 2]
    mus += [mu3[1], mu3[2], mu3[2]][:ndim_rows - 2]
  # One stacked directional operand R = [jn; jf_1..jf_ndim]: the solver's
  # matvec / rmatvec / Hessian each become a SINGLE contraction against R
  # (one bf16 MXU operand copy per use instead of separate jn and jf ones).
  rmat = jnp.stack([jn] + dirs[:ndim_rows])             # (1+ndim, k, nv)
  jf = rmat[1:]                                         # (ndim, k, nv)
  mu = jnp.stack(mus[:ndim_rows])                       # (ndim, k)

  # One regularizer per contact, from the slide friction coefficient
  # (matches mujoco: efc_R is uniform across a contact's pyramid rows).
  mu0 = mu3[0]
  iw_pyr = iw_t * 2.0 * mu0 * mu0 * (1.0 + mu0 * mu0)

  jnv = jn @ qvel                                       # (k,)
  jfv = jnp.einsum('jkv,v->jk', jf, qvel,
                   precision=jax.lax.Precision.HIGH)    # (ndim, k)
  dim_ok = condim[None, :] > (1 + jnp.arange(ndim_rows))[:, None]
  # All 2*ndim pyramid rows in ONE _kbi evaluation: vel rows stacked as
  # (ndim, 2, k) — j-major, + before - — matching the ContactBlock row
  # order; solref/solimp/r broadcast over the leading (ndim, 2) axes.
  signs = jnp.asarray([1.0, -1.0], dtype)
  vel_rows = (jnv[None, None, :]
              + signs[None, :, None] * (mu * jfv)[:, None, :])
  dd, aref = _kbi(solref, solimp, r, vel_rows, h)
  dd = jnp.where(active & dim_ok[:, None, :],
                 jnp.broadcast_to(dd, vel_rows.shape), 0.0)
  return ('pyr', rmat, mu, aref.reshape(-1), dd.reshape(-1),
          jnp.tile(iw_pyr, 2 * ndim_rows))


def _contact_rows(model: Model, data: Data, dtype, groups=None):
  """Dense concatenated contact rows (conformance/debug surface)."""
  parts = _contact_parts(model, data, dtype, groups=groups)
  if parts is None:
    z = jnp.zeros((0,), dtype)
    return jnp.zeros((0, model.nv), dtype), z, z, z
  if parts[0] == 'dense':
    return parts[1:]
  _, rmat, mu, aref, dd, iw = parts
  jn, jf = rmat[0], rmat[1:]
  rows = jnp.concatenate(
      [jn + sign * mu[j][:, None] * jf[j]
       for j in range(jf.shape[0]) for sign in (1.0, -1.0)])
  return rows, aref, dd, iw


def _contact_block(model: Model, data: Data, dtype, groups=None):
  """Contact rows as a solver block (factored pyramid when condim > 1)."""
  parts = _contact_parts(model, data, dtype, groups=groups)
  if parts is None:
    return None
  if parts[0] == 'dense':
    _, jn, aref, dd, iw = parts
    return DenseBlock(jn, aref, _bigd(dd, iw, dtype), _UNILATERAL, None,
                      np.zeros(jn.shape[0], bool))
  _, rmat, mu, aref, dd, iw = parts
  return ContactBlock(rmat, mu, aref, _bigd(dd, iw, dtype), _UNILATERAL)


class DenseBlock(NamedTuple):
  """Constraint rows with a dense (n, nv) jacobian."""
  J: jax.Array
  aref: jax.Array
  big_d: jax.Array     # (n,) impedance weight D = d / ((1-d) iw), 0 disabled
  kind: int            # static row-type code (uniform within a block)
  fl: Optional[jax.Array]      # frictionloss bound (FL blocks only)
  trans: Optional[np.ndarray]  # static per-row transmitted mask (eq block)


class DiagBlock(NamedTuple):
  """Constraint rows whose jacobian is sign * e_dof (limits, frictionloss).

  matvec is a static-index selection; rmatvec and the Hessian diagonal go
  through the static scatter matrix `scat` (nv, n) — a tiny constant
  matmul instead of a runtime scatter, which serializes on TPU."""
  dof: np.ndarray      # (n,) static dof indices
  sign: np.ndarray     # (n,) static +-1
  scat: np.ndarray     # (nv, n) static: scat[dof[i], i] = sign[i]
  aref: jax.Array
  big_d: jax.Array
  kind: int
  fl: Optional[jax.Array]


class ContactBlock(NamedTuple):
  """Pyramidal contact rows in factored form: row(j, s) = jn + s mu_j jf_j.

  The (2*ndim*k, nv) dense pyramid jacobian is never materialized; matvec,
  rmatvec and the Hessian work on ONE stacked directional operand
  R = [jn; jf_1..jf_ndim] (1+ndim, k, nv).  With D = diag weights per row,
  writing s_j = w_{j+} + w_{j-} and c_j = mu_j (w_{j+} - w_{j-}),
  q_j = mu_j^2 s_j:
    J v   : rv = R v, then rows(j, s) = rv_0 +- mu_j rv_j (combine rows)
    J^T f : R^T coef with coef_0 = sum(f), coef_j = mu_j (f_{j+} - f_{j-})
    J^T D J = R^T P, P_0 = (sum_j s_j) jn + sum_j c_j jf_j,
              P_j = c_j jn + q_j jf_j
  — each a single contraction against R (one MXU operand copy per use);
  the mixing coefficients are tiny VPU work.  Row order (slot-major within
  each (j, sign) group, + before -) matches the previous concatenated
  layout, so aref/big_d/xs vectors are unchanged."""
  r: jax.Array         # (1+ndim, k, nv) stacked [jn; jf_1..jf_ndim]
  mu: jax.Array        # (ndim, k)
  aref: jax.Array      # (2*ndim*k,)
  big_d: jax.Array     # (2*ndim*k,)
  kind: int            # always _UNILATERAL


class StaticBlock(NamedTuple):
  """Rows whose jacobian is a compile-time constant, merged across types.

  Frictionloss (J = e_dof), scalar joint limits (sign * e_dof) and tendon
  limits (sign * tendon_moment) all have static jacobians; merging them
  means each Newton iteration touches all of them with ONE
  constant-operand matvec / rmatvec / weighted-Hessian contraction (MXU)
  instead of one set per block, and one line-search cost evaluation.  The
  mixed row kinds (frictionloss Huber vs unilateral) are a static mask.
  Row order inside the block keeps the reference efc ordering
  (frictionloss, joint limits, tendon limits)."""
  J: np.ndarray        # (n, nv) constant jacobian
  jt: np.ndarray       # (nv, n) constant transpose (matvec operand)
  jj: np.ndarray       # (n, nv*nv) constant J[r,i]*J[r,j] (Hessian operand)
  aref: jax.Array
  big_d: jax.Array
  fl: jax.Array        # (n,) frictionloss bound (0 on non-FL rows)
  m_fl: np.ndarray     # (n,) static: True on frictionloss rows


def _static_block(nv, parts, dtype):
  """parts: list of (J_const (n_i, nv) np, aref, big_d, fl or None)."""
  js = np.concatenate([p[0] for p in parts])
  n = js.shape[0]
  aref = jnp.concatenate([p[1] for p in parts])
  big_d = jnp.concatenate([p[2] for p in parts])
  fl = jnp.concatenate([
      p[3] if p[3] is not None else jnp.zeros(p[0].shape[0], dtype)
      for p in parts])
  m_fl = np.concatenate([np.full(p[0].shape[0], p[3] is not None)
                         for p in parts])
  jj = np.einsum('ri,rj->rij', js, js).reshape(n, nv * nv)
  return StaticBlock(js, js.T.copy(), jj, aref, big_d, fl, m_fl)


def _diag_block(nv, dof, sign, aref, big_d, kind, fl):
  scat = np.zeros((nv, len(dof)))
  scat[dof, np.arange(len(dof))] = sign
  return DiagBlock(dof, sign, scat, aref, big_d, kind, fl)


def _bigd(d, invweight, dtype):
  d_clamped = jnp.clip(d, 0.0, 1.0 - 1e-6)
  big = d_clamped / jnp.maximum((1.0 - d_clamped) * invweight, 1e-12)
  return jnp.where(d > 0, big, 0.0).astype(dtype)


def assemble_blocks(model: Model, data: Data, contact_groups=None):
  """Block-structured constraint assembly (the hot-path form).

  Reference efc ordering preserved across blocks: equalities,
  frictionloss, joint limits, tendon limits, contacts."""
  dtype = data.qpos.dtype
  blocks = []

  ej, er, ed, ei, etrans = _eq_rows_blocks(model, data, dtype)
  if ej.shape[0]:
    blocks.append(DenseBlock(ej, er, _bigd(ed, ei, dtype), _BILATERAL,
                             None, etrans))
  static_parts = []
  fdof, fr, fd, fi, ffl = _fl_rows(model, data, dtype)
  if len(fdof):
    jfl = np.zeros((len(fdof), model.nv))
    jfl[np.arange(len(fdof)), fdof] = 1.0
    static_parts.append((jfl, fr, _bigd(fd, fi, dtype), ffl))
  ldof, lsign, lr, ld, li = _jnt_limit_rows(model, data, dtype)
  if len(ldof):
    jl = np.zeros((len(ldof), model.nv))
    jl[np.arange(len(ldof)), ldof] = lsign
    static_parts.append((jl, lr, _bigd(ld, li, dtype), None))
  tj, tr, td, ti = _ten_limit_rows(model, data, dtype)
  if tj.shape[0]:
    # The tendon-limit jacobian is sign * tendon_moment — a model constant
    # (same _fl_rows convention: numpy straight from the concrete model
    # arrays; `tj` itself is a tracer under jit).
    tids = [ti_ for ti_ in range(model.ntendon) if model.tendon_limited[ti_]]
    tm = np.asarray(jax.device_get(model.tendon_moment))[np.asarray(tids)]
    static_parts.append((np.concatenate([tm, -tm]), tr,
                         _bigd(td, ti, dtype), None))
  if static_parts:
    blocks.append(_static_block(model.nv, static_parts, dtype))
  cb = _contact_block(model, data, dtype, groups=contact_groups)
  if cb is not None:
    blocks.append(cb)
  return blocks


def assemble(model: Model, data: Data) -> Rows:
  """Dense concatenated rows (conformance/debug surface; the solver uses
  assemble_blocks).  Row order and values match MuJoCo's efc_* layout as
  verified in tests/test_weld_mocap.py / tools/check_constraint.py."""
  dtype = data.qpos.dtype

  ej, er, ed, ei, etrans = _eq_rows_blocks(model, data, dtype)
  fdof, fr, fd, fi, ffl = _fl_rows(model, data, dtype)
  fj = jnp.zeros((len(fdof), model.nv), dtype)
  if len(fdof):
    fj = fj.at[np.arange(len(fdof)), fdof].set(1.0)
  ldof, lsign, lr, ld, li = _jnt_limit_rows(model, data, dtype)
  lj = jnp.zeros((len(ldof), model.nv), dtype)
  if len(ldof):
    lj = lj.at[np.arange(len(ldof)), ldof].set(jnp.asarray(lsign, dtype))
  tj, tr, td, ti = _ten_limit_rows(model, data, dtype)
  cj, cr, cd, ci = _contact_rows(model, data, dtype)

  n_e, n_f, n_l = ej.shape[0], len(fdof), len(ldof)
  n_t, n_c = tj.shape[0], cj.shape[0]
  kind = np.concatenate([
      np.full(n_e, _BILATERAL, np.int32),
      np.full(n_f, _FRICTIONLOSS, np.int32),
      np.full(n_l + n_t, _UNILATERAL, np.int32),
      np.full(n_c, _UNILATERAL, np.int32)])
  fl = jnp.concatenate([jnp.zeros(n_e, dtype), ffl,
                        jnp.zeros(n_l + n_t + n_c, dtype)])
  transmitted = np.concatenate([etrans, np.ones(n_f + n_l + n_t, bool),
                                np.zeros(n_c, bool)])
  return Rows(
      J=jnp.concatenate([ej, fj, lj, tj, cj]),
      aref=jnp.concatenate([er, fr, lr, tr, cr]),
      d=jnp.concatenate([ed, fd, ld, td, cd]),
      invweight=jnp.concatenate([ei, fi, li, ti, ci]),
      fl=fl, kind=kind, transmitted=transmitted)


def _eq_rows_blocks(model: Model, data: Data, dtype):
  js, refs, ds, iws, trans = _eq_rows(model, data, dtype)
  if not js:
    z = jnp.zeros((0,), dtype)
    return (jnp.zeros((0, model.nv), dtype), z, z, z,
            np.zeros(0, bool))
  return (jnp.stack(js), jnp.stack(refs), jnp.stack(ds), jnp.stack(iws),
          np.asarray(trans, bool))


# ---------------------------------------------------------------------------
# Solver
# ---------------------------------------------------------------------------


_HI = jax.lax.Precision.HIGH


def _blk_matvec(blk, v):
  """J_blk @ v for a (nv,) vector."""
  if isinstance(blk, StaticBlock):
    return v @ jnp.asarray(blk.jt, v.dtype)   # constant operand, one MXU op
  if isinstance(blk, DiagBlock):
    # v @ scat (constant operand, one MXU op) — the static-index gather
    # v[dof] * sign serializes on the TPU scalar core under vmap.
    return v @ jnp.asarray(blk.scat, v.dtype)
  if isinstance(blk, ContactBlock):
    rv = jnp.einsum('jkv,v->jk', blk.r, v, precision=_HI)  # (1+ndim, k)
    jnv, jfv = rv[0], blk.mu * rv[1:]
    rows = jnp.stack([jnv[None] + jfv, jnv[None] - jfv], 1)  # (ndim, 2, k)
    return rows.reshape(-1)
  return blk.J @ v


def _blk_rmatvec(blk, f, nv):
  """J_blkᵀ @ f -> (nv,)."""
  if isinstance(blk, StaticBlock):
    return f @ jnp.asarray(blk.J, f.dtype)
  if isinstance(blk, DiagBlock):
    return jnp.asarray(blk.scat, f.dtype) @ f
  if isinstance(blk, ContactBlock):
    ndim, k = blk.mu.shape
    fr = f.reshape(ndim, 2, k)
    fn = fr.sum((0, 1))                                    # (k,) on jn
    fd = blk.mu * (fr[:, 0] - fr[:, 1])                    # (ndim, k)
    coef = jnp.concatenate([fn[None], fd])                 # (1+ndim, k)
    return jnp.einsum('jkv,jk->v', blk.r, coef, precision=_HI)
  return blk.J.T @ f


def _blk_hess(blk, w, nv, dtype):
  """J_blkᵀ diag(w) J_blk -> (nv, nv)."""
  if isinstance(blk, StaticBlock):
    # One constant-operand contraction: w (n,) @ jj (n, nv²) on the MXU.
    return (w @ jnp.asarray(blk.jj, dtype)).reshape(nv, nv)
  if isinstance(blk, DiagBlock):
    diag = jnp.asarray(np.abs(blk.scat), dtype) @ w   # sign² = 1
    return jnp.diag(diag)
  if isinstance(blk, ContactBlock):
    ndim, k = blk.mu.shape
    wr = w.reshape(ndim, 2, k)
    s = wr[:, 0] + wr[:, 1]                                # (ndim, k)
    c = blk.mu * (wr[:, 0] - wr[:, 1])                     # (ndim, k)
    q = blk.mu * blk.mu * s
    jn, jf = blk.r[0:1], blk.r[1:]
    p0 = s.sum(0)[None, :, None] * jn + jnp.sum(
        c[:, :, None] * jf, axis=0, keepdims=True)         # (1, k, nv)
    pj = c[:, :, None] * jn + q[:, :, None] * jf           # (ndim, k, nv)
    p = jnp.concatenate([p0, pj])                          # (1+ndim, k, nv)
    return jnp.einsum('jkv,jkw->vw', blk.r, p, precision=_HI)
  return (blk.J.T * w) @ blk.J


def _blk_force_weight(blk, x):
  """Per-row constraint force -s'(x) and Hessian weight s''(x);
  the row type is static per block (kind selects only in StaticBlock,
  through a compile-time mask)."""
  f_quad = -blk.big_d * x
  if isinstance(blk, StaticBlock):
    m_fl = jnp.asarray(blk.m_fl)
    uni_act = (x < 0) & ~m_fl
    in_cone = (jnp.abs(f_quad) < blk.fl) & m_fl
    f = jnp.where(m_fl, jnp.clip(f_quad, -blk.fl, blk.fl),
                  jnp.where(uni_act, f_quad, 0.0))
    w = jnp.where(in_cone | uni_act, blk.big_d, 0.0)
    return f, w
  if blk.kind == _BILATERAL:
    return f_quad, blk.big_d
  if blk.kind == _FRICTIONLOSS:
    f = jnp.clip(f_quad, -blk.fl, blk.fl)
    w = jnp.where(jnp.abs(f_quad) < blk.fl, blk.big_d, 0.0)
    return f, w
  active = x < 0
  return jnp.where(active, f_quad, 0.0), jnp.where(active, blk.big_d, 0.0)


def _blk_cost(blk, x):
  """Per-block convex penalty s(x), summed over the last axis."""
  quad = 0.5 * blk.big_d * x * x
  if isinstance(blk, StaticBlock):
    m_fl = jnp.asarray(blk.m_fl)
    lin = blk.fl * jnp.abs(x) - 0.5 * blk.fl * blk.fl / jnp.maximum(
        blk.big_d, 1e-12)
    c_fl = jnp.where(jnp.abs(blk.big_d * x) < blk.fl, quad, lin)
    c_uni = jnp.where(x < 0, quad, 0.0)
    return jnp.sum(jnp.where(m_fl, c_fl, c_uni), axis=-1)
  if blk.kind == _BILATERAL:
    return jnp.sum(quad, axis=-1)
  if blk.kind == _FRICTIONLOSS:
    lin = blk.fl * jnp.abs(x) - 0.5 * blk.fl * blk.fl / jnp.maximum(
        blk.big_d, 1e-12)
    return jnp.sum(jnp.where(jnp.abs(blk.big_d * x) < blk.fl, quad, lin),
                   axis=-1)
  return jnp.sum(jnp.where(x < 0, quad, 0.0), axis=-1)


def solve(model: Model, data: Data, qfrc_smooth: jax.Array,
          contact_groups=None) -> Data:
  """Projected Newton over block-structured rows.

  TPU notes: the rows stay as typed blocks end-to-end — limits and
  frictionloss contribute static-index selections and diagonal updates
  instead of dense (n, nv) matmuls, equalities and contacts keep dense
  jacobians sized to their own row counts, and nothing is ever
  concatenated into one (nrow, nv) matrix (the concat alone cost ~10% of
  the round-2 substep)."""
  from dexterity_tpu.physics import linalg_pallas

  # implicit_damping: solve against M' = M + h*diag(damping) so qacc is
  # already implicitly damped (see Option.implicit_damping).
  if model.opt.implicit_damping:
    m = data.qM + model.opt.timestep * jnp.diag(
        model.dof_damping.astype(data.qpos.dtype))
  else:
    m = data.qM

  def smooth_only():
    qacc = linalg_pallas.cholesky_solve(m, qfrc_smooth)
    return data.replace(qfrc_constraint=jnp.zeros_like(qfrc_smooth),
                        qacc_smooth=qacc, qacc=qacc)

  if model.opt.disable_constraint:
    return smooth_only()
  blocks = assemble_blocks(model, data, contact_groups=contact_groups)
  if not blocks:
    return smooth_only()

  dtype = data.qpos.dtype
  nv = model.nv

  def matvecs(v):
    return tuple(_blk_matvec(b, v) for b in blocks)

  def row_cost(xs):
    return sum(_blk_cost(b, x) for b, x in zip(blocks, xs))

  # The Newton carry holds (a, xs = J a - aref per block, ma = M a): each
  # iteration costs the block matvecs of delta, one M delta, and the
  # transpose matvecs of the forces; the line search is a closed-form
  # quadratic in alpha plus the row penalty on rank-1-updated residuals.
  alphas = 2.0 ** -jnp.arange(model.opt.ls_iterations, dtype=dtype)
  refac_every = model.opt.solver_refactor_every

  def newton_iter(carry, fac):
    """One (modified-)Newton iteration.  fac=None: factor the exact
    Hessian this iteration; otherwise re-solve against the stale factor
    (substitution only — the line search keeps descent monotone)."""
    a, xs, ma = carry
    fws = [_blk_force_weight(b, x) for b, x in zip(blocks, xs)]
    grad = (ma - qfrc_smooth
            - sum(_blk_rmatvec(b, f, nv) for b, (f, _) in zip(blocks, fws)))
    if refac_every > 1:
      if fac is None:
        hess = m + sum(_blk_hess(b, w, nv, dtype)
                       for b, (_, w) in zip(blocks, fws))
        # stop_gradient: the packed factor is a preconditioner — its
        # tangents vanish at the solver fixed point, and the const-JVP
        # solve/resolve let forward-mode AD (iLQR linearization) run
        # the stale-factor path at substitution cost.  One fused kernel
        # solves AND emits the packed factor (no factor HBM round-trip
        # between factorization and first substitution).
        sol, fac = linalg_pallas.cholesky_solve_factor(
            jax.lax.stop_gradient(hess + 1e-10 * jnp.eye(nv, dtype=dtype)),
            grad)
        delta = -sol
      else:
        delta = -linalg_pallas.cholesky_resolve_const(fac, grad)
    else:
      hess = m + sum(_blk_hess(b, w, nv, dtype)
                     for b, (_, w) in zip(blocks, fws))
      delta = -linalg_pallas.cholesky_solve(
          hess + 1e-10 * jnp.eye(nv, dtype=dtype), grad)
    jds = matvecs(delta)
    md = m @ delta
    # cost(a + al*delta) = quad0 + al*lin + al²*quad2 + row_cost(x + al*jd)
    quad0 = 0.5 * (a @ ma) - a @ qfrc_smooth
    lin = delta @ ma - delta @ qfrc_smooth
    quad2 = 0.5 * (delta @ md)
    c0 = quad0 + row_cost(xs)
    costs = (quad0 + alphas * lin + alphas * alphas * quad2
             + row_cost(tuple(x[None, :] + alphas[:, None] * jd[None, :]
                              for x, jd in zip(xs, jds))))
    # Gather-free argmin: alphas[argmin(costs)] as a one-hot dot (the
    # per-env dynamic gather serialized on the TPU scalar core under vmap —
    # ~3% of the solve).  argmin ties resolve to the first (largest) alpha,
    # matching jnp.argmin's first-occurrence convention.
    cmin = jnp.min(costs)
    is_min = costs == cmin
    first = is_min & (jnp.cumsum(is_min) == 1)
    step = jnp.where(cmin < c0,
                     jnp.sum(jnp.where(first, alphas, 0.0)), 0.0)
    new_xs = tuple(x + step * jd for x, jd in zip(xs, jds))
    return (a + step * delta, new_xs, ma + step * md), fac

  def newton_step(carry, _):
    out, _ = newton_iter(carry, None)
    return out, ()

  # Warm start from the previous step's qacc (MuJoCo warmstart semantics);
  # zero is the safe alternative at episode starts.
  warm = data.qacc
  xs_warm = tuple(mv - b.aref for mv, b in zip(matvecs(warm), blocks))
  ma_warm = m @ warm
  xs_zero = tuple(-b.aref for b in blocks)
  c_warm = 0.5 * (warm @ ma_warm) - warm @ qfrc_smooth + row_cost(xs_warm)
  c_zero = row_cost(xs_zero)
  use_warm = c_warm < c_zero
  carry0 = (jnp.where(use_warm, warm, 0.0),
            tuple(jnp.where(use_warm, xw, xz)
                  for xw, xz in zip(xs_warm, xs_zero)),
            jnp.where(use_warm, ma_warm, 0.0))
  if refac_every > 1:
    # Modified Newton: unrolled so refactor-vs-resolve alternates
    # statically; intermediate iterations reuse the stale packed factor.
    carry, fac = carry0, None
    for it in range(model.opt.solver_iterations):
      if it % refac_every == 0:
        fac = None
      carry, fac = newton_iter(carry, fac)
    a, xs, _ = carry
  else:
    (a, xs, _), _ = jax.lax.scan(newton_step, carry0, (),
                                 length=model.opt.solver_iterations)

  fs = [_blk_force_weight(b, x)[0] for b, x in zip(blocks, xs)]
  qfrc_constraint = sum(_blk_rmatvec(b, f, nv) for b, f in zip(blocks, fs))
  # Joint-transmitted share (limits/frictionloss/JOINT/TENDON equalities):
  # what a joint torque sensor sees; contacts and CONNECT/WELD wrenches are
  # external (MuJoCo cfrc_ext).  DiagBlocks are always transmitted; dense
  # blocks carry a static per-row mask (skipped entirely when all-False).
  axis_terms = []
  for b, f in zip(blocks, fs):
    if isinstance(b, (DiagBlock, StaticBlock)):
      axis_terms.append(_blk_rmatvec(b, f, nv))  # always joint-transmitted
    elif isinstance(b, ContactBlock):
      pass                        # contacts are external (cfrc_ext side)
    elif b.trans.any():
      axis_terms.append(_blk_rmatvec(b, f * jnp.asarray(b.trans, dtype), nv))
  qfrc_constraint_axis = (sum(axis_terms) if axis_terms
                          else jnp.zeros(nv, dtype))
  return data.replace(qacc=a, qfrc_constraint=qfrc_constraint,
                      qfrc_constraint_axis=qfrc_constraint_axis)
