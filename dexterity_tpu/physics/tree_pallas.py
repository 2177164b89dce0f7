"""Pallas TPU tree-sweep kernel — a MEASURED NEGATIVE RESULT, kept as an
experiment with its equality test; the production hot path stays on XLA.

Hypothesis: the XLA form of the per-substep tree sweep (FK + frames +
CRB + RNE) compiles to hundreds of tiny fusions over (30-236, B) planes
and is dispatch-bound at planner batch sizes (4x batch costs only +36%);
one Pallas kernel with static gathers/scatters as constant one-hot MXU
matmuls should remove the per-fusion overhead.

Measured on v5e at B=256 (reorient, tools/ + this module's harness):
  FK stage as this Pallas kernel : 0.229 ms
  FK stage as plain XLA          : 0.131 ms
  production _precompute_planes  : 0.170 ms  (FK+CRB+RNE together)
The kernel LOSES: Mosaic's f32 matmul path (6-pass bf16 emulation at the
HIGHEST precision these one-hot gathers need for exactness) plus layout
constraints (lane-concats of misaligned sublane slices are unsupported;
kron-blocked alternatives waste MXU flops; the (nv^2, B) CRB intermediates
blow the 16 MB VMEM scoped stack) cost more than XLA's fusion overhead
saved.  Conclusions for future kernels here: Pallas wins on this machine
only when the inner math avoids f32 MXU emulation (elementwise/VPU bodies
like linalg_pallas's Cholesky) or tolerates bf16 operands.

The module stays because (a) the recorded-constant _pallas_wrap pattern
and the (rows, B) batch-minor kernel formulation are reusable, (b) the
XLA `_reference_sweep` form is pinned equal to the production plane
pipeline by tests/test_tree_pallas.py, documenting the sweep's math in
one place.

Covers HINGE/SLIDE/FREE joints, mocap bodies, single-jointed bodies,
fixed tendons (`supports(model)`).

Reference semantics: mj_kinematics/mj_comPos/mj_crb/mj_rne
(SURVEY.md §2.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu.core.types import JointType, Model
from dexterity_tpu.physics import kinematics as K
from dexterity_tpu.physics import smooth as S
from dexterity_tpu.physics import tree

_LANES = 128


def supports(model: Model) -> bool:
  """Static capability check for the fused tree sweep."""
  types = set(int(t) for t in model.jnt_type)
  ok_types = {int(JointType.HINGE), int(JointType.SLIDE),
              int(JointType.FREE)}
  if not types <= ok_types:
    return False
  if any(model.body_jntnum[b] > 1 for b in range(model.nbody)):
    return False
  return True


def _onehot(rows: np.ndarray, n_cols: int) -> np.ndarray:
  out = np.zeros((len(rows), n_cols), np.float32)
  out[np.arange(len(rows)), np.asarray(rows, np.int64)] = 1.0
  return out


class _ConstStore:
  """Registry for the kernel's static tables.

  Pallas kernels may not capture non-scalar constants, so every model
  table the kernel needs is registered here during a recording trace
  (jax.eval_shape) and then fed to pallas_call as extra VMEM inputs; the
  in-kernel replay returns the corresponding input-ref values in the same
  deterministic order (deduplicated by content)."""

  def __init__(self):
    self.keys = {}
    self.arrays = []
    self.playback = None

  def arr(self, a) -> jax.Array:
    a = np.asarray(a, np.float32)
    if a.ndim == 1:
      a = a[:, None]
    assert a.ndim == 2, a.shape
    key = (a.shape, a.tobytes())
    if key not in self.keys:
      assert self.playback is None, 'new constant during playback'
      self.keys[key] = len(self.arrays)
      self.arrays.append(a)
    i = self.keys[key]
    if self.playback is not None:
      return self.playback[i]
    return jnp.asarray(a)


import os as _os

_DOT_PRECISION = jax.lax.Precision(
    _os.environ.get('DEXTERITY_TPU_TREE_DOT_PRECISION', 'highest'))


def _dot(a: jax.Array, x: jax.Array) -> jax.Array:
  """(m, n) @ (n, B) on the MXU.  HIGHEST: these dots implement one-hot
  gathers/scatters and mask reductions whose results feed the CRB inertia
  — Mosaic's default f32 emulation rounded qm by ~1e-2 absolute, enough
  to threaten positive-definiteness downstream."""
  return jax.lax.dot_general(
      a, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
      precision=_DOT_PRECISION)


def _dot_multi(C: '_ConstStore', a_np, planes, mode='lane'):
  """One matmul applying the same (m, n) operator to k (n, B) planes —
  k small dots become one wide dot (fewer MXU issues, fuller lanes).

  mode='lane': planes concatenate along the batch/lane axis.  Requires
  sublane-aligned operands (full arrays, or lane slices at vreg-multiple
  offsets) — Mosaic rejects lane concats of misaligned sublane slices.
  mode='kron': planes stack along sublanes and the operator becomes the
  block-diagonal kron(I_k, a); zero blocks waste MXU flops but accept any
  operand alignment (used for the packed body10 input)."""
  a_np = np.asarray(a_np, np.float32)
  k = len(planes)
  if k == 1:
    return (_dot(C.arr(a_np), planes[0]),)
  if mode == 'lane':
    b = planes[0].shape[1]
    y = _dot(C.arr(a_np), jnp.concatenate(list(planes), axis=1))
    return tuple(y[:, i * b:(i + 1) * b] for i in range(k))
  x = jnp.concatenate(list(planes), axis=0)     # (k*n, B) sublane concat
  big = C.arr(np.kron(np.eye(k, dtype=np.float32), a_np))
  m = a_np.shape[0]
  y = _dot(big, x)                              # (k*m, B)
  return tuple(y[i * m:(i + 1) * m] for i in range(k))


def _quat_mul(q, r):
  """(4, ...) plane quaternion product."""
  qw, qx, qy, qz = q
  rw, rx, ry, rz = r
  return (qw * rw - qx * rx - qy * ry - qz * rz,
          qw * rx + qx * rw + qy * rz - qz * ry,
          qw * ry - qx * rz + qy * rw + qz * rx,
          qw * rz + qx * ry - qy * rx + qz * rw)


def _quat_rotate(q, v):
  """Rotate plane vectors v (3-tuple) by plane quats q (4-tuple)."""
  qw, qx, qy, qz = q
  vx, vy, vz = v
  # t = 2 q_vec x v
  tx = 2.0 * (qy * vz - qz * vy)
  ty = 2.0 * (qz * vx - qx * vz)
  tz = 2.0 * (qx * vy - qy * vx)
  return (vx + qw * tx + (qy * tz - qz * ty),
          vy + qw * ty + (qz * tx - qx * tz),
          vz + qw * tz + (qx * ty - qy * tx))


def _quat_to_mat(q):
  """Row-major 9-tuple of rotation-matrix planes from quat planes."""
  w, x, y, z = q
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  return (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
          2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
          2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy))


def _cross(u, v):
  return (u[1] * v[2] - u[2] * v[1],
          u[2] * v[0] - u[0] * v[2],
          u[0] * v[1] - u[1] * v[0])


def _rows(a, k):
  """Split a (k*n, B) array into a k-tuple of (n, B) planes."""
  n = a.shape[0] // k
  return tuple(a[i * n:(i + 1) * n] for i in range(k))


def _tables(model: Model):
  """Static structure tables for the kernel (host-side numpy)."""
  t = {}
  nbody, nv, nq = model.nbody, model.nv, model.nq
  host = lambda a: np.asarray(jax.device_get(a), np.float64)

  cls = {}
  for jt in (JointType.HINGE, JointType.SLIDE, JointType.FREE):
    jids = [ji for ji in range(model.njnt) if model.jnt_type[ji] == int(jt)]
    cls[jt] = dict(
        jids=np.asarray(jids, np.int32),
        body=np.asarray([model.jnt_bodyid[j] for j in jids], np.int32),
        qadr=np.asarray([model.jnt_qposadr[j] for j in jids], np.int32),
        dadr=np.asarray([model.jnt_dofadr[j] for j in jids], np.int32))
  t['cls'] = cls
  mocap_body = np.asarray(
      [b for b in range(nbody) if model.body_mocapid[b] >= 0], np.int32)
  t['mocap_body'] = mocap_body
  t['mocap_id'] = np.asarray(
      [model.body_mocapid[b] for b in mocap_body], np.int32)

  t['body_pos'] = host(model.body_pos)          # (nbody, 3)
  t['body_quat'] = host(model.body_quat)
  t['body_ipos'] = host(model.body_ipos)
  t['body_iquat'] = host(model.body_iquat)
  t['body_mass'] = host(model.body_mass)
  t['body_inertia'] = host(model.body_inertia)
  t['jnt_axis'] = host(model.jnt_axis)
  t['jnt_pos'] = host(model.jnt_pos)
  t['geom_bodyid'] = np.asarray(model.geom_bodyid, np.int32)
  t['geom_pos'] = host(model.geom_pos)
  t['geom_quat'] = host(model.geom_quat)
  t['dof_armature'] = host(model.dof_armature)
  t['jump'] = [np.asarray(tab, np.int32)
               for tab in tree.jump_tables(model.body_parentid)]
  t['anc_mask'] = K.ancestor_mask(model)        # (nbody, nv)
  t['subtree'] = S._subtree_mask_np(model)      # (nbody, nbody)
  t['dof_upper'] = S._dof_upper_mask_np(model)  # (nv, nv)
  t['dof_bodyid'] = np.asarray(model.dof_bodyid, np.int32)
  t['gravity'] = host(model.opt.gravity)
  if model.ntendon:
    t['tendon_moment'] = host(model.tendon_moment)
    t['dof_qposadr'] = K._dof_qposadr(model)
  trans_free = np.zeros(nv, bool)
  for ji in range(model.njnt):
    if model.jnt_type[ji] == int(JointType.FREE):
      d = model.jnt_dofadr[ji]
      trans_free[d:d + 3] = True
  t['trans_free'] = trans_free
  return t


def _kernel_body(model: Model, t, C: '_ConstStore', qpos, qvel,
                 mocap_pos, mocap_quat):
  """The fused sweep on (rows, B) arrays.  Pure jnp; every static table
  goes through C.arr so the same body runs as a recorded XLA trace (the
  reference/fallback) and inside the Pallas kernel (playback)."""
  nbody, nv, nq = model.nbody, model.nv, model.nq
  f32 = jnp.float32
  B = qpos.shape[1]
  cls = t['cls']

  def const_planes(tab, idx=None):
    a = np.asarray(tab, np.float64)
    if idx is not None:
      a = a[idx]
    return tuple(C.arr(a[:, c]) for c in range(a.shape[1]))

  zeros_b = jnp.zeros((nbody, B), f32)
  ones_b = jnp.ones((nbody, B), f32)

  # --- local joint pose increments, scattered to bodies -------------------
  dq = (ones_b, zeros_b, zeros_b, zeros_b)
  dpos = (zeros_b, zeros_b, zeros_b)

  th = cls[JointType.HINGE]
  if len(th['jids']):
    q = _dot(C.arr(_onehot(th['qadr'], nq)), qpos)       # (nh, B)
    axis = const_planes(t['jnt_axis'], th['jids'])
    jpos = const_planes(t['jnt_pos'], th['jids'])
    half = 0.5 * q
    s = jnp.sin(half)
    dq_h = (jnp.cos(half), axis[0] * s, axis[1] * s, axis[2] * s)
    rj = _quat_rotate(dq_h, jpos)
    pos_h = (jpos[0] - rj[0], jpos[1] - rj[1], jpos[2] - rj[2])
    sc_np = _onehot(th['body'], nbody).T                 # (nbody, nh)
    nojoint = C.arr(1.0 - sc_np.sum(axis=1, keepdims=True))
    sq = _dot_multi(C, sc_np, dq_h + pos_h)
    dq = (nojoint + sq[0], sq[1], sq[2], sq[3])
    dpos = sq[4:7]

  ts = cls[JointType.SLIDE]
  if len(ts['jids']):
    q = _dot(C.arr(_onehot(ts['qadr'], nq)), qpos)
    axis = const_planes(t['jnt_axis'], ts['jids'])
    sc = C.arr(_onehot(ts['body'], nbody).T)
    dpos = tuple(d + _dot(sc, axis[c] * q) for c, d in enumerate(dpos))

  # Local pose: lpos = body_pos + R(body_quat) dpos ; lquat = body_quat*dq.
  bq = const_planes(t['body_quat'])
  bp = const_planes(t['body_pos'])
  rp = _quat_rotate(bq, dpos)
  lpos = [bp[c] + rp[c] for c in range(3)]
  lquat = list(_quat_mul(bq, dq))

  def set_rows(planes, body_rows, vals):
    """Overwrite rows `body_rows` (static) of each (nbody, B) plane."""
    oh = _onehot(body_rows, nbody)
    keep = C.arr(1.0 - oh.sum(axis=0, keepdims=True).T)   # (nbody, 1)
    sc = C.arr(oh.T)
    return [p * keep + _dot(sc, v) for p, v in zip(planes, vals)]

  tf = cls[JointType.FREE]
  if len(tf['jids']):
    pos_rows = tuple(_dot(C.arr(_onehot(tf['qadr'] + c, nq)), qpos)
                     for c in range(3))
    quat_raw = tuple(_dot(C.arr(_onehot(tf['qadr'] + 3 + c, nq)), qpos)
                     for c in range(4))
    norm = jnp.sqrt(jnp.maximum(sum(c * c for c in quat_raw), 1e-24))
    quat_rows = tuple(c / norm for c in quat_raw)
    lpos = set_rows(lpos, tf['body'], pos_rows)
    lquat = set_rows(lquat, tf['body'], quat_rows)

  if len(t['mocap_body']):
    mp = _rows(mocap_pos, 3)     # (nmocap, B) each
    mq = _rows(mocap_quat, 4)
    mid = t['mocap_id']
    msel = C.arr(_onehot(mid, len(mid)))   # reorder mocap rows
    lpos = set_rows(lpos, t['mocap_body'], tuple(_dot(msel, p) for p in mp))
    lquat = set_rows(lquat, t['mocap_body'],
                     tuple(_dot(msel, q) for q in mq))

  # World row identity.
  w0 = np.zeros((nbody, 1), np.float32)
  w0[0] = 1.0
  keep0 = C.arr(1.0 - w0)
  lpos = [p * keep0 for p in lpos]
  lquat = [q * keep0 for q in lquat]
  lquat[0] = lquat[0] + C.arr(w0)

  # --- pointer jumping -----------------------------------------------------
  for tab in t['jump']:
    anc = _dot_multi(C, _onehot(tab, nbody), tuple(lquat) + tuple(lpos))
    qa, pa = anc[:4], anc[4:7]
    rp = _quat_rotate(qa, tuple(lpos))
    lpos = [pa[c] + rp[c] for c in range(3)]
    lquat = list(_quat_mul(qa, tuple(lquat)))

  xpos = tuple(lpos)
  xquat = tuple(lquat)

  # --- cdof ---------------------------------------------------------------
  ang = [jnp.zeros((nv, B), f32) for _ in range(3)]
  lin = [jnp.zeros((nv, B), f32) for _ in range(3)]

  def dof_scatter(planes, dadr, vals):
    sc = C.arr(_onehot(dadr, nv).T)                       # (nv, k)
    return [p + _dot(sc, v) for p, v in zip(planes, vals)]

  if len(th['jids']):
    qp7 = _dot_multi(C, _onehot(th['body'], nbody), xquat + xpos)
    qb, pb = qp7[:4], qp7[4:7]
    axis_w = _quat_rotate(qb, const_planes(t['jnt_axis'], th['jids']))
    rj = _quat_rotate(qb, const_planes(t['jnt_pos'], th['jids']))
    anchor = tuple(pb[c] + rj[c] for c in range(3))
    lin_w = _cross(axis_w, tuple(-a for a in anchor))
    sv = _dot_multi(C, _onehot(th['dadr'], nv).T, axis_w + lin_w)
    ang = [p + v for p, v in zip(ang, sv[:3])]
    lin = [p + v for p, v in zip(lin, sv[3:])]

  if len(ts['jids']):
    bsel = C.arr(_onehot(ts['body'], nbody))
    qb = tuple(_dot(bsel, q) for q in xquat)
    axis_w = _quat_rotate(qb, const_planes(t['jnt_axis'], ts['jids']))
    lin = dof_scatter(lin, ts['dadr'], axis_w)

  if len(tf['jids']):
    bsel = C.arr(_onehot(tf['body'], nbody))
    qb = tuple(_dot(bsel, q) for q in xquat)
    pb = tuple(_dot(bsel, p) for p in xpos)
    mat = _quat_to_mat(qb)
    onesf = jnp.ones_like(qb[0])
    for a in range(3):
      lin = dof_scatter(lin, tf['dadr'] + a,
                        tuple(onesf if c == a else 0.0 * onesf
                              for c in range(3)))
    for a in range(3):
      axis_w = (mat[a], mat[3 + a], mat[6 + a])
      lin_w = _cross(axis_w, tuple(-p for p in pb))
      ang = dof_scatter(ang, tf['dadr'] + 3 + a, axis_w)
      lin = dof_scatter(lin, tf['dadr'] + 3 + a, lin_w)

  cdof6 = tuple(ang) + tuple(lin)                         # 6 x (nv, B)

  # --- frames (geoms + inertial) ------------------------------------------
  def frames(bodyid, pos_c, quat_c, identity_sel=False):
    if identity_sel:
      qb, pb = xquat, xpos
    else:
      qp7 = _dot_multi(C, _onehot(bodyid, nbody), xquat + xpos)
      qb, pb = qp7[:4], qp7[4:7]
    pc = const_planes(pos_c)
    qc = const_planes(quat_c)
    rp = _quat_rotate(qb, pc)
    pos = tuple(pb[c] + rp[c] for c in range(3))
    mat = _quat_to_mat(_quat_mul(qb, qc))
    return pos, mat

  gpos, gmat = frames(t['geom_bodyid'], t['geom_pos'], t['geom_quat'])
  ipos, imat = frames(None, t['body_ipos'], t['body_iquat'],
                      identity_sel=True)

  # --- spatial inertias about the origin (body10) --------------------------
  i123 = [C.arr(t['body_inertia'][:, c]) for c in range(3)]
  m = C.arr(t['body_mass'])

  def iw(a, b):
    return (i123[0] * imat[3 * a + 0] * imat[3 * b + 0]
            + i123[1] * imat[3 * a + 1] * imat[3 * b + 1]
            + i123[2] * imat[3 * a + 2] * imat[3 * b + 2])

  cx, cy, cz = ipos
  cc = cx * cx + cy * cy + cz * cz
  body10 = (m * jnp.ones_like(cx), m * cx, m * cy, m * cz,
            iw(0, 0) + m * (cc - cx * cx), iw(0, 1) - m * cx * cy,
            iw(0, 2) - m * cx * cz, iw(1, 1) + m * (cc - cy * cy),
            iw(1, 2) - m * cy * cz, iw(2, 2) + m * (cc - cz * cz))

  def inertia_apply(p10, m6):
    mm, hx, hy, hz = p10[0], p10[1], p10[2], p10[3]
    ixx, ixy, ixz, iyy, iyz, izz = p10[4:]
    wx, wy, wz, vx, vy, vz = m6
    return (ixx * wx + ixy * wy + ixz * wz + (hy * vz - hz * vy),
            ixy * wx + iyy * wy + iyz * wz + (hz * vx - hx * vz),
            ixz * wx + iyz * wy + izz * wz + (hx * vy - hy * vx),
            mm * vx + (wy * hz - wz * hy),
            mm * vy + (wz * hx - wx * hz),
            mm * vz + (wx * hy - wy * hx))

  fk_out = dict(
      xpos=jnp.concatenate(xpos), xquat=jnp.concatenate(xquat),
      cdof=jnp.concatenate(cdof6),
      gpos=jnp.concatenate(gpos), gmat=jnp.concatenate(gmat),
      xipos=jnp.concatenate(ipos),
      body10=jnp.concatenate(body10))

  # --- tendons (cheap; stay in the FK kernel) -------------------------------
  if model.ntendon:
    tm = np.asarray(t['tendon_moment'])
    qsel = np.zeros((model.ntendon, nq))
    dq_adr = t['dof_qposadr']
    for ti in range(model.ntendon):
      for v in range(nv):
        qsel[ti, dq_adr[v]] += tm[ti, v]
    fk_out['ten_length'] = _dot(C.arr(qsel), qpos)
    fk_out['ten_velocity'] = _dot(C.arr(tm), qvel)
  else:
    fk_out['ten_length'] = jnp.zeros((0, B), f32)
    fk_out['ten_velocity'] = jnp.zeros((0, B), f32)
  return fk_out


def _kernel_dyn(model: Model, t, C: '_ConstStore', cdof, body10, qvel):
  """CRB inertia + RNE bias from FK products (second kernel: keeps the
  (nv*nv, B) intermediates out of the FK kernel's VMEM working set)."""
  nbody, nv = model.nbody, model.nv
  f32 = jnp.float32
  B = qvel.shape[1]
  cdof6 = _rows(cdof, 6)
  body10 = _rows(body10, 10)

  def inertia_apply(p10, m6):
    mm, hx, hy, hz = p10[0], p10[1], p10[2], p10[3]
    ixx, ixy, ixz, iyy, iyz, izz = p10[4:]
    wx, wy, wz, vx, vy, vz = m6
    return (ixx * wx + ixy * wy + ixz * wz + (hy * vz - hz * vy),
            ixy * wx + iyy * wy + iyz * wz + (hz * vx - hx * vz),
            ixz * wx + iyz * wy + izz * wz + (hx * vy - hy * vx),
            mm * vx + (wy * hz - wz * hy),
            mm * vy + (wz * hx - wx * hz),
            mm * vz + (wx * hy - wy * hx))

  # --- CRB -----------------------------------------------------------------
  comp = _dot_multi(C, t['subtree'], body10, mode='kron')  # (nbody, B) x10
  dsel_np = _onehot(t['dof_bodyid'], nbody)
  comp_d = _dot_multi(C, dsel_np, comp, mode='kron')      # (nv, B) x10
  f6 = inertia_apply(comp_d, cdof6)                       # (nv, B) x6
  # qm[v, w] = sum_c cdof[c, v] f6[c, w] on the upper CRB pattern; the
  # lower triangle is the transpose, built by swapping the operand roles.
  # The (nv^2, B) outer products are pure data movement (repeat rows /
  # tile blocks), not matmuls — 24 HIGHEST-precision (nv^2, nv) dots here
  # measured slower than the whole rest of the sweep.
  B_ = qvel.shape[1]

  def rep_v(a):          # row v repeated nv consecutive times
    return jnp.broadcast_to(a[:, None, :], (nv, nv, B_)).reshape(
        nv * nv, B_)

  def rep_w(a):          # whole (nv, B) block tiled nv times
    return jnp.broadcast_to(a[None, :, :], (nv, nv, B_)).reshape(
        nv * nv, B_)

  g = 0.0
  gt = 0.0
  for c in range(6):
    g = g + rep_v(cdof6[c]) * rep_w(f6[c])                # (nv*nv, B)
    gt = gt + rep_v(f6[c]) * rep_w(cdof6[c])
  up_np = t['dof_upper'].reshape(-1, 1)
  low_np = (t['dof_upper'].T * (1.0 - np.eye(nv))).reshape(-1, 1)
  qm = (g * C.arr(up_np) + gt * C.arr(low_np)
        + C.arr(np.diag(t['dof_armature']).reshape(-1, 1)))

  # --- RNE ------------------------------------------------------------------
  w6 = tuple(c * qvel for c in cdof6)                      # (nv, B)
  cvel6 = _dot_multi(C, t['anc_mask'], w6, mode='kron')    # (nbody, B)
  ref6 = _dot_multi(C, dsel_np, cvel6, mode='kron')        # (nv, B)
  tfree = C.arr(1.0 - t['trans_free'].astype(np.float32))
  ref6 = tuple(r * tfree for r in ref6)

  def motion_cross(v6, m6):
    ax, ay, az, cx_, cy_, cz_ = v6
    bx, by, bz, dx, dy, dz = m6
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx,
            (ay * dz - az * dy) + (cy_ * bz - cz_ * by),
            (az * dx - ax * dz) + (cz_ * bx - cx_ * bz),
            (ax * dy - ay * dx) + (cx_ * by - cy_ * bx))

  def force_cross(v6, f6_):
    ax, ay, az, cx_, cy_, cz_ = v6
    tx, ty, tz, fx, fy, fz = f6_
    return ((ay * tz - az * ty) + (cy_ * fz - cz_ * fy),
            (az * tx - ax * tz) + (cz_ * fx - cx_ * fz),
            (ax * ty - ay * tx) + (cx_ * fy - cy_ * fx),
            ay * fz - az * fy, az * fx - ax * fz, ax * fy - ay * fx)

  tau6 = tuple(p * qvel for p in motion_cross(ref6, cdof6))
  grav = t['gravity']
  mtau = _dot_multi(C, t['anc_mask'], tau6, mode='kron')
  cacc6 = tuple(mt + (float(-grav[c - 3]) if c >= 3 else 0.0)
                for c, mt in enumerate(mtau))
  iv = inertia_apply(body10, cvel6)
  ia = inertia_apply(body10, cacc6)
  fb6 = tuple(a + b for a, b in zip(ia, force_cross(cvel6, iv)))
  btot = _dot_multi(C, t['anc_mask'].T, fb6, mode='kron')  # (nv, B)
  qfrc_bias = sum(cdof6[c] * btot[c] for c in range(6))
  return dict(qm=qm, qfrc_bias=qfrc_bias)


def _reference_sweep(model, qpos, qvel, mocap_pos, mocap_quat):
  """Both kernel bodies as one plain XLA program (testing/fallback)."""
  t = _tables(model)
  fk = _kernel_body(model, t, _ConstStore(), qpos, qvel,
                    mocap_pos, mocap_quat)
  dyn = _kernel_dyn(model, t, _ConstStore(), fk['cdof'], fk['body10'],
                    qvel)
  out = dict(fk)
  del out['body10']
  out.update(dyn)
  return out


def _fk_shapes(model: Model):
  nbody, nv, ngeom = model.nbody, model.nv, model.ngeom
  return dict(
      xpos=3 * nbody, xquat=4 * nbody, cdof=6 * nv,
      gpos=3 * ngeom, gmat=9 * ngeom, xipos=3 * nbody,
      body10=10 * nbody,
      ten_length=model.ntendon, ten_velocity=model.ntendon)


def _pallas_wrap(body_fn, n_data_in, out_shapes, B):
  """Builds a pallas_call around `body_fn(C, *data_inputs) -> dict`:
  records the constant tables with a shape-only trace, then feeds them as
  extra VMEM inputs (Pallas kernels may not capture non-scalar consts)."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  f32 = jnp.float32
  names = list(out_shapes)

  def record(store, *ins):
    return body_fn(store, *ins)

  store = _ConstStore()

  def build(call_shapes):
    jax.eval_shape(lambda *ins: record(store, *ins), *call_shapes)
    consts = [jnp.asarray(a) for a in store.arrays]

    def kernel(*refs):
      data_refs = refs[:n_data_in]
      const_refs = refs[n_data_in:n_data_in + len(consts)]
      out_refs = refs[n_data_in + len(consts):]
      store.playback = [r[...] for r in const_refs]
      try:
        out = body_fn(store, *[r[...] for r in data_refs])
      finally:
        store.playback = None
      for name, ref in zip(names, out_refs):
        ref[...] = out[name]

    call = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((out_shapes[n], B), f32) for n in names),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                  for _ in range(n_data_in + len(consts))],
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in names),
    )

    def fn(*ins):
      outs = call(*[x.astype(f32) for x in ins], *consts)
      return dict(zip(names, outs))

    return fn

  return build


def build_tree_sweep(model: Model, B: int):
  """Returns fn(qpos (nq,B), qvel (nv,B), mocap_pos (3*nmocap,B),
  mocap_quat (4*nmocap,B)) -> dict of batch-minor (rows, B) planes,
  computed by TWO Pallas kernels (FK+frames, then CRB+RNE — split to fit
  the (nv^2, B) CRB intermediates in VMEM).  B: multiple of 128."""
  assert B % _LANES == 0, B
  t = _tables(model)
  f32 = jnp.float32
  nmc = max(model.nmocap, 1)
  nv = model.nv

  fk_fn = _pallas_wrap(
      lambda C, qp, qv, mp, mq: _kernel_body(model, t, C, qp, qv, mp, mq),
      4, _fk_shapes(model), B)([
          jax.ShapeDtypeStruct((model.nq, B), f32),
          jax.ShapeDtypeStruct((model.nv, B), f32),
          jax.ShapeDtypeStruct((3 * nmc, B), f32),
          jax.ShapeDtypeStruct((4 * nmc, B), f32)])
  dyn_pallas = _os.environ.get('DEXTERITY_TPU_PALLAS_DYN', '0') == '1'
  if dyn_pallas:
    dyn_fn = _pallas_wrap(
        lambda C, cd, b10, qv: _kernel_dyn(model, t, C, cd, b10, qv),
        3, dict(qm=nv * nv, qfrc_bias=nv), B)([
            jax.ShapeDtypeStruct((6 * nv, B), f32),
            jax.ShapeDtypeStruct((10 * model.nbody, B), f32),
            jax.ShapeDtypeStruct((model.nv, B), f32)])
  else:
    # CRB/RNE stays an XLA program: its (nv^2, B) intermediates blow the
    # Mosaic VMEM stack, and XLA handles the few wide contractions well.
    def dyn_fn(cd, b10, qv):
      return _kernel_dyn(model, t, _ConstStore(), cd, b10, qv)

  def fn(qpos, qvel, mocap_pos, mocap_quat):
    fk = fk_fn(qpos, qvel, mocap_pos, mocap_quat)
    dyn = dyn_fn(fk['cdof'], fk['body10'], qvel)
    out = dict(fk)
    del out['body10']
    out.update(dyn)
    return out

  return fn
