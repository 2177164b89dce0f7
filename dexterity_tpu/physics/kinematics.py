"""Forward kinematics and velocity propagation.

Pure functions `(Model, Data) -> Data` with the kinematic-tree loops unrolled
at trace time (bodies number in the tens; XLA folds the unrolled graph).  All
spatial quantities use world-frame Plücker coordinates about the world origin:
motion vectors are [angular(3), linear-velocity-of-origin-coincident-point(3)]
and force vectors are [torque-about-origin(3), force(3)].

This module replaces the reference's per-call `mj_kinematics`/`mj_comPos`/
`mj_comVel`/`mj_objectVelocity` C entry points (reference call sites:
dexterity/inverse_kinematics/ik_solver.py:245-255,
dexterity/utils/mujoco_utils.py:10-35).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu.core.types import Data, JointType, Model
from dexterity_tpu.physics import math as tmath


def _joint_local_qpos(model: Model, ji: int, qpos: jax.Array):
  adr = model.jnt_qposadr[ji]
  jtype = JointType(model.jnt_type[ji])
  if jtype == JointType.FREE:
    return qpos[adr:adr + 3], qpos[adr + 3:adr + 7]
  if jtype == JointType.BALL:
    return None, qpos[adr:adr + 4]
  return qpos[adr], None


def fwd_position(model: Model, data: Data) -> Data:
  """Computes body/site/geom world poses, dof axes and tendon lengths.

  Uses the level-wise vectorized sweep when every body has at most one
  joint (true for all dexterity models); falls back to the general
  body-at-a-time recursion otherwise.
  """
  from dexterity_tpu.physics import tree
  tables = tree.tree_tables(model)
  if tables.single_jointed:
    return _fwd_position_jump(model, data, tables)
  return _fwd_position_unrolled(model, data)


def _joint_class_tables(model: Model):
  """Static per-class joint/body index tables for vectorized FK."""
  out = {}
  for jtype in (JointType.HINGE, JointType.SLIDE, JointType.BALL,
                JointType.FREE):
    jids = [ji for ji in range(model.njnt)
            if model.jnt_type[ji] == int(jtype)]
    out[jtype] = dict(
        jids=np.asarray(jids, np.int32),
        body=np.asarray([model.jnt_bodyid[j] for j in jids], np.int32),
        qadr=np.asarray([model.jnt_qposadr[j] for j in jids], np.int32),
        dadr=np.asarray([model.jnt_dofadr[j] for j in jids], np.int32))
  mocap_body = np.asarray(
      [b for b in range(model.nbody) if model.body_mocapid[b] >= 0],
      np.int32)
  mocap_id = np.asarray(
      [model.body_mocapid[b] for b in mocap_body], np.int32)
  out['mocap'] = (mocap_body, mocap_id)
  return out


def body_poses_planes(model: Model, qpos: jax.Array, mocap_pos, mocap_quat):
  """Plane-form FK: world body poses and dof axes, no AoS tensors.

  Returns (xpos_p, xquat_p, cdof6): stacked component-plane arrays of
  shape (3, nbody), (4, nbody) and (6, nv) (rows [ang, lin]).  Under vmap
  the minor axis is the body/dof count, so the whole tree sweep is
  full-width elementwise VPU work — none of the (B, nbody, 3, …) tiles
  whose 3-wide minor dims waste ~97% of each (8, 128) vector register
  (the dominant round-2 substep cost; see physics/math.py plane note).

  Same pointer-jumping composition as the AoS path (equality verified in
  tests/test_hot_step.py); replaces mj_kinematics for the hot substep.

  Batch-minor mode: when qpos is (nq, B) (and mocap_pos/mocap_quat carry
  the same trailing batch axes), every plane gains trailing batch dims —
  (3, nbody, B) etc.  With the batch in the XLA lane axis each vreg is
  fully packed, vs ~25% lane utilization for the vmap layout whose minor
  axis is the 30-40-wide body/dof count (the round-3 FK floor).
  """
  from dexterity_tpu.physics import tree
  dtype = qpos.dtype
  nbody = model.nbody
  bshape = qpos.shape[1:]
  bdims = (1,) * len(bshape)
  cls = _joint_class_tables(model)

  def consts(a, idx=None):
    a = a.astype(dtype) if hasattr(a, 'astype') else jnp.asarray(a, dtype)
    if idx is not None:
      a = a[idx]
    return tuple(a[..., c].reshape(a.shape[:-1] + bdims)
                 for c in range(a.shape[-1]))

  # Local pose planes per body (parent frame), broadcast to the batch so
  # the per-joint .at[body] updates (which carry batch dims) type-check.
  def _init(planes):
    return [jnp.broadcast_to(p, (nbody,) + bshape) for p in planes]

  lpos = _init(consts(model.body_pos))
  lquat = _init(consts(model.body_quat))

  def at_set(planes, b, vals):
    return [p.at[b].set(v) for p, v in zip(planes, vals)]

  def at_add(planes, b, vals):
    return [p.at[b].add(v) for p, v in zip(planes, vals)]

  def gather(planes, b):
    return tuple(p[b] for p in planes)

  t = cls[JointType.HINGE]
  if len(t['jids']):
    q = qpos[t['qadr']]
    axis = consts(model.jnt_axis, t['jids'])
    jpos = consts(model.jnt_pos, t['jids'])
    half = 0.5 * q
    s = jnp.sin(half)
    dq = (jnp.cos(half), axis[0] * s, axis[1] * s, axis[2] * s)
    rj = tmath.quat_rotate_p(dq, jpos)
    pos_l = (jpos[0] - rj[0], jpos[1] - rj[1], jpos[2] - rj[2])
    b = t['body']
    qb = gather(lquat, b)
    lpos = at_add(lpos, b, tmath.quat_rotate_p(qb, pos_l))
    lquat = at_set(lquat, b, tmath.quat_mul_p(qb, dq))

  t = cls[JointType.SLIDE]
  if len(t['jids']):
    q = qpos[t['qadr']]
    axis = consts(model.jnt_axis, t['jids'])
    b = t['body']
    qb = gather(lquat, b)
    lpos = at_add(lpos, b, tmath.quat_rotate_p(
        qb, (axis[0] * q, axis[1] * q, axis[2] * q)))

  t = cls[JointType.BALL]
  if len(t['jids']):
    qadr = t['qadr']
    dq = tmath.quat_normalize_p(tuple(qpos[qadr + i] for i in range(4)))
    jpos = consts(model.jnt_pos, t['jids'])
    rj = tmath.quat_rotate_p(dq, jpos)
    pos_l = (jpos[0] - rj[0], jpos[1] - rj[1], jpos[2] - rj[2])
    b = t['body']
    qb = gather(lquat, b)
    lpos = at_add(lpos, b, tmath.quat_rotate_p(qb, pos_l))
    lquat = at_set(lquat, b, tmath.quat_mul_p(qb, dq))

  t = cls[JointType.FREE]
  if len(t['jids']):
    qadr = t['qadr']
    b = t['body']
    lpos = at_set(lpos, b, tuple(qpos[qadr + i] for i in range(3)))
    lquat = at_set(lquat, b, tmath.quat_normalize_p(
        tuple(qpos[qadr + 3 + i] for i in range(4))))

  mocap_body, mocap_id = cls['mocap']
  if len(mocap_body):
    lpos = at_set(lpos, mocap_body,
                  tuple(mocap_pos[mocap_id, c].astype(dtype)
                        for c in range(3)))
    lquat = at_set(lquat, mocap_body,
                   tuple(mocap_quat[mocap_id, c].astype(dtype)
                         for c in range(4)))

  # World row stays identity.
  lpos = at_set(lpos, 0, (0.0, 0.0, 0.0))
  lquat = at_set(lquat, 0, (1.0, 0.0, 0.0, 0.0))

  # Pointer jumping.
  for table in tree.jump_tables(model.body_parentid):
    anc = np.asarray(table, np.int32)
    qa = gather(lquat, anc)
    rp = tmath.quat_rotate_p(qa, tuple(lpos))
    lpos = [lp[anc] + r for lp, r in zip(lpos, rp)]
    lquat = list(tmath.quat_mul_p(qa, tuple(lquat)))

  xpos_t, xquat_t = tuple(lpos), tuple(lquat)

  # cdof planes from final poses, per joint class.
  ang = [jnp.zeros((model.nv,) + bshape, dtype) for _ in range(3)]
  lin = [jnp.zeros((model.nv,) + bshape, dtype) for _ in range(3)]

  def neg(v):
    return (-v[0], -v[1], -v[2])

  t = cls[JointType.HINGE]
  if len(t['jids']):
    b = t['body']
    qb = gather(xquat_t, b)
    pb = gather(xpos_t, b)
    axis_w = tmath.quat_rotate_p(qb, consts(model.jnt_axis, t['jids']))
    rj = tmath.quat_rotate_p(qb, consts(model.jnt_pos, t['jids']))
    anchor = (pb[0] + rj[0], pb[1] + rj[1], pb[2] + rj[2])
    lin_w = tmath.cross_p(axis_w, neg(anchor))
    dadr = t['dadr']
    ang = [p.at[dadr].set(v) for p, v in zip(ang, axis_w)]
    lin = [p.at[dadr].set(v) for p, v in zip(lin, lin_w)]

  t = cls[JointType.SLIDE]
  if len(t['jids']):
    b = t['body']
    axis_w = tmath.quat_rotate_p(gather(xquat_t, b),
                                 consts(model.jnt_axis, t['jids']))
    dadr = t['dadr']
    lin = [p.at[dadr].set(v) for p, v in zip(lin, axis_w)]

  t = cls[JointType.BALL]
  if len(t['jids']):
    b = t['body']
    qb = gather(xquat_t, b)
    pb = gather(xpos_t, b)
    mat = tmath.quat_to_mat_p(qb)
    rj = tmath.quat_rotate_p(qb, consts(model.jnt_pos, t['jids']))
    anchor = (pb[0] + rj[0], pb[1] + rj[1], pb[2] + rj[2])
    for a in range(3):
      axis_w = (mat[a], mat[3 + a], mat[6 + a])   # column a of R
      lin_w = tmath.cross_p(axis_w, neg(anchor))
      dadr = t['dadr'] + a
      ang = [p.at[dadr].set(v) for p, v in zip(ang, axis_w)]
      lin = [p.at[dadr].set(v) for p, v in zip(lin, lin_w)]

  t = cls[JointType.FREE]
  if len(t['jids']):
    b = t['body']
    qb = gather(xquat_t, b)
    pb = gather(xpos_t, b)
    mat = tmath.quat_to_mat_p(qb)
    for a in range(3):
      lin[a] = lin[a].at[t['dadr'] + a].set(1.0)
    for a in range(3):
      axis_w = (mat[a], mat[3 + a], mat[6 + a])
      lin_w = tmath.cross_p(axis_w, neg(pb))
      dadr = t['dadr'] + 3 + a
      ang = [p.at[dadr].set(v) for p, v in zip(ang, axis_w)]
      lin = [p.at[dadr].set(v) for p, v in zip(lin, lin_w)]

  xpos_p = jnp.stack(xpos_t)                      # (3, nbody)
  xquat_p = jnp.stack(xquat_t)                    # (4, nbody)
  cdof6 = jnp.stack(ang + lin)                    # (6, nv) rows [ang, lin]
  return xpos_p, xquat_p, cdof6


def frame_planes(xpos_p, xquat_p, bodyid, pos_const, quat_const, dtype):
  """World frames of static child elements (geoms/sites/inertia boxes).

  Args:
    xpos_p/xquat_p: (3, nbody)/(4, nbody) body pose planes.
    bodyid: static (n,) parent body per element.
    pos_const/quat_const: (n, 3)/(n, 4) local offsets (model constants).

  Returns:
    (pos (3-tuple of (n,)), mat (row-major 9-tuple of (n,))).
  """
  b = np.asarray(bodyid, np.int32)
  bdims = (1,) * (xpos_p.ndim - 2)      # trailing batch dims (batch-minor)
  qb = tuple(xquat_p[i][b] for i in range(4))
  pb = tuple(xpos_p[i][b] for i in range(3))
  pc = tuple(pos_const[:, i].astype(dtype).reshape((-1,) + bdims)
             for i in range(3))
  qc = tuple(quat_const[:, i].astype(dtype).reshape((-1,) + bdims)
             for i in range(4))
  rp = tmath.quat_rotate_p(qb, pc)
  pos = tuple(pb[i] + rp[i] for i in range(3))
  mat = tmath.quat_to_mat_p(tmath.quat_mul_p(qb, qc))
  return pos, mat


def geom_planes(model: Model, xpos_p, xquat_p) -> jax.Array:
  """(12, ngeom) geom frame planes: rows 0-2 position, 3-11 row-major
  rotation — the narrow phase's native input layout."""
  dtype = xpos_p.dtype
  pos, mat = frame_planes(xpos_p, xquat_p, model.geom_bodyid,
                          model.geom_pos, model.geom_quat, dtype)
  return jnp.stack(pos + mat)


def _fwd_position_jump(model: Model, data: Data, tables) -> Data:
  """FK via vectorized local poses + pointer-jumping path composition.

  One elementwise pass builds every body's pose in its parent frame; then
  ceil(log2(depth)) gather+compose rounds produce world poses; cdof rows
  follow from the final poses in one vectorized pass per joint class
  (the hinge axis and anchor are invariant under the joint's own motion).
  """
  from dexterity_tpu.physics import tree
  qpos = data.qpos
  dtype = qpos.dtype
  nbody = model.nbody
  cls = _joint_class_tables(model)

  # Local pose per body (parent frame).
  lpos = model.body_pos.astype(dtype)
  lquat = model.body_quat.astype(dtype)

  t = cls[JointType.HINGE]
  if len(t['jids']):
    q = qpos[t['qadr']]
    axis = model.jnt_axis[t['jids']]
    jpos = model.jnt_pos[t['jids']]
    dq = tmath.axis_angle_to_quat(axis, q)
    pos_l = jpos - tmath.quat_rotate(dq, jpos)
    b = t['body']
    lpos = lpos.at[b].add(tmath.quat_rotate(lquat[b], pos_l))
    lquat = lquat.at[b].set(tmath.quat_mul(lquat[b], dq))

  t = cls[JointType.SLIDE]
  if len(t['jids']):
    q = qpos[t['qadr']]
    axis = model.jnt_axis[t['jids']]
    b = t['body']
    lpos = lpos.at[b].add(tmath.quat_rotate(lquat[b], axis * q[:, None]))

  t = cls[JointType.BALL]
  if len(t['jids']):
    qadr = t['qadr']
    dq = tmath.quat_normalize(
        jnp.stack([qpos[qadr + i] for i in range(4)], axis=-1))
    jpos = model.jnt_pos[t['jids']]
    pos_l = jpos - tmath.quat_rotate(dq, jpos)
    b = t['body']
    lpos = lpos.at[b].add(tmath.quat_rotate(lquat[b], pos_l))
    lquat = lquat.at[b].set(tmath.quat_mul(lquat[b], dq))

  t = cls[JointType.FREE]
  if len(t['jids']):
    qadr = t['qadr']
    b = t['body']
    pn = jnp.stack([qpos[qadr + i] for i in range(3)], axis=-1)
    qn = tmath.quat_normalize(
        jnp.stack([qpos[qadr + 3 + i] for i in range(4)], axis=-1))
    lpos = lpos.at[b].set(pn)   # free bodies are world-attached
    lquat = lquat.at[b].set(qn)

  mocap_body, mocap_id = cls['mocap']
  if len(mocap_body):
    lpos = lpos.at[mocap_body].set(data.mocap_pos[mocap_id].astype(dtype))
    lquat = lquat.at[mocap_body].set(
        data.mocap_quat[mocap_id].astype(dtype))

  # World row stays identity.
  lpos = lpos.at[0].set(0.0)
  lquat = lquat.at[0].set(jnp.asarray([1.0, 0, 0, 0], dtype))

  # Pointer jumping.
  for table in tree.jump_tables(model.body_parentid):
    anc = np.asarray(table, np.int32)
    lpos, lquat = (lpos[anc] + tmath.quat_rotate(lquat[anc], lpos),
                   tmath.quat_mul(lquat[anc], lquat))

  xpos, xquat = lpos, lquat

  # cdof from final poses, per joint class.
  cdof = jnp.zeros((model.nv, 6), dtype)

  t = cls[JointType.HINGE]
  if len(t['jids']):
    b = t['body']
    axis_w = tmath.quat_rotate(xquat[b], model.jnt_axis[t['jids']])
    anchor = xpos[b] + tmath.quat_rotate(xquat[b], model.jnt_pos[t['jids']])
    rows = jnp.concatenate([axis_w, jnp.cross(axis_w, -anchor)], axis=-1)
    cdof = cdof.at[t['dadr']].set(rows)

  t = cls[JointType.SLIDE]
  if len(t['jids']):
    b = t['body']
    axis_w = tmath.quat_rotate(xquat[b], model.jnt_axis[t['jids']])
    cdof = cdof.at[t['dadr']].set(
        jnp.concatenate([jnp.zeros_like(axis_w), axis_w], axis=-1))

  t = cls[JointType.BALL]
  if len(t['jids']):
    b = t['body']
    anchor = xpos[b] + tmath.quat_rotate(xquat[b], model.jnt_pos[t['jids']])
    axes_w = jnp.swapaxes(tmath.quat_to_mat(xquat[b]), -1, -2)
    lin = jnp.cross(axes_w, -anchor[:, None, :])
    rows = jnp.concatenate([axes_w, lin], axis=-1)
    dof_rows = (t['dadr'][:, None] + np.arange(3)[None]).reshape(-1)
    cdof = cdof.at[dof_rows].set(rows.reshape(-1, 6))

  t = cls[JointType.FREE]
  if len(t['jids']):
    b = t['body']
    k = len(b)
    eye = jnp.eye(3, dtype=dtype)
    trans_rows = jnp.concatenate(
        [jnp.zeros((k, 3, 3), dtype),
         jnp.broadcast_to(eye, (k, 3, 3))], axis=-1)
    axes_w = jnp.swapaxes(tmath.quat_to_mat(xquat[b]), -1, -2)
    lin = jnp.cross(axes_w, -xpos[b][:, None, :])
    rot_rows = jnp.concatenate([axes_w, lin], axis=-1)
    rows = jnp.concatenate([trans_rows, rot_rows], axis=1)
    dof_rows = (t['dadr'][:, None] + np.arange(6)[None]).reshape(-1)
    cdof = cdof.at[dof_rows].set(rows.reshape(-1, 6))

  return _fwd_position_finish(model, data, xpos, xquat, cdof)


def _fwd_position_finish(model: Model, data: Data, xpos, xquat, cdof):
  """Shared tail: inertial/site/geom frames + tendon lengths."""
  qpos = data.qpos
  xmat = tmath.quat_to_mat(xquat)
  xipos = xpos + jnp.einsum('bij,bj->bi', xmat, model.body_ipos)
  ximat = jnp.einsum('bij,bjk->bik', xmat,
                     tmath.quat_to_mat(model.body_iquat))
  sb = np.asarray(model.site_bodyid, dtype=np.int32)
  site_xpos = xpos[sb] + jnp.einsum('sij,sj->si', xmat[sb], model.site_pos)
  site_xmat = jnp.einsum('sij,sjk->sik', xmat[sb],
                         tmath.quat_to_mat(model.site_quat))
  gb = np.asarray(model.geom_bodyid, dtype=np.int32)
  geom_xpos = xpos[gb] + jnp.einsum('gij,gj->gi', xmat[gb], model.geom_pos)
  geom_xmat = jnp.einsum('gij,gjk->gik', xmat[gb],
                         tmath.quat_to_mat(model.geom_quat))
  if model.ntendon:
    dof_qposadr = _dof_qposadr(model)
    ten_length = model.tendon_moment @ qpos[dof_qposadr]
  else:
    ten_length = jnp.zeros((0,), qpos.dtype)
  return data.replace(
      xpos=xpos, xquat=xquat, xipos=xipos, ximat=ximat,
      site_xpos=site_xpos, site_xmat=site_xmat,
      geom_xpos=geom_xpos, geom_xmat=geom_xmat,
      cdof=cdof, ten_length=ten_length)


def _fwd_position_unrolled(model: Model, data: Data) -> Data:
  """General body-at-a-time FK (multi-joint bodies)."""
  qpos = data.qpos

  xpos = [jnp.zeros(3)]
  xquat = [jnp.array([1.0, 0.0, 0.0, 0.0], dtype=qpos.dtype)]

  # Per-dof world axis (cdof) pieces, filled in body order.
  cdof_rows = [None] * model.nv

  for b in range(1, model.nbody):
    parent = model.body_parentid[b]
    mocapid = model.body_mocapid[b]
    if mocapid >= 0:
      pos, quat = data.mocap_pos[mocapid], data.mocap_quat[mocapid]
      xpos.append(pos)
      xquat.append(quat)
      continue

    # Frame from parent.
    pos, quat = tmath.pose_mul(xpos[parent], xquat[parent],
                               model.body_pos[b], model.body_quat[b])

    jadr, jnum = model.body_jntadr[b], model.body_jntnum[b]
    for k in range(jnum):
      ji = jadr + k
      jtype = JointType(model.jnt_type[ji])
      dadr = model.jnt_dofadr[ji]
      if jtype == JointType.FREE:
        pos = qpos[model.jnt_qposadr[ji]:model.jnt_qposadr[ji] + 3]
        quat = tmath.quat_normalize(
            qpos[model.jnt_qposadr[ji] + 3:model.jnt_qposadr[ji] + 7])
        # 3 translational dofs (world axes), 3 rotational (world axes,
        # anchored at the body frame origin = joint anchor).
        # Translation dofs: world axes.  Rotation dofs: body-frame axes
        # rotated to world, anchored at the body frame origin (empirically
        # matches MuJoCo's free-joint convention; see tools/check_smooth.py).
        for a in range(3):
          e = jnp.zeros(3, qpos.dtype).at[a].set(1.0)
          cdof_rows[dadr + a] = jnp.concatenate([jnp.zeros(3, qpos.dtype), e])
        for a in range(3):
          e = jnp.zeros(3, qpos.dtype).at[a].set(1.0)
          axis_w = tmath.quat_rotate(quat, e)
          cdof_rows[dadr + 3 + a] = jnp.concatenate(
              [axis_w, jnp.cross(axis_w, -pos)])
      elif jtype == JointType.BALL:
        q_j = tmath.quat_normalize(
            qpos[model.jnt_qposadr[ji]:model.jnt_qposadr[ji] + 4])
        anchor = tmath.transform_point(pos, quat, model.jnt_pos[ji])
        quat_new = tmath.quat_mul(quat, q_j)
        pos = anchor - tmath.quat_rotate(quat_new, model.jnt_pos[ji])
        quat = quat_new
        # Ball dof axes: child-frame unit axes rotated to world.
        for a in range(3):
          e = jnp.zeros(3, qpos.dtype).at[a].set(1.0)
          axis_w = tmath.quat_rotate(quat, e)
          cdof_rows[dadr + a] = jnp.concatenate(
              [axis_w, jnp.cross(axis_w, -anchor)])
      else:
        angle_or_disp = qpos[model.jnt_qposadr[ji]]
        axis_local = model.jnt_axis[ji]
        if jtype == JointType.HINGE:
          axis_w = tmath.quat_rotate(quat, axis_local)
          anchor = tmath.transform_point(pos, quat, model.jnt_pos[ji])
          dq = tmath.axis_angle_to_quat(axis_local, angle_or_disp)
          quat_new = tmath.quat_mul(quat, dq)
          pos = anchor - tmath.quat_rotate(quat_new, model.jnt_pos[ji])
          quat = quat_new
          cdof_rows[dadr] = jnp.concatenate(
              [axis_w, jnp.cross(axis_w, -anchor)])
        else:  # SLIDE
          axis_w = tmath.quat_rotate(quat, axis_local)
          pos = pos + axis_w * angle_or_disp
          cdof_rows[dadr] = jnp.concatenate(
              [jnp.zeros(3, qpos.dtype), axis_w])

    xpos.append(pos)
    xquat.append(quat)

  xpos = jnp.stack(xpos)
  xquat = jnp.stack(xquat)
  cdof = (jnp.stack(cdof_rows) if model.nv
          else jnp.zeros((0, 6), qpos.dtype))
  return _fwd_position_finish(model, data, xpos, xquat, cdof)


def _dof_qposadr(model: Model) -> np.ndarray:
  """qpos address per dof (valid for scalar-joint dofs; 0 otherwise)."""
  out = np.zeros(model.nv, dtype=np.int32)
  for ji in range(model.njnt):
    if model.jnt_type[ji] in (int(JointType.HINGE), int(JointType.SLIDE)):
      out[model.jnt_dofadr[ji]] = model.jnt_qposadr[ji]
  return out


def ancestor_mask(model: Model) -> np.ndarray:
  """(nbody, nv) 0/1 mask: mask[b, i] = dof i is an ancestor dof of body b."""
  mask = np.zeros((model.nbody, model.nv), dtype=np.float64)
  for b in range(1, model.nbody):
    i = b
    while i != 0:
      if model.body_dofnum[i]:
        adr = model.body_dofadr[i]
        mask[b, adr:adr + model.body_dofnum[i]] = 1.0
      i = model.body_parentid[i]
  return mask


def fwd_velocity_kinematics(model: Model, data: Data) -> Data:
  """Computes body spatial velocities (cvel) and tendon/actuator velocities."""
  qvel = data.qvel
  # cvel[b] = sum of ancestor cdof * qvel — one matmul via the ancestor mask.
  mask = jnp.asarray(ancestor_mask(model))
  weighted = data.cdof * qvel[:, None]           # (nv, 6)
  cvel = mask @ weighted                          # (nbody, 6)

  ten_velocity = (model.tendon_moment @ qvel if model.ntendon
                  else jnp.zeros((0,), qvel.dtype))
  return data.replace(cvel=cvel, ten_velocity=ten_velocity)


def point_velocity(data: Data, bodyid_cvel: jax.Array, point: jax.Array):
  """Linear/angular world velocity of a body-fixed point.

  Args:
    bodyid_cvel: (6,) spatial velocity row (data.cvel[bodyid]).
    point: (3,) world coordinates.

  Returns:
    (linvel(3), angvel(3)) — the [lin, ang] ordering the reference's
    `get_site_velocity` returns (dexterity/utils/mujoco_utils.py:10-35).
  """
  ang = bodyid_cvel[:3]
  lin = bodyid_cvel[3:] + jnp.cross(ang, point)
  return lin, ang


def jac_point(model: Model, data: Data, bodyid: int, point: jax.Array):
  """Translational & rotational Jacobians of a world point on body `bodyid`.

  TPU-native replacement for `compute_object_6d_jacobian`
  (reference: dexterity/utils/mujoco_utils.py:38-75).

  Returns:
    jacp: (3, nv), jacr: (3, nv).
  """
  mask = jnp.asarray(ancestor_mask(model)[bodyid])  # (nv,)
  ang = data.cdof[:, :3]                             # (nv, 3)
  lin = data.cdof[:, 3:] + jnp.cross(ang, point[None, :])
  jacp = (lin * mask[:, None]).T
  jacr = (ang * mask[:, None]).T
  return jacp, jacr


def site_jacobian(model: Model, data: Data, site_ids) -> jax.Array:
  """Stacked 3xnv position Jacobians for sites (static id list)."""
  jacs = []
  for sid in site_ids:
    bodyid = model.site_bodyid[sid]
    jacp, _ = jac_point(model, data, bodyid, data.site_xpos[sid])
    jacs.append(jacp)
  return jnp.concatenate(jacs, axis=0)
