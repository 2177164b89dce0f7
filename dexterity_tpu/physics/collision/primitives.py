"""Vectorized primitive narrow-phase collision.

Candidate pairs are static (Model.pair_*).  At trace time pairs are grouped
by (type1, type2); each group runs one vmapped kernel over its pair batch and
results scatter into fixed contact-slot rows.  Everything is static-shape:
inactive contacts simply report positive distance and are masked by the
constraint solver's impedance.

Conventions (MuJoCo-compatible): contact normal points from geom1 into
geom2; dist < 0 means penetration; frame rows are [normal, tangent1,
tangent2].
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu.core.types import Contact, Data, GeomType, Model
from dexterity_tpu.core.types import max_points_per_pair, num_contact_points

_BIG = 1e10


def _tangent_frame(normal: jax.Array) -> jax.Array:
  """(…,3) normal -> (…,3,3) frame rows [n, t1, t2]."""
  n = normal
  # Pick the axis least aligned with n for a stable tangent.
  ref = jnp.where(jnp.abs(n[..., 0:1]) < 0.5,
                  jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape),
                  jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape))
  t1 = jnp.cross(n, ref)
  t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
  t2 = jnp.cross(n, t1)
  return jnp.stack([n, t1, t2], axis=-2)


# ---------------------------------------------------------------------------
# Pairwise kernels.  Each takes world-frame (pos, mat, size) for both geoms
# and returns (dist(k,), pos(k,3), normal(k,3)) with a fixed point count k.
# ---------------------------------------------------------------------------


def _plane_sphere(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  d = jnp.dot(p2 - p1, n) - s2[0]
  pos = p2 - n * (s2[0] + 0.5 * d)
  return d[None], pos[None], n[None]


def _plane_capsule(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  axis = m2[:, 2]
  ends = jnp.stack([p2 + axis * s2[1], p2 - axis * s2[1]])
  d = ends @ n - jnp.dot(p1, n) - s2[0]
  pos = ends - n * (s2[0] + 0.5 * d)[:, None]
  return d, pos, jnp.broadcast_to(n, (2, 3))


def _plane_box(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  # All 8 corners as candidates (sort-free; non-penetrating slots inactive).
  corners = jnp.asarray(np.array(
      [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
      dtype=np.float64))
  pts = p2 + (corners * s2) @ m2.T                       # (8, 3)
  d = pts @ n - jnp.dot(p1, n)
  pos = pts - n * (0.5 * d)[:, None]
  return d, pos, jnp.broadcast_to(n, (8, 3))


def _sphere_sphere(p1, m1, s1, p2, m2, s2):
  delta = p2 - p1
  dist = jnp.linalg.norm(delta)
  n = delta / jnp.maximum(dist, 1e-12)
  d = dist - s1[0] - s2[0]
  pos = p1 + n * (s1[0] + 0.5 * d)
  return d[None], pos[None], n[None]


def _closest_on_segment(a, b, p):
  ab = b - a
  t = jnp.clip(jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-12), 0, 1)
  return a + t * ab


def _sphere_capsule(p1, m1, s1, p2, m2, s2):
  axis = m2[:, 2]
  a, b = p2 - axis * s2[1], p2 + axis * s2[1]
  c = _closest_on_segment(a, b, p1)
  delta = c - p1
  dist = jnp.linalg.norm(delta)
  n = delta / jnp.maximum(dist, 1e-12)
  d = dist - s1[0] - s2[0]
  pos = p1 + n * (s1[0] + 0.5 * d)
  return d[None], pos[None], n[None]


def _capsule_capsule(p1, m1, s1, p2, m2, s2):
  u1, u2 = m1[:, 2], m2[:, 2]
  a1, b1 = p1 - u1 * s1[1], p1 + u1 * s1[1]
  a2, b2 = p2 - u2 * s2[1], p2 + u2 * s2[1]
  # Closest points between segments (standard clamped solve).
  d1 = b1 - a1
  d2 = b2 - a2
  r = a1 - a2
  a = jnp.dot(d1, d1)
  e = jnp.dot(d2, d2)
  f = jnp.dot(d2, r)
  c = jnp.dot(d1, r)
  b = jnp.dot(d1, d2)
  denom = a * e - b * b
  s = jnp.clip(jnp.where(denom > 1e-12, (b * f - c * e) / denom, 0.0), 0, 1)
  t = (b * s + f) / jnp.maximum(e, 1e-12)
  t_cl = jnp.clip(t, 0, 1)
  s = jnp.clip((b * t_cl - c) / jnp.maximum(a, 1e-12), 0, 1)
  pa = a1 + d1 * s
  pb = a2 + d2 * t_cl
  delta = pb - pa
  dist = jnp.linalg.norm(delta)
  n = delta / jnp.maximum(dist, 1e-12)
  d = dist - s1[0] - s2[0]
  pos = pa + n * (s1[0] + 0.5 * d)
  return d[None], pos[None], n[None]


def _sphere_box(p1, m1, s1, p2, m2, s2):
  local = m2.T @ (p1 - p2)
  clamped = jnp.clip(local, -s2, s2)
  inside = jnp.all(jnp.abs(local) < s2)
  # Outside: closest surface point; inside: push out through nearest face.
  face_dist = s2 - jnp.abs(local)
  ax = jnp.argmin(face_dist)
  sign = jnp.sign(local[ax])
  sign = jnp.where(sign == 0, 1.0, sign)
  inside_pt = clamped.at[ax].set(sign * s2[ax])
  surf_local = jnp.where(inside, inside_pt, clamped)
  surf = p2 + m2 @ surf_local
  delta = surf - p1
  dist_out = jnp.linalg.norm(delta)
  n_out = delta / jnp.maximum(dist_out, 1e-12)
  n_in = -(m2 @ (jnp.zeros(3).at[ax].set(sign)))
  n = jnp.where(inside, n_in, n_out)
  d = jnp.where(inside, -(face_dist[ax]) - s1[0], dist_out - s1[0])
  pos = p1 + n * (s1[0] + 0.5 * d)
  return d[None], pos[None], n[None]


def _capsule_box(p1, m1, s1, p2, m2, s2):
  # Two sphere-box tests at the capsule's deepest end candidates plus the
  # segment-closest point; keep the 2 deepest.
  axis = m1[:, 2]
  ends = [p1 - axis * s1[1], p1 + axis * s1[1]]
  # Closest point on segment to box center as a third candidate.
  mid = _closest_on_segment(ends[0], ends[1], p2)
  cands = jnp.stack(ends + [mid])
  ds, ps, ns = [], [], []
  for i in range(3):
    d, p, n = _sphere_box(cands[i], m1, s1, p2, m2, s2)
    ds.append(d[0])
    ps.append(p[0])
    ns.append(n[0])
  d = jnp.stack(ds)
  p = jnp.stack(ps)
  n = jnp.stack(ns)
  order = jnp.argsort(d)
  idx = order[:2]
  d_sel, p_sel, n_sel = d[idx], p[idx], n[idx]
  # Candidates can coincide (e.g. segment-closest == an endpoint); a
  # duplicated point would double its contact force.
  dup = jnp.linalg.norm(p_sel[1] - p_sel[0]) < 1e-7
  d_sel = d_sel.at[1].set(jnp.where(dup, _BIG, d_sel[1]))
  return d_sel, p_sel, n_sel


def _box_box(p1, m1, s1, p2, m2, s2):
  """SAT + reference-face clipping manifold (see box_box module)."""
  from dexterity_tpu.physics.collision import box_box
  return box_box.box_box(p1, m1, s1, p2, m2, s2)


_KERNELS = {
    (GeomType.PLANE, GeomType.SPHERE): (_plane_sphere, 1),
    (GeomType.PLANE, GeomType.CAPSULE): (_plane_capsule, 2),
    (GeomType.PLANE, GeomType.BOX): (_plane_box, 8),
    (GeomType.SPHERE, GeomType.SPHERE): (_sphere_sphere, 1),
    (GeomType.SPHERE, GeomType.CAPSULE): (_sphere_capsule, 1),
    (GeomType.SPHERE, GeomType.BOX): (_sphere_box, 1),
    (GeomType.CAPSULE, GeomType.CAPSULE): (_capsule_capsule, 1),
    (GeomType.CAPSULE, GeomType.BOX): (_capsule_box, 2),
    (GeomType.BOX, GeomType.BOX): (_box_box, 8),
}


def _pair_groups(model: Model):
  """Groups candidate pairs by ordered type pair; returns static tables
  with the midphase cap applied: each group occupies
  min(n_pairs, cap) * k rows starting at 'row'."""
  groups: Dict[Tuple[int, int], Dict[str, List[int]]] = {}
  from dexterity_tpu.core.types import collision_type
  for i in range(model.npair):
    g1, g2 = model.pair_geom1[i], model.pair_geom2[i]
    t1 = collision_type(model.geom_type[g1])
    t2 = collision_type(model.geom_type[g2])
    if t1 > t2:
      g1, g2 = g2, g1
      t1, t2 = t2, t1
    key = (GeomType(t1), GeomType(t2))
    grp = groups.setdefault(key, {'pair': [], 'g1': [], 'g2': []})
    grp['pair'].append(i)
    grp['g1'].append(g1)
    grp['g2'].append(g2)
  cap = model.opt.midphase_cap
  cap_plane = getattr(model.opt, 'midphase_cap_plane', 0) or cap
  row = 0
  for key in groups:
    grp = groups[key]
    n = len(grp['pair'])
    gcap = cap_plane if (cap and key[0] == GeomType.PLANE) else cap
    m = n if cap == 0 else min(n, gcap)
    _, k = _KERNELS[key]
    grp['m'] = m
    grp['k'] = k
    grp['row'] = row
    row += m * k
  return groups, row


def pair_kernel_geoms(model: Model):
  """Static per-pair geom ids in KERNEL order (type1 <= type2, possibly
  swapped vs the pair tables). The contact normal points from the first to
  the second of these."""
  from dexterity_tpu.core.types import collision_type
  g1_out = np.zeros(model.npair, np.int32)
  g2_out = np.zeros(model.npair, np.int32)
  for i in range(model.npair):
    g1, g2 = model.pair_geom1[i], model.pair_geom2[i]
    if (collision_type(model.geom_type[g1])
        > collision_type(model.geom_type[g2])):
      g1, g2 = g2, g1
    g1_out[i] = g1
    g2_out[i] = g2
  return g1_out, g2_out


def collision_size(model: Model) -> np.ndarray:
  """Static per-geom sizes as seen by the narrow phase.

  Cylinders are collided as capsules; the capsule half-length is shortened
  by the radius so the total axial extent matches the cylinder
  (2*(hl' + r) = 2*hl) instead of bloating each flat end by a full
  hemisphere — the flat-end vs round-cap difference is then bounded by the
  cap sagitta rather than the radius."""
  size = np.array(jax.device_get(model.geom_size), dtype=np.float64)
  for g in range(model.ngeom):
    if model.geom_type[g] == int(GeomType.CYLINDER):
      size[g, 1] = max(size[g, 1] - size[g, 0], 1e-6)
  return size


def _bounding_radius(model: Model) -> np.ndarray:
  """Static bounding-sphere radius per geom (planes get 0)."""
  size = np.asarray(jax.device_get(model.geom_size))
  out = np.zeros(model.ngeom)
  for g in range(model.ngeom):
    t = model.geom_type[g]
    s = size[g]
    if t == int(GeomType.SPHERE):
      out[g] = s[0]
    elif t in (int(GeomType.CAPSULE), int(GeomType.CYLINDER)):
      out[g] = s[0] + s[1]
    elif t == int(GeomType.BOX):
      out[g] = float(np.linalg.norm(s))
    elif t == int(GeomType.ELLIPSOID):
      out[g] = float(np.max(s))
  return out


def _tangent_frame_soa(n):
  """SoA tangent frame: normal planes -> (t1, t2) plane triples.

  Same reference-axis choice as _tangent_frame (|nx| < 0.5 picks x else y),
  written component-wise so no trailing-dim-3 arrays materialize.
  """
  from dexterity_tpu.physics.collision import soa
  nx, ny, nz = n
  cond = jnp.abs(nx) < 0.5
  refx = jnp.where(cond, 1.0, 0.0)
  refy = jnp.where(cond, 0.0, 1.0)
  refz = jnp.zeros_like(nx)
  t1 = soa.cross(n, (refx, refy, refz))
  inv = 1.0 / jnp.maximum(jnp.sqrt(jnp.maximum(soa.dot(t1, t1), 0.0)),
                          1e-12)
  t1 = soa.scale(t1, inv)
  t2 = soa.cross(n, t1)
  return t1, t2


def _pair_param_planes(model: Model, pair_idx: np.ndarray) -> np.ndarray:
  """Static (NPARAM, n) parameter table for candidate pairs `pair_idx`.

  Everything the constraint stage needs per contact (margin, solref,
  solimp, friction, condim, body ids, invweight sum) as host-side
  constants, in KERNEL geom order.
  """
  from dexterity_tpu.core import types as T
  host = lambda a: np.asarray(jax.device_get(a))
  pg1, pg2 = pair_kernel_geoms(model)
  gb = np.asarray(model.geom_bodyid)
  b1 = gb[pg1[pair_idx]]
  b2 = gb[pg2[pair_idx]]
  iw0 = host(model.body_invweight0)
  out = np.zeros((T.NPARAM, len(pair_idx)))
  out[T.PARAM_MARGIN] = host(model.pair_margin)[pair_idx]
  out[T.PARAM_SOLREF] = host(model.pair_solref)[pair_idx].T
  out[T.PARAM_SOLIMP] = host(model.pair_solimp)[pair_idx].T
  out[T.PARAM_FRICTION] = host(model.pair_friction)[pair_idx].T
  out[T.PARAM_CONDIM] = np.asarray(model.pair_condim)[pair_idx]
  out[T.PARAM_BODY1] = b1
  out[T.PARAM_BODY2] = b2
  out[T.PARAM_IW] = iw0[b1, 0] + iw0[b2, 0]
  return out


def onehot_select(sel: jax.Array, planes: jax.Array) -> jax.Array:
  """Selects columns of `planes` (p, n) at indices `sel` (k,) -> (p, k).

  Implemented as a one-hot contraction rather than a gather: each row of
  the selection matrix has exactly one nonzero, so the matmul result is an
  exact copy of the selected column, but it runs on the MXU instead of the
  scalar core (per-env dynamic gathers cost ~10 cycles/element on TPU and
  dominated the round-1 substep profile).  precision=HIGHEST keeps f32
  operands exact through the MXU passes.
  """
  n = planes.shape[-1]
  s = (sel[:, None] == jnp.arange(n)[None, :]).astype(planes.dtype)
  return jnp.einsum('kn,pn->pk', s, planes,
                    precision=jax.lax.Precision.HIGH)


def collide_all(model: Model, data: Data) -> Data:
  """Narrow phase from AoS geom frames (refresh/conformance path)."""
  gpos = tuple(data.geom_xpos[:, c] for c in range(3))
  gmat = tuple(data.geom_xmat[:, i, j] for i in range(3) for j in range(3))
  contact = collide_planes(model, gpos, gmat, data.qpos[0] * 0,
                           data.qpos.dtype)
  return data.replace(contact=contact)


def midphase_selinfo(model: Model, gpos, gmat, dtype):
  """Midphase slot selection, hoisted out of the substep loop.

  Computes, per capped kernel group, the top-m candidate one-hot matrix
  (m, n) and the static per-slot payload (8, m) from the CURRENT geom
  frames.  Planner rollouts reuse one selection for all substeps of a
  control step (geoms move ~mm per control step while the bounding-sphere
  midphase has cm-scale slack), which removes the approx_top_k scoring —
  ~2/3 of the collision stage at planner batch sizes — from every substep
  but conceptually the first.  Returns a list over groups (None for
  uncapped groups) of dict(oh=(m, n), stat=(8, m)).
  """
  groups, _ = _pair_groups(model)
  radius = _bounding_radius(model)
  size_np = collision_size(model)
  margin_np = np.asarray(jax.device_get(model.pair_margin))
  all_planes = list(gpos) + list(gmat)

  def expand(gids, rows=range(12)):
    return tuple(all_planes[r][gids] for r in rows)

  from dexterity_tpu.physics.collision import soa
  out = []
  for (t1g, t2g), grp in groups.items():
    m = grp['m']
    g1 = np.asarray(grp['g1'], np.int32)
    g2 = np.asarray(grp['g2'], np.int32)
    pair_np = np.asarray(grp['pair'], np.int32)
    n = len(g1)
    if m >= n:
      out.append(None)
      continue
    p1 = expand(g1, rows=range(3))
    p2 = expand(g2, rows=range(3))
    delta = soa.sub(p2, p1)
    r2 = jnp.asarray(radius[g2], dtype)
    if t1g == GeomType.PLANE:
      nrm1 = expand(g1, rows=(5, 8, 11))
      score = soa.dot(delta, nrm1) - r2
    else:
      r1 = jnp.asarray(radius[g1], dtype)
      score = jnp.sqrt(jnp.maximum(soa.dot(delta, delta), 0.0)) - r1 - r2
    if jax.default_backend() == 'tpu':
      _, sel = jax.lax.approx_max_k(-score, m, recall_target=0.95)
      sel = sel.astype(jnp.int32)
    else:
      _, sel = jax.lax.top_k(-score, m)
    oh = (sel[..., :, None] == jnp.arange(n)[None, :]).astype(dtype)
    stat = onehot_select(sel, jnp.asarray(np.concatenate([
        size_np[g1].T, size_np[g2].T,
        pair_np[None].astype(np.float64),
        margin_np[pair_np][None]]), dtype))
    out.append(dict(oh=oh, stat=stat))
  return out


def collide_group_planes(model: Model, gpos, gmat, vary_zero, dtype,
                         selinfo=None):
  """Narrow phase over candidate pairs, optionally midphase-capped.

  TPU layout strategy: all per-pair inputs are component planes (one
  (npairs,) array per scalar) built by static constant-index gathers from
  12 per-geom planes; the midphase top-m selection is a one-hot MXU
  contraction (onehot_select), never a per-env dynamic gather.  Only the
  pair margin rides along per slot (top-K scoring needs it); every other
  pair parameter is resolved later in the constraint stage from the
  static pair table, so nothing parameter-sized is materialized per env.

  Returns the per-kernel-group results WITHOUT concatenating them into
  one Contact: a list of dicts with keys dist/pos/frame/pair/margin
  (planes of length k*m, slot-major), in the fixed group iteration order.
  The hot path consumes this directly (the constraint stage's top-K
  selection sums per-group one-hot contractions), which keeps the ~13
  payload planes out of HBM as a second concatenated copy — the concat
  alone was ~17% of the round-2 hot substep.  `collide_planes` builds the
  Contact struct from these groups for the refresh/conformance path.

  Args:
    gpos: 3-tuple of (ngeom,) world-position planes.
    gmat: row-major 9-tuple of (ngeom,) rotation planes.
    vary_zero: a traced scalar zero tied to the state — keeps
      constant-derived planes varying-type-uniform across scan carries
      under shard_map.
  """
  groups, total_rows = _pair_groups(model)
  radius = _bounding_radius(model)
  size_np = collision_size(model)
  margin_np = np.asarray(jax.device_get(model.pair_margin))
  ngeom = model.ngeom
  hi = jax.lax.Precision.HIGH         # see crb_planes precision note

  from dexterity_tpu.physics.collision import soa

  # Flat list of the 12 geom-frame planes; slot expansion is a static
  # constant-index gather per plane (XLA lowers these to cheap strided
  # kernels — a constant one-hot matmul was measured 10x WORSE here: XLA
  # strength-reduces the tiny-minor-dim dot into a broadcast-reduce
  # fusion over (B, p, n, ngeom)).
  all_planes = list(gpos) + list(gmat)

  def expand(gids, rows=range(12)):
    """Planes at a static slot->geom map: tuple of (len(gids),) planes."""
    return tuple(all_planes[r][gids] for r in rows)

  out = []
  for gi, ((t1g, t2g), grp) in enumerate(groups.items()):
    if (t1g, t2g) not in _KERNELS:
      raise NotImplementedError(f'no collision kernel for {t1g} vs {t2g}')
    _, k = _KERNELS[(t1g, t2g)]
    m = grp['m']
    g1 = np.asarray(grp['g1'], np.int32)
    g2 = np.asarray(grp['g2'], np.int32)
    pair_np = np.asarray(grp['pair'], np.int32)
    n = len(g1)

    if selinfo is not None and m < n:
      # Hoisted midphase (see midphase_selinfo): the slot one-hot and the
      # static payload were computed once per control step; only the
      # fresh-plane selection matmul remains per substep.  The selection
      # runs PER SIDE: a side whose slot->geom map is a single geom (the
      # free prop vs. every hand geom — the shape of every capped reorient
      # group) broadcasts that geom's 12 planes instead of one-hot
      # selecting 12 constant columns; this halves the stacked payload
      # (the (B, 24, 187) stack + copies were ~14% of the planner control
      # step) and is exact (each one-hot row selects a single value).
      si = selinfo[gi]
      stat = si['stat'] + vary_zero

      def side_planes(gids):
        uniq = np.unique(gids)
        if len(uniq) == 1:
          gc = int(uniq[0])
          return tuple(jnp.broadcast_to(all_planes[r][gc], (m,))
                       for r in range(12))
        stack = jnp.stack(expand(gids, rows=range(12)))   # (12, n)
        dyn = jnp.einsum('kn,pn->pk', si['oh'], stack,
                         precision=jax.lax.Precision.HIGH)
        return tuple(dyn)

      d1 = side_planes(g1)
      d2 = side_planes(g2)
      p1, m1_ = d1[0:3], d1[3:12]
      p2, m2_ = d2[0:3], d2[3:12]
      s1 = tuple(stat[0:3])
      s2 = tuple(stat[3:6])
      pid = jnp.round(stat[6]).astype(jnp.int32)
      mar = stat[7]
    elif m < n:
      # Cheap conservative pair distance (bounding spheres; planes use the
      # true halfspace distance) from position planes only, then top-m.
      p1 = expand(g1, rows=range(3))
      p2 = expand(g2, rows=range(3))
      delta = soa.sub(p2, p1)
      r2 = jnp.asarray(radius[g2], dtype)
      if t1g == GeomType.PLANE:
        nrm1 = expand(g1, rows=(5, 8, 11))        # rotation col 2
        score = soa.dot(delta, nrm1) - r2
      else:
        r1 = jnp.asarray(radius[g1], dtype)
        score = jnp.sqrt(jnp.maximum(soa.dot(delta, delta), 0.0)) - r1 - r2
      if jax.default_backend() == 'tpu':
        # ApproxTopK PartialReduce instead of a full-width stable sort
        # (see the constraint-stage top-K note).  Boundary-recall misses
        # are bounding-sphere-marginal pairs — far from contact.
        _, sel = jax.lax.approx_max_k(-score, m, recall_target=0.95)
        sel = sel.astype(jnp.int32)
      else:
        _, sel = jax.lax.top_k(-score, m)
      # One (m, n) one-hot per non-singleton side selects that side's 12
      # planes in an MXU contraction.  NEVER dynamic takes: per-env (m,)
      # gathers of constants measured ~8 us/ELEMENT here (kCustom gather
      # kernels) — one such take per group cost more than the rest of the
      # substep.  (A two-stage unique-geom one-hot was also tried and
      # measured worse: u ~ n/2 for the box groups.)  A side mapping to a
      # single geom (the ground plane, the free prop) broadcasts its
      # planes instead of selecting constant columns — exact, and half
      # the stacked payload.
      def side_sel(gids):
        uniq = np.unique(gids)
        if len(uniq) == 1:
          gc = int(uniq[0])
          return tuple(jnp.broadcast_to(all_planes[r][gc], (m,))
                       for r in range(12))
        return tuple(onehot_select(sel, jnp.stack(expand(gids))))

      d1 = side_sel(g1)
      d2 = side_sel(g2)
      stat = onehot_select(sel, jnp.asarray(np.concatenate([
          size_np[g1].T, size_np[g2].T,
          pair_np[None].astype(np.float64),
          margin_np[pair_np][None]]), dtype) + vary_zero)
      p1, m1_ = d1[0:3], d1[3:12]
      p2, m2_ = d2[0:3], d2[3:12]
      s1 = tuple(stat[0:3])
      s2 = tuple(stat[3:6])
      pid = jnp.round(stat[6]).astype(jnp.int32)
      mar = stat[7]
    else:
      p1 = expand(g1, rows=range(3))
      p2 = expand(g2, rows=range(3))
      m1_ = expand(g1, rows=range(3, 12))
      m2_ = expand(g2, rows=range(3, 12))
      s1 = tuple(jnp.asarray(size_np[g1, c], dtype) for c in range(3))
      s2 = tuple(jnp.asarray(size_np[g2, c], dtype) for c in range(3))
      pid = jnp.asarray(pair_np) + vary_zero.astype(jnp.int32)
      mar = jnp.asarray(margin_np[pair_np], dtype) + vary_zero

    sfn, sk = soa.KERNELS[(t1g, t2g)]
    assert sk == k
    d, p, nrm = sfn(p1, m1_, s1, p2, m2_, s2)          # (k, m) planes
    tt1, tt2 = _tangent_frame_soa(nrm)
    out.append(dict(
        dist=d.reshape(-1),                            # rows are slot-major
        pos=tuple(c.reshape(-1) for c in p),
        frame=(tuple(c.reshape(-1) for c in nrm)
               + tuple(c.reshape(-1) for c in tt1)
               + tuple(c.reshape(-1) for c in tt2)),
        pair=jnp.tile(pid, k),                         # matching tiling
        margin=jnp.tile(mar, k)))
  if out:
    assert sum(g['dist'].shape[0] for g in out) == total_rows \
        == num_contact_points(model)
  return out


def collide_planes(model: Model, gpos, gmat, vary_zero, dtype) -> Contact:
  """Concatenated-Contact form of collide_group_planes (refresh path)."""
  out = collide_group_planes(model, gpos, gmat, vary_zero, dtype)
  if not out:
    return Contact(
        dist=jnp.full((1,), _BIG, dtype),
        pos=jnp.zeros((3, 1), dtype),
        frame=jnp.asarray(np.eye(3).reshape(9, 1), dtype),
        pair=-jnp.ones((1,), jnp.int32),
        margin=jnp.zeros((1,), dtype))

  def catc(key, c):
    return jnp.concatenate([g[key][c] for g in out])

  pos = jnp.stack([catc('pos', c) for c in range(3)])            # (3, rows)
  frame = jnp.stack([catc('frame', c) for c in range(9)])        # (9, rows)
  return Contact(dist=jnp.concatenate([g['dist'] for g in out]),
                 pos=pos, frame=frame,
                 pair=jnp.concatenate(
                     [g['pair'] for g in out]).astype(jnp.int32),
                 margin=jnp.concatenate([g['margin'] for g in out]))
