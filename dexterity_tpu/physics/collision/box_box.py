"""Box-box narrow phase: SAT with reference-face clipping (dBoxBox-style).

Separating-axis test over 6 face normals and 9 edge cross products; for a
face axis the incident face is clipped against the reference face's side
planes (masked Sutherland–Hodgman with static 8-slot capacity), for an edge
axis the single closest-point contact is used.  Matches the manifold
structure MuJoCo produces for box pairs — the contact of record for the
cube-in-hand tasks (fitted palm/finger boxes vs the OpenAI cube).

Returns 8 contact slots (dist=+BIG for unused).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e10
_EPS = 1e-10
# Prefer face axes over edge axes unless the edge separation is clearly
# larger (standard SAT tie-breaking; ODE uses 1.05 relative margin).
_EDGE_TOL = 1.05


def _overlap_polygon_candidates(poly, su, sv):
  """Vertices of the intersection of convex quad `poly` (4,2) with the
  rectangle |u|<=su, |v|<=sv — enumerated branch-free.

  Every vertex of the overlap polygon is one of: a quad vertex inside the
  rectangle, a rectangle corner inside the quad, or a quad-edge x
  rect-edge intersection.  Returns (cands (24, 2), valid (24,)).
  No sequential clipping loop: everything is a fixed-shape vectorized
  computation (the Sutherland-Hodgman scatter loop was the narrow-phase
  hot spot on TPU).
  """
  dtype = poly.dtype
  # (1) Quad vertices inside the rectangle.
  in_rect = (jnp.abs(poly[:, 0]) <= su + _EPS) & (
      jnp.abs(poly[:, 1]) <= sv + _EPS)

  # (2) Rectangle corners inside the quad (consistent cross-product sign).
  corners = jnp.stack([
      jnp.asarray([su, sv], dtype), jnp.asarray([su, -sv], dtype),
      jnp.asarray([-su, -sv], dtype), jnp.asarray([-su, sv], dtype)])
  edges = jnp.roll(poly, -1, axis=0) - poly                  # (4, 2)
  rel = corners[:, None, :] - poly[None, :, :]               # (4c, 4e, 2)
  cross = edges[None, :, 0] * rel[:, :, 1] - edges[None, :, 1] * rel[:, :, 0]
  # Inside iff all cross products share one sign (quad is convex).
  in_quad = jnp.all(cross >= -_EPS, axis=1) | jnp.all(cross <= _EPS, axis=1)

  # (3) Quad-edge x rect-edge intersections (16 candidates).
  # Rect edges: u=+su, u=-su (v free in [-sv, sv]); v=+sv, v=-sv.
  a = poly                                                   # (4, 2) starts
  b = jnp.roll(poly, -1, axis=0)                             # (4, 2) ends
  d = b - a

  def axis_hits(axis, bound, other_bound):
    # Intersection of each quad edge with the line coord[axis] = bound.
    denom = jnp.where(jnp.abs(d[:, axis]) > _EPS, d[:, axis], _EPS)
    tt = (bound - a[:, axis]) / denom
    pt = a + tt[:, None] * d
    ok = ((tt >= -_EPS) & (tt <= 1 + _EPS)
          & (jnp.abs(d[:, axis]) > _EPS)
          & (jnp.abs(pt[:, 1 - axis]) <= other_bound + _EPS))
    return pt, ok

  pts_list = [poly, corners]
  ok_list = [in_rect, in_quad]
  for axis, bound, other in ((0, su, sv), (0, -su, sv),
                             (1, sv, su), (1, -sv, su)):
    pt, ok = axis_hits(axis, bound, other)
    pts_list.append(pt)
    ok_list.append(ok)
  cands = jnp.concatenate(pts_list)                          # (24, 2)
  valid = jnp.concatenate(ok_list)
  return cands, valid


def box_box(p1, m1, s1, p2, m2, s2):
  """Returns (dist(8,), pos(8,3), normal(8,3)); normal points 1 -> 2."""
  dtype = p1.dtype
  r = m1.T @ m2                       # box2 orientation in box1 frame
  t = m1.T @ (p2 - p1)                # box2 center in box1 frame
  absr = jnp.abs(r) + _EPS

  # Face axes of box1 and box2.
  sep1 = jnp.abs(t) - (s1 + absr @ s2)                     # (3,)
  t2 = r.T @ t
  sep2 = jnp.abs(t2) - (s2 + absr.T @ s1)                  # (3,)

  # Edge cross axes a_i x b_j (box1 frame): standard OBB expressions.
  def edge_sep(i, j):
    # axis = e_i x r[:, j]
    axis = jnp.cross(jnp.eye(3, dtype=dtype)[i], r[:, j])
    norm = jnp.linalg.norm(axis)
    proj1 = (s1[(i + 1) % 3] * absr[(i + 2) % 3, j]
             + s1[(i + 2) % 3] * absr[(i + 1) % 3, j])
    proj2 = (s2[(j + 1) % 3] * absr[i, (j + 2) % 3]
             + s2[(j + 2) % 3] * absr[i, (j + 1) % 3])
    sep = jnp.abs(jnp.dot(t, axis)) - (proj1 + proj2)
    # Normalize; degenerate (parallel) axes report no separation info.
    sep_n = jnp.where(norm > 1e-6, sep / jnp.maximum(norm, 1e-6), -_BIG)
    return sep_n, axis / jnp.maximum(norm, 1e-6)

  edge_seps = []
  edge_axes = []
  for i in range(3):
    for j in range(3):
      sn, ax = edge_sep(i, j)
      edge_seps.append(sn)
      edge_axes.append(ax)
  edge_seps = jnp.stack(edge_seps)                          # (9,)
  edge_axes = jnp.stack(edge_axes)                          # (9, 3)

  face_seps = jnp.concatenate([sep1, sep2])                 # (6,)
  best_face = jnp.argmax(face_seps)
  best_face_sep = face_seps[best_face]
  best_edge = jnp.argmax(edge_seps)
  best_edge_sep = edge_seps[best_edge]

  separated = jnp.maximum(best_face_sep, best_edge_sep) > 0
  use_edge = best_edge_sep * _EDGE_TOL > best_face_sep

  # ---- face-contact manifold --------------------------------------------
  # Reference box = box1 if best_face < 3 else box2.
  ref_is_1 = best_face < 3
  axis_idx = jnp.where(ref_is_1, best_face, best_face - 3)

  m_ref = jnp.where(ref_is_1, m1[None], m2[None])[0]
  m_inc = jnp.where(ref_is_1, m2[None], m1[None])[0]
  s_ref = jnp.where(ref_is_1, s1, s2)
  s_inc = jnp.where(ref_is_1, s2, s1)
  p_ref = jnp.where(ref_is_1, p1, p2)
  p_inc = jnp.where(ref_is_1, p2, p1)

  # Normal: ref-face axis oriented towards the incident box.
  n_ref_local = jnp.eye(3, dtype=dtype)[axis_idx]
  n_world_unsigned = m_ref @ n_ref_local
  towards = jnp.sign(jnp.dot(p_inc - p_ref, n_world_unsigned))
  towards = jnp.where(towards == 0, 1.0, towards)
  n_world = n_world_unsigned * towards                      # ref -> inc

  # Incident face: the face of the incident box most anti-parallel to n.
  dots = m_inc.T @ n_world                                  # (3,)
  inc_axis = jnp.argmax(jnp.abs(dots))
  inc_sign = -jnp.sign(dots[inc_axis])
  inc_sign = jnp.where(inc_sign == 0, 1.0, inc_sign)

  # Incident face quad (4 verts, world).
  e1_idx = (inc_axis + 1) % 3
  e2_idx = (inc_axis + 2) % 3
  eye = jnp.eye(3, dtype=dtype)
  inc_n = eye[inc_axis] * inc_sign
  inc_e1 = eye[e1_idx]
  inc_e2 = eye[e2_idx]
  corners2d = jnp.asarray(
      np.array([[1, 1], [1, -1], [-1, -1], [-1, 1]], np.float64), dtype)
  quad_local = (inc_n * s_inc[inc_axis]
                + corners2d[:, :1] * inc_e1 * s_inc[e1_idx]
                + corners2d[:, 1:] * inc_e2 * s_inc[e2_idx])  # (4, 3)
  quad_world = p_inc + quad_local @ m_inc.T

  # Reference-face plane frame: tangents u, v; plane at +s_ref[axis].
  u_idx = (axis_idx + 1) % 3
  v_idx = (axis_idx + 2) % 3
  u_world = m_ref @ eye[u_idx]
  v_world = m_ref @ eye[v_idx]
  su = s_ref[u_idx]
  sv = s_ref[v_idx]
  rel = quad_world - p_ref
  poly = jnp.stack([rel @ u_world, rel @ v_world], axis=-1)  # (4, 2)
  cands, valid = _overlap_polygon_candidates(poly, su, sv)   # (24, …)

  # Depths: height along the outward normal, interpolated on the incident
  # face plane: height = h0 + grad . (uv - uv0).
  heights = rel @ n_world                                    # quad heights
  a_mat = jnp.stack([poly[1] - poly[0], poly[2] - poly[0]], axis=0)  # (2,2)
  h_vec = jnp.stack([heights[1] - heights[0], heights[2] - heights[0]])
  det = a_mat[0, 0] * a_mat[1, 1] - a_mat[0, 1] * a_mat[1, 0]
  inv = jnp.asarray([[a_mat[1, 1], -a_mat[0, 1]],
                     [-a_mat[1, 0], a_mat[0, 0]]], dtype) / jnp.where(
                         jnp.abs(det) > _EPS, det, _EPS)
  grad = inv @ h_vec                                         # d h / d uv
  h_points = heights[0] + (cands - poly[0]) @ grad           # (24,)

  ref_face_h = s_ref[axis_idx]
  depth = h_points - ref_face_h                              # <0: penetrating
  dist_cand = jnp.where(valid, depth, _BIG)

  # Keep the 8 deepest candidates; drop duplicates (a polygon vertex can
  # appear both as a quad vertex and as an edge intersection).
  neg, sel8 = jax.lax.top_k(-dist_cand, 8)
  dist_face = -neg
  pts2d = cands[sel8]                                        # (8, 2)
  dup = jnp.zeros(8, bool)
  for i in range(1, 8):
    close = jnp.linalg.norm(pts2d[:i] - pts2d[i], axis=1) < 1e-7
    dup = dup.at[i].set(jnp.any(close & (dist_face[:i] < _BIG * 0.5)))
  dist_face = jnp.where(dup, _BIG, dist_face)

  pts_world = (p_ref + pts2d[:, :1] * u_world + pts2d[:, 1:] * v_world
               + (ref_face_h + 0.5 * dist_face.clip(max=0.0))[:, None]
               * n_world)
  # Normal must point geom1 -> geom2.
  n_face_out = jnp.where(ref_is_1, n_world, -n_world)
  normal_face = jnp.broadcast_to(n_face_out, (8, 3))

  # ---- edge-contact ------------------------------------------------------
  ei = best_edge // 3
  ej = best_edge % 3
  axis_e = m1 @ edge_axes[best_edge]                        # world
  sign_e = jnp.sign(jnp.dot(p2 - p1, axis_e))
  sign_e = jnp.where(sign_e == 0, 1.0, sign_e)
  n_edge = axis_e * sign_e                                  # 1 -> 2
  # Supporting edge on box1: direction e_i; center offset = support of the
  # other two axes along +n (in box1 frame).
  n1 = m1.T @ n_edge
  off1 = jnp.zeros(3, dtype)
  for k in range(3):
    off1 = off1.at[k].set(
        jnp.where(k == ei, 0.0, jnp.sign(n1[k]) * s1[k]))
  c1 = p1 + m1 @ off1
  d1 = m1[:, ei]
  n2 = m2.T @ n_edge
  off2 = jnp.zeros(3, dtype)
  for k in range(3):
    off2 = off2.at[k].set(
        jnp.where(k == ej, 0.0, -jnp.sign(n2[k]) * s2[k]))
  c2 = p2 + m2 @ off2
  d2 = m2[:, ej]
  # Closest points between the two (infinite) edge lines.
  w0 = c1 - c2
  a = jnp.dot(d1, d1)
  b = jnp.dot(d1, d2)
  c = jnp.dot(d2, d2)
  d_ = jnp.dot(d1, w0)
  e_ = jnp.dot(d2, w0)
  den = a * c - b * b
  sc = jnp.where(jnp.abs(den) > _EPS, (b * e_ - c * d_) / den, 0.0)
  tc = jnp.where(jnp.abs(den) > _EPS, (a * e_ - b * d_) / den, 0.0)
  sc = jnp.clip(sc, -s1[ei], s1[ei])
  tc = jnp.clip(tc, -s2[ej], s2[ej])
  pa = c1 + sc * d1
  pb = c2 + tc * d2
  dist_edge = best_edge_sep
  pos_edge = 0.5 * (pa + pb)

  # ---- combine ------------------------------------------------------------
  dist = jnp.where(use_edge,
                   jnp.full((8,), _BIG, dtype).at[0].set(dist_edge),
                   dist_face)
  pos = jnp.where(use_edge,
                  jnp.zeros((8, 3), dtype).at[0].set(pos_edge),
                  pts_world)
  normal = jnp.where(use_edge,
                     jnp.broadcast_to(n_edge, (8, 3)),
                     normal_face)
  # Fully separated pairs: keep the best-axis distance in slot 0 so the
  # top-K scoring still sees how close the pair is.
  best_sep = jnp.maximum(best_face_sep, best_edge_sep)
  dist = jnp.where(separated,
                   jnp.full((8,), _BIG, dtype).at[0].set(best_sep),
                   dist)
  return dist, pos, normal
