"""Quaternion / rotation / spatial-algebra primitives.

All functions are pure jax.numpy, shape-polymorphic over leading batch dims
where noted, and safe under jit/vmap/grad.  Quaternions use MuJoCo's (w, x, y,
z) convention.  These are the TPU-native replacements for the rotation math the
reference delegates to MuJoCo C (`mj_normalizeQuat`, `mju_quat2Mat`, ...) and
to `dm_robotics.transformations` (reference: dexterity/utils/geometry_utils.py,
dexterity/manipulation/goals/prop_orientation.py:45-50).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_identity() -> jax.Array:
  return jnp.array([1.0, 0.0, 0.0, 0.0])


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
  """Normalizes to unit quaternion (mj_normalizeQuat semantics)."""
  norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
  return jnp.where(norm > eps, q / jnp.maximum(norm, eps), quat_identity())


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
  """Hamilton product a ⊗ b."""
  aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
  bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
  return jnp.stack(
      [
          aw * bw - ax * bx - ay * by - az * bz,
          aw * bx + ax * bw + ay * bz - az * by,
          aw * by - ax * bz + ay * bw + az * bx,
          aw * bz + ax * by - ay * bx + az * bw,
      ],
      axis=-1,
  )


def quat_conj(q: jax.Array) -> jax.Array:
  return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_inv(q: jax.Array) -> jax.Array:
  """Inverse for unit quaternions (= conjugate)."""
  return quat_conj(q)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotates vector v by unit quaternion q (R(q) @ v)."""
  w = q[..., :1]
  u = q[..., 1:]
  c = jnp.cross(u, v)
  return v + 2.0 * (w * c + jnp.cross(u, c))


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotates v by the inverse of q (R(q)^T @ v)."""
  return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
  """Unit quaternion -> 3x3 rotation matrix (mju_quat2Mat)."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  r00 = 1 - 2 * (y * y + z * z)
  r01 = 2 * (x * y - w * z)
  r02 = 2 * (x * z + w * y)
  r10 = 2 * (x * y + w * z)
  r11 = 1 - 2 * (x * x + z * z)
  r12 = 2 * (y * z - w * x)
  r20 = 2 * (x * z - w * y)
  r21 = 2 * (y * z + w * x)
  r22 = 1 - 2 * (x * x + y * y)
  row0 = jnp.stack([r00, r01, r02], axis=-1)
  row1 = jnp.stack([r10, r11, r12], axis=-1)
  row2 = jnp.stack([r20, r21, r22], axis=-1)
  return jnp.stack([row0, row1, row2], axis=-2)


def mat_to_quat(m: jax.Array) -> jax.Array:
  """3x3 rotation matrix -> unit quaternion (branch-free, mju_mat2Quat)."""
  # Shepperd's method written with jnp.where so it vmaps/jits cleanly.
  m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
  m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
  m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
  tr = m00 + m11 + m22

  # Four candidate extractions; pick by largest pivot.
  s0 = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
  c0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                  (m10 - m01) / s0], axis=-1)
  s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
  c1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                  (m02 + m20) / s1], axis=-1)
  s2 = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2.0
  c2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                  (m12 + m21) / s2], axis=-1)
  s3 = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2.0
  c3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                  0.25 * s3], axis=-1)

  cond0 = (tr > 0.0)[..., None]
  cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
  cond2 = (m11 >= m22)[..., None]
  q = jnp.where(cond0, c0, jnp.where(cond1, c1, jnp.where(cond2, c2, c3)))
  q = quat_normalize(q)
  # Canonicalize sign (w >= 0) for deterministic comparisons.
  return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
  """Unit axis + angle -> quaternion."""
  half = angle * 0.5
  s = jnp.sin(half)
  return jnp.concatenate(
      [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def quat_to_axis_angle(q: jax.Array, eps: float = 1e-12) -> jax.Array:
  """Unit quaternion -> rotation vector (axis * angle), a.k.a. quat log map.

  Matches `tr.quat_to_axisangle` used for orientation goal distance
  (reference: dexterity/manipulation/goals/prop_orientation.py:45-50).
  """
  # Make w >= 0 to return the shortest rotation.
  q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
  w = jnp.clip(q[..., 0], -1.0, 1.0)
  vec = q[..., 1:]
  sin_half = jnp.linalg.norm(vec, axis=-1)
  angle = 2.0 * jnp.arctan2(sin_half, w)
  axis = vec / jnp.maximum(sin_half, eps)[..., None]
  small = sin_half < eps
  return jnp.where(small[..., None], jnp.zeros_like(vec), axis * angle[..., None])


def quat_integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
  """Integrates quaternion by angular velocity omega (local frame) over dt.

  Matches mj_integratePos semantics for ball/free joints: the velocity is
  expressed in the frame that MuJoCo stores it in (child frame for ball
  joints; world frame handled by caller for free joints).
  """
  angle = jnp.linalg.norm(omega, axis=-1) * dt
  axis = omega / jnp.maximum(jnp.linalg.norm(omega, axis=-1, keepdims=True), 1e-12)
  dq = axis_angle_to_quat(axis, angle)
  return quat_normalize(quat_mul(q, dq))


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
  """Velocity (rotation vector) that takes qb to qa: log(qb^-1 ⊗ qa)."""
  return quat_to_axis_angle(quat_mul(quat_inv(qb), qa))


# ---------------------------------------------------------------------------
# Frames / poses
# ---------------------------------------------------------------------------


def pose_mul(pos_a, quat_a, pos_b, quat_b):
  """Composition of frames: world_T_a * a_T_b."""
  return pos_a + quat_rotate(quat_a, pos_b), quat_mul(quat_a, quat_b)


def transform_point(pos, quat, point):
  """Applies frame (pos, quat) to a point."""
  return pos + quat_rotate(quat, point)


# ---------------------------------------------------------------------------
# Spatial inertia helpers
# ---------------------------------------------------------------------------


def inertia_world(
    mass: jax.Array,
    diag_inertia: jax.Array,
    ximat: jax.Array,
) -> jax.Array:
  """Rotates a principal-axis body inertia into the world frame.

  Args:
    mass: (..., ) body masses.
    diag_inertia: (..., 3) principal moments.
    ximat: (..., 3, 3) rotation of the inertia frame in world coords.

  Returns:
    (..., 3, 3) world-frame rotational inertia about the body COM.
  """
  del mass  # rotational part only; mass used by callers for translation part
  d = diag_inertia[..., None, :] * ximat  # R @ diag(d) == (d * R^T rows)
  return jnp.einsum('...ij,...kj->...ik', d, ximat)


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
  """Safe L2 normalize (reference: dexterity/utils/geometry_utils.py:6-14)."""
  return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + eps)


# ---------------------------------------------------------------------------
# Plane (SoA) forms.
#
# TPU layout note: batched AoS arrays like (B, nbody, 3) or (B, nbody, 3, 3)
# tile with the tiny trailing dims in the (8, 128) vector registers — 3 of
# 128 lanes used, ~40x wasted HBM bandwidth per op (measured: the inertia
# and jacobian intermediates dominated the round-2 substep trace).  The
# plane form keeps each scalar component a separate (n,) array (a "plane"),
# so every operation is full-width elementwise VPU work and XLA fuses whole
# chains without materializing padded tensors.  A quaternion is a 4-tuple
# of planes (w, x, y, z); a vector a 3-tuple; a rotation a row-major
# 9-tuple.
# ---------------------------------------------------------------------------


def quat_mul_p(a, b):
  """Hamilton product on quaternion planes."""
  aw, ax, ay, az = a
  bw, bx, by, bz = b
  return (aw * bw - ax * bx - ay * by - az * bz,
          aw * bx + ax * bw + ay * bz - az * by,
          aw * by - ax * bz + ay * bw + az * bx,
          aw * bz + ax * by - ay * bx + az * bw)


def quat_rotate_p(q, v):
  """Rotates vector planes v by unit quaternion planes q."""
  w, ux, uy, uz = q
  vx, vy, vz = v
  cx = uy * vz - uz * vy
  cy = uz * vx - ux * vz
  cz = ux * vy - uy * vx
  dx = uy * cz - uz * cy
  dy = uz * cx - ux * cz
  dz = ux * cy - uy * cx
  return (vx + 2.0 * (w * cx + dx),
          vy + 2.0 * (w * cy + dy),
          vz + 2.0 * (w * cz + dz))


def quat_to_mat_p(q):
  """Unit quaternion planes -> row-major rotation 9-tuple."""
  w, x, y, z = q
  return (1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
          2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
          2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y))


def quat_normalize_p(q, eps: float = 1e-12):
  """Plane-form quat_normalize (identity when near zero)."""
  w, x, y, z = q
  n = jnp.sqrt(w * w + x * x + y * y + z * z)
  big = n > eps
  inv = 1.0 / jnp.maximum(n, eps)
  return (jnp.where(big, w * inv, 1.0), jnp.where(big, x * inv, 0.0),
          jnp.where(big, y * inv, 0.0), jnp.where(big, z * inv, 0.0))


def cross_p(u, v):
  ux, uy, uz = u
  vx, vy, vz = v
  return (uy * vz - uz * vy, uz * vx - ux * vz, ux * vy - uy * vx)
