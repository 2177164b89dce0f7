"""Unit tests for rotation/spatial math."""

import jax.numpy as jnp
import numpy as np
import pytest

from dexterity_tpu.physics import math as tmath


def random_quats(n, seed=0):
  rng = np.random.RandomState(seed)
  q = rng.randn(n, 4)
  return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mat_roundtrip():
  q = jnp.asarray(random_quats(64))
  m = tmath.quat_to_mat(q)
  q2 = tmath.mat_to_quat(m)
  # Same rotation up to sign; mat_to_quat canonicalizes w >= 0.
  ref = np.where(np.asarray(q)[:, :1] < 0, -np.asarray(q), np.asarray(q))
  np.testing.assert_allclose(np.asarray(q2), ref, atol=1e-12)


def test_quat_rotate_matches_matrix():
  q = jnp.asarray(random_quats(16, seed=1))
  v = jnp.asarray(np.random.RandomState(2).randn(16, 3))
  np.testing.assert_allclose(
      np.asarray(tmath.quat_rotate(q, v)),
      np.einsum('bij,bj->bi', np.asarray(tmath.quat_to_mat(q)), np.asarray(v)),
      atol=1e-12)


def test_quat_mul_associative_with_rotation():
  qa, qb = jnp.asarray(random_quats(8, 3)), jnp.asarray(random_quats(8, 4))
  v = jnp.asarray(np.random.RandomState(5).randn(8, 3))
  lhs = tmath.quat_rotate(tmath.quat_mul(qa, qb), v)
  rhs = tmath.quat_rotate(qa, tmath.quat_rotate(qb, v))
  np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)


def test_axis_angle_roundtrip():
  axis = tmath.l2_normalize(jnp.asarray(np.random.RandomState(6).randn(8, 3)))
  angle = jnp.asarray(np.random.RandomState(7).uniform(-3, 3, 8))
  q = tmath.axis_angle_to_quat(axis, angle)
  aa = tmath.quat_to_axis_angle(q)
  np.testing.assert_allclose(np.asarray(aa),
                             np.asarray(axis * angle[:, None]), atol=1e-9)


def test_quat_integrate_zero_omega():
  q = jnp.asarray(random_quats(4, 8))
  q2 = tmath.quat_integrate(q, jnp.zeros((4, 3)), 0.01)
  np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-12)


def test_quat_sub_inverse_of_integrate():
  q = jnp.asarray(random_quats(4, 9))
  omega = jnp.asarray(np.random.RandomState(10).randn(4, 3))
  q2 = tmath.quat_integrate(q, omega, 1.0)
  np.testing.assert_allclose(np.asarray(tmath.quat_sub(q2, q)),
                             np.asarray(omega), atol=1e-9)


def test_l2_normalize():
  v = jnp.asarray([3.0, 4.0, 0.0])
  np.testing.assert_allclose(np.asarray(tmath.l2_normalize(v)),
                             [0.6, 0.8, 0.0], atol=1e-9)
  # Epsilon keeps zero vectors finite (reference geometry_utils semantics).
  assert np.all(np.isfinite(np.asarray(tmath.l2_normalize(jnp.zeros(3)))))
