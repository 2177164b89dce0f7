"""SoA narrow-phase kernels vs the AoS reference implementations.

Random geom poses per type pair; distances, positions and normals must
match (up to slot ordering for multi-point manifolds — compare sorted
valid slots and active-point sets).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexterity_tpu.core.types import GeomType
from dexterity_tpu.physics.collision import primitives, soa


def _random_pose(rng):
  q = rng.randn(4)
  q /= np.linalg.norm(q)
  w, x, y, z = q
  mat = np.array([
      [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
      [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
      [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
  return rng.uniform(-0.05, 0.05, 3), mat


def _size_for(t, rng):
  if t == GeomType.PLANE:
    return np.array([1.0, 1.0, 0.1])
  if t == GeomType.SPHERE:
    return np.array([rng.uniform(0.02, 0.06), 0, 0])
  if t == GeomType.CAPSULE:
    return np.array([rng.uniform(0.01, 0.03), rng.uniform(0.02, 0.05), 0])
  return rng.uniform(0.02, 0.06, 3)  # box


@pytest.mark.parametrize('tpair', sorted(
    [(int(a), int(b)) for (a, b) in primitives._KERNELS],))
def test_soa_matches_aos(tpair):
  t1, t2 = GeomType(tpair[0]), GeomType(tpair[1])
  aos_fn, k = primitives._KERNELS[(t1, t2)]
  soa_fn, sk = soa.KERNELS[(t1, t2)]
  assert sk == k
  rng = np.random.RandomState(hash(tpair) % 2 ** 31)
  n = 64

  p1s, m1s, s1s, p2s, m2s, s2s = [], [], [], [], [], []
  for _ in range(n):
    if t1 == GeomType.PLANE:
      p1, m1 = np.zeros(3), np.eye(3)
    else:
      p1, m1 = _random_pose(rng)
    p2, m2 = _random_pose(rng)
    p1s.append(p1)
    m1s.append(m1)
    s1s.append(_size_for(t1, rng))
    p2s.append(p2)
    m2s.append(m2)
    s2s.append(_size_for(t2, rng))
  p1s, m1s, s1s = map(np.asarray, (p1s, m1s, s1s))
  p2s, m2s, s2s = map(np.asarray, (p2s, m2s, s2s))

  d_aos, p_aos, n_aos = jax.jit(jax.vmap(aos_fn))(
      *map(jnp.asarray, (p1s, m1s, s1s, p2s, m2s, s2s)))

  d_soa, p_soa, n_soa = jax.jit(lambda *a: soa_fn(*a))(
      soa.vec3(jnp.asarray(p1s)), soa.mat3(jnp.asarray(m1s)),
      soa.vec3(jnp.asarray(s1s)), soa.vec3(jnp.asarray(p2s)),
      soa.mat3(jnp.asarray(m2s)), soa.vec3(jnp.asarray(s2s)))
  d_soa = jnp.swapaxes(d_soa, 0, 1)              # (n, k)
  p_soa = jnp.moveaxis(soa.stack_v3(p_soa), 1, 0)  # (n, k, 3)
  n_soa = jnp.moveaxis(soa.stack_v3(n_soa), 1, 0)

  d_aos, p_aos, n_aos = map(np.asarray, (d_aos, p_aos, n_aos))
  d_soa, p_soa, n_soa = map(np.asarray, (d_soa, p_soa, n_soa))

  # Compare the sets of active (penetrating) points per instance.
  for i in range(n):
    act_a = np.where(d_aos[i] < 0)[0]
    act_s = np.where(d_soa[i] < 0)[0]
    assert len(act_a) == len(act_s), (i, d_aos[i], d_soa[i])
    if len(act_a) == 0:
      # Distances of nearest slot should agree when both report proximity.
      continue
    order_a = act_a[np.argsort(d_aos[i][act_a])]
    order_s = act_s[np.argsort(d_soa[i][act_s])]
    np.testing.assert_allclose(d_aos[i][order_a], d_soa[i][order_s],
                               atol=1e-10, err_msg=f'inst {i}')
    np.testing.assert_allclose(p_aos[i][order_a], p_soa[i][order_s],
                               atol=1e-8, err_msg=f'inst {i}')
    np.testing.assert_allclose(n_aos[i][order_a], n_soa[i][order_s],
                               atol=1e-8, err_msg=f'inst {i}')
