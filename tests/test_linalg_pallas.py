"""cholesky_solve custom-vmap correctness (scipy path on CPU; the Pallas
TPU path is exercised by the same function when
DEXTERITY_TPU_PALLAS_LINALG=1 on a TPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu.physics import linalg_pallas as LP


def test_unbatched_matches_dense_solve():
  rng = np.random.RandomState(0)
  n = 12
  a = rng.randn(n, n)
  h = a @ a.T + 3 * np.eye(n)
  g = rng.randn(n)
  x = np.asarray(LP.cholesky_solve(jnp.asarray(h), jnp.asarray(g)))
  np.testing.assert_allclose(x, np.linalg.solve(h, g), rtol=1e-8)


def test_vmapped_matches_dense_solve():
  rng = np.random.RandomState(1)
  b, n = 7, 10
  a = rng.randn(b, n, n)
  h = np.einsum('bij,bkj->bik', a, a) + 3 * np.eye(n)
  g = rng.randn(b, n)
  x = np.asarray(jax.jit(jax.vmap(LP.cholesky_solve))(
      jnp.asarray(h), jnp.asarray(g)))
  ref = np.stack([np.linalg.solve(h[i], g[i]) for i in range(b)])
  np.testing.assert_allclose(x, ref, rtol=1e-7, atol=1e-9)


def test_nested_vmap_matches_dense_solve():
  """Nested vmaps (env batch x candidate batch, the batched closed-loop
  evaluator shape) must peel batch axes recursively instead of vmapping
  the Pallas call itself (regression: ANY-space operand lowering error)."""
  rng = np.random.RandomState(2)
  b1, b2, n = 3, 5, 8
  a = rng.randn(b1, b2, n, n)
  h = np.einsum('cbij,cbkj->cbik', a, a) + 3 * np.eye(n)
  g = rng.randn(b1, b2, n)
  x = np.asarray(jax.jit(jax.vmap(jax.vmap(LP.cholesky_solve)))(
      jnp.asarray(h), jnp.asarray(g)))
  ref = np.linalg.solve(h, g[..., None])[..., 0]
  np.testing.assert_allclose(x, ref, rtol=1e-7, atol=1e-9)


def test_nested_vmap_factor_resolve():
  rng = np.random.RandomState(3)
  b1, b2, n = 2, 6, 9
  a = rng.randn(b1, b2, n, n)
  h = np.einsum('cbij,cbkj->cbik', a, a) + 3 * np.eye(n)
  g = rng.randn(b1, b2, n)

  def fr(hh, gg):
    f = LP.cholesky_factor(hh)
    return LP.cholesky_resolve(f, gg)

  x = np.asarray(jax.jit(jax.vmap(jax.vmap(fr)))(
      jnp.asarray(h), jnp.asarray(g)))
  ref = np.linalg.solve(h, g[..., None])[..., 0]
  np.testing.assert_allclose(x, ref, rtol=1e-7, atol=1e-9)


def test_solve_factor_pair():
  """cholesky_solve_factor returns the solution AND a factor that
  cholesky_resolve accepts (the fused modified-Newton refactor step)."""
  rng = np.random.RandomState(4)
  b, n = 5, 8
  a = rng.randn(b, n, n)
  h = np.einsum('bij,bkj->bik', a, a) + 3 * np.eye(n)
  g = rng.randn(b, n)
  g2 = rng.randn(b, n)

  def sf(hh, gg, gg2):
    x, fac = LP.cholesky_solve_factor(hh, gg)
    return x, LP.cholesky_resolve(fac, gg2)

  x, x2 = jax.jit(jax.vmap(sf))(jnp.asarray(h), jnp.asarray(g),
                                jnp.asarray(g2))
  np.testing.assert_allclose(np.asarray(x),
                             np.linalg.solve(h, g[..., None])[..., 0],
                             rtol=1e-7, atol=1e-9)
  np.testing.assert_allclose(np.asarray(x2),
                             np.linalg.solve(h, g2[..., None])[..., 0],
                             rtol=1e-7, atol=1e-9)


def test_solve_factor_jvp_const_preconditioner():
  """Forward-mode through cholesky_solve_factor: dx = H^-1 dg (the factor
  is constant under the tangent — the iLQR linearization contract)."""
  rng = np.random.RandomState(5)
  n = 6
  a = rng.randn(n, n)
  h = a @ a.T + 3 * np.eye(n)
  g = rng.randn(n)
  dg = rng.randn(n)

  def f(gg):
    x, _ = LP.cholesky_solve_factor(jnp.asarray(h), gg)
    return x

  _, dx = jax.jvp(f, (jnp.asarray(g),), (jnp.asarray(dg),))
  np.testing.assert_allclose(np.asarray(dx), np.linalg.solve(h, dg),
                             rtol=1e-7, atol=1e-9)
