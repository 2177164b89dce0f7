"""Batched small-matrix Cholesky solve as a Pallas TPU kernel.

STATUS: experimental, correct but not yet competitive. XLA lowers
jax.scipy's Cholesky/triangular solves to LinAlg custom-calls (~3-5 ms for
(1024, 30, 30) on the tunneled v5e); this kernel computes the same result
(verified to ~1e-6 relative) with the batch spread over (8, 128) vector
registers, but Mosaic currently materializes the per-column slice updates
through VMEM with relayouts, landing at ~75 ms.  Keeping the factorization
in registers needs a blocked formulation (ROADMAP.md round-2 item 2); the
physics hot path therefore still uses jax.scipy, and this module is the
starting point + correctness harness for that work.

`cholesky_solve(h, g)` is exposed through jax.custom_batching.custom_vmap:
the unbatched call (inside per-env code) uses jax.scipy; under vmap the
batched rule dispatches the Pallas kernel on TPU when
DEXTERITY_TPU_PALLAS_LINALG=1 (vmapped jax.scipy otherwise), so call sites
stay per-env and pure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SUB = 8
_LANES = 128
_TILE = _SUB * _LANES  # batch instances per grid cell


def _kernel(n):
  def kernel(h_ref, g_ref, x_ref, ll, inv_d, y):
    # Blocks are (n, n, 1, 8, 128) / (n, 1, 8, 128); the column axis of L
    # lives in scratch refs so stores are plain indexed writes (Pallas has
    # no scatter lowering).
    # Cholesky via column updates.
    for j in range(n):
      # s[i] = h[i, j] - sum_{k<j} L[i,k] L[j,k]
      s = h_ref[:, j, 0]                            # (n, 8, 128)
      if j:
        contrib = (ll[:, :j] * ll[j, :j][None]).sum(axis=1)
        s = s - contrib
      d = jnp.sqrt(jnp.maximum(s[j], 1e-12))
      inv = 1.0 / d
      ll[:, j] = s * inv[None]
      ll[j, j] = d
      inv_d[j] = inv

    # Forward substitution L y = g.
    for i in range(n):
      s = g_ref[i, 0]
      if i:
        s = s - (ll[i, :i] * y[:i]).sum(axis=0)
      y[i] = s * inv_d[i]
    # Back substitution L^T x = y (write into the output ref directly).
    for i in reversed(range(n)):
      s = y[i]
      if i < n - 1:
        s = s - (ll[i + 1:, i] * x_ref[i + 1:, 0]).sum(axis=0)
      x_ref[i, 0] = s * inv_d[i]
  return kernel


@functools.lru_cache(maxsize=32)
def _build_pallas(n, b_pad, dtype_name):
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  dtype = jnp.dtype(dtype_name)
  tiles = b_pad // _TILE
  return pl.pallas_call(
      _kernel(n),
      out_shape=jax.ShapeDtypeStruct((n, tiles, _SUB, _LANES), dtype),
      grid=(tiles,),
      in_specs=[
          pl.BlockSpec((n, n, 1, _SUB, _LANES), lambda i: (0, 0, i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((n, 1, _SUB, _LANES), lambda i: (0, i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((n, 1, _SUB, _LANES), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
      scratch_shapes=[
          pltpu.VMEM((n, n, _SUB, _LANES), dtype),   # L
          pltpu.VMEM((n, _SUB, _LANES), dtype),      # inv diag
          pltpu.VMEM((n, _SUB, _LANES), dtype),      # y
      ],
  )


def _batched_impl(h, g):
  """(B, n, n), (B, n) -> (B, n)."""
  import os
  b, n, _ = h.shape
  use_pallas = os.environ.get('DEXTERITY_TPU_PALLAS_LINALG') == '1'
  if not use_pallas or jax.default_backend() != 'tpu' or n > 48:
    return jax.vmap(
        lambda hh, gg: jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(hh), gg))(h, g)
  b_pad = -(-b // _TILE) * _TILE
  h_t = jnp.moveaxis(h, 0, -1)                       # (n, n, B)
  g_t = jnp.moveaxis(g, 0, -1)                       # (n, B)
  if b_pad != b:
    eye = jnp.eye(n, dtype=h.dtype)[:, :, None]
    pad_mask = (jnp.arange(b_pad) >= b)[None, None, :]
    h_t = jnp.pad(h_t, ((0, 0), (0, 0), (0, b_pad - b)))
    h_t = jnp.where(pad_mask, eye, h_t)
    g_t = jnp.pad(g_t, ((0, 0), (0, b_pad - b)))
  tiles = b_pad // _TILE
  h_t = h_t.reshape(n, n, tiles, _SUB, _LANES)
  g_t = g_t.reshape(n, tiles, _SUB, _LANES)
  x_t = _build_pallas(n, b_pad, str(h.dtype))(h_t, g_t)
  x = x_t.reshape(n, b_pad)[:, :b]
  return jnp.moveaxis(x, -1, 0)


@jax.custom_batching.custom_vmap
def cholesky_solve(h: jax.Array, g: jax.Array) -> jax.Array:
  """Solves H x = g for SPD H (n, n); batch via vmap hits the TPU kernel."""
  return jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(h), g)


@cholesky_solve.def_vmap
def _cholesky_solve_vmap(axis_size, in_batched, h, g):
  h_b, g_b = in_batched
  if not (h_b and g_b):
    h = h if h_b else jnp.broadcast_to(h, (axis_size,) + h.shape)
    g = g if g_b else jnp.broadcast_to(g, (axis_size,) + g.shape)
  return _batched_impl(h, g), True
