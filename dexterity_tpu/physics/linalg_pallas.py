"""Batched small-matrix Cholesky solve as a Pallas TPU kernel.

XLA lowers jax.scipy's Cholesky/triangular solves to LinAlg custom-calls
(~2.7 ms for (512, 30, 30) f32 on v5e — measured, tools/profile_stages.py);
the physics step performs several such solves per substep, making them a
dominant cost.  This kernel computes the same factorization with the batch
spread over (8, 128) vector registers — every batch element occupies one
lane position and the n x n matrix algebra happens across the leading axes,
so each scalar operation of the textbook algorithm is a full-width VPU op
over 1024 batch instances.

Formulation notes (why this one is fast where the round-1 kernel was ~75 ms):
right-looking Cholesky with a full-matrix rank-1 update per column.  All
slices are static (the column loop is unrolled at trace time), every
operand keeps the (…, 8, 128) register tile as its minor dims, and there is
no dynamic middle-axis indexing for Mosaic to relayout.

`cholesky_solve(h, g)` is exposed through jax.custom_batching.custom_vmap:
the unbatched call (inside per-env code) uses jax.scipy; under vmap the
batched rule dispatches the Pallas kernel on TPU (set
DEXTERITY_TPU_PALLAS_LINALG=0 to force vmapped jax.scipy).

Replaces the reference's dense-solver C boundary (mj_solveM / the implicit
Euler and constraint-Hessian solves inside mj_step; SURVEY.md §2.7).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_SUB = 8
_LANES = 128
_TILE = _SUB * _LANES  # batch instances per grid cell (max tile)


# VMEM budget for one (n, n, sub, 128) matrix tile.  The fused solve
# kernel holds one input block + one scratch copy (the block pipeline
# double-buffers the input), so ~3 tiles must fit in 16 MB VMEM.
_TILE_BYTES = 4 * 1024 * 1024


def _pick_sub(b, n=0):
  """Sublane count for a batch of b instances: the smallest POWER OF TWO
  s with b <= s*128 (capped at 8; non-power-of-2 sublane tiles fault the
  TPU DMA engine — measured, sub=3 crashes the worker), further capped so
  one (n, n, s, 128) matrix tile fits the VMEM budget.  Small batches
  (256/512 — the single-stream planner shapes) then tile EXACTLY into
  (s, 128) with zero padding: the eye-fill pad fusion and the 4x-padded
  retile copy around every factor/resolve call were ~1.5 ms of a 16 ms
  single-stream solve (trace r5), and Mosaic's per-op vreg count is
  ceil(s/8) = 1 either way.  The VMEM cap is what admits juggle's nv=62
  two-hand model (the old hard n<=48 cutoff sent every juggle Cholesky to
  XLA's LinAlg custom-call — 34 ms of a 49 ms substep, trace r5)."""
  sub = 1
  while sub < _SUB and sub * _LANES < b:
    sub *= 2
  if n:
    while sub > 1 and n * n * sub * _LANES * 4 > _TILE_BYTES:
      sub //= 2
  return sub


def _max_pallas_n():
  """Largest n the fused solve kernel compiles for (empirical: Mosaic's
  scoped-VMEM stack for this kernel is ~5x one (n, n, 1, 128) tile;
  n=80 @ sub=1 compiles, n=90 OOMs the 16 MB scoped limit)."""
  return 80


def _kernel(n):
  def kernel(h_ref, g_ref, x_ref, a, y):
    # Blocks: h (n, n, 1, sub, 128), g/x (n, 1, sub, 128).
    # Scratch: a (n, n, sub, 128) working copy, y (n, sub, 128).
    a[...] = h_ref[:, :, 0]
    y[...] = g_ref[:, 0]

    # Right-looking Cholesky.  Every (i, j) entry is its own (8, 128)
    # vector register (the batch lives in the minor dims), so restricting
    # the rank-1 Schur update to the trailing submatrix — instead of the
    # full matrix with garbage rows/cols — drops the op count from n^3 to
    # ~n^3/3 of full-width VPU ops (measured ~2.5x on (512, 30, 30)).
    inv_d = []
    for k in range(n):
      inv = jax.lax.rsqrt(jnp.maximum(a[k, k], 1e-12))
      inv_d.append(inv)
      if k + 1 < n:
        col = a[k + 1:, k] * inv[None]   # (n-k-1, 8, 128)
        a[k + 1:, k + 1:] = a[k + 1:, k + 1:] - col[:, None] * col[None, :]
        a[k + 1:, k] = col

    # Forward substitution L y = g (column-oriented, static slices).
    for k in range(n):
      yk = y[k] * inv_d[k]
      if k + 1 < n:
        y[k + 1:] = y[k + 1:] - a[k + 1:, k] * yk[None]
      y[k] = yk

    # Back substitution L^T x = y.  L^T[j, k] = L[k, j] = a[k, j].
    for k in reversed(range(n)):
      xk = y[k] * inv_d[k]
      if k:
        y[:k] = y[:k] - a[k, :k] * xk[None]
      x_ref[k, 0] = xk
  return kernel


@functools.lru_cache(maxsize=32)
def _build_pallas(n, tiles, dtype_name, sub=_SUB):
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  dtype = jnp.dtype(dtype_name)
  return pl.pallas_call(
      _kernel(n),
      out_shape=jax.ShapeDtypeStruct((n, tiles, sub, _LANES), dtype),
      grid=(tiles,),
      in_specs=[
          pl.BlockSpec((n, n, 1, sub, _LANES), lambda i: (0, 0, i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((n, 1, sub, _LANES), lambda i: (0, i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((n, 1, sub, _LANES), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
      scratch_shapes=[
          pltpu.VMEM((n, n, sub, _LANES), dtype),    # working matrix / L
          pltpu.VMEM((n, sub, _LANES), dtype),       # y
      ],
  )


def _solve_factor_kernel(n):
  def kernel(h_ref, g_ref, x_ref, l_ref, a, y):
    # Fused solve + packed-factor emit: identical factorization to
    # _kernel, but the working matrix (with the packed 1/sqrt diagonal of
    # _factor_kernel) is also written out, so the modified-Newton
    # refactor iteration pays ONE kernel call instead of factor+resolve
    # (and the factor never round-trips HBM between the two).
    a[...] = h_ref[:, :, 0]
    y[...] = g_ref[:, 0]
    inv_d = []
    for k in range(n):
      inv = jax.lax.rsqrt(jnp.maximum(a[k, k], 1e-12))
      inv_d.append(inv)
      a[k, k] = inv
      if k + 1 < n:
        col = a[k + 1:, k] * inv[None]
        a[k + 1:, k + 1:] = a[k + 1:, k + 1:] - col[:, None] * col[None, :]
        a[k + 1:, k] = col
    l_ref[...] = a[...][:, :, None]
    for k in range(n):
      yk = y[k] * inv_d[k]
      if k + 1 < n:
        y[k + 1:] = y[k + 1:] - a[k + 1:, k] * yk[None]
      y[k] = yk
    for k in reversed(range(n)):
      xk = y[k] * inv_d[k]
      if k:
        y[:k] = y[:k] - a[k, :k] * xk[None]
      x_ref[k, 0] = xk
  return kernel


@functools.lru_cache(maxsize=32)
def _build_solve_factor(n, tiles, dtype_name, sub=_SUB):
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  dtype = jnp.dtype(dtype_name)
  return pl.pallas_call(
      _solve_factor_kernel(n),
      out_shape=(jax.ShapeDtypeStruct((n, tiles, sub, _LANES), dtype),
                 jax.ShapeDtypeStruct((n, n, tiles, sub, _LANES), dtype)),
      grid=(tiles,),
      in_specs=[
          pl.BlockSpec((n, n, 1, sub, _LANES), lambda i: (0, 0, i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((n, 1, sub, _LANES), lambda i: (0, i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=(
          pl.BlockSpec((n, 1, sub, _LANES), lambda i: (0, i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((n, n, 1, sub, _LANES), lambda i: (0, 0, i, 0, 0),
                       memory_space=pltpu.VMEM),
      ),
      scratch_shapes=[
          pltpu.VMEM((n, n, sub, _LANES), dtype),
          pltpu.VMEM((n, sub, _LANES), dtype),
      ],
  )


def _solve_factor_batched(h, g):
  """(..., n, n), (..., n) -> ((..., n) solution, packed factor for
  cholesky_resolve_b).  Pallas path; sub capped harder (the fused kernel
  keeps ~5 tiles of scoped VMEM live: in x2, scratch, L out x2)."""
  n = h.shape[-1]
  batch_shape = h.shape[:-2]
  h2 = h.reshape((-1, n, n))
  g2 = g.reshape((-1, n))
  b = h2.shape[0]
  sub = _pick_sub(b, n)
  while sub > 1 and n * n * sub * _LANES * 4 > 2_500_000:
    sub //= 2
  h_t, tiles, b_pad, sub = _pad_tiles(jnp.moveaxis(h2, 0, -1), b,
                                      fill_eye=True, sub=sub)
  g_t, _, _, _ = _pad_tiles(jnp.moveaxis(g2, 0, -1), b, sub=sub)
  x_t, l_t = _build_solve_factor(n, tiles, str(h.dtype), sub)(h_t, g_t)
  x = jnp.moveaxis(x_t.reshape(n, b_pad)[:, :b], -1, 0)
  l = jnp.moveaxis(l_t.reshape(n, n, b_pad)[..., :b], -1, 0)
  return (x.reshape(batch_shape + (n,)),
          l.reshape(batch_shape + (n, n)))


@jax.custom_batching.custom_vmap
def _solve_factor(h: jax.Array, g: jax.Array):
  if h.ndim == 2 or jax.default_backend() != 'tpu' or h.dtype not in (
      jnp.float32,) or h.shape[-1] > _max_pallas_n():
    # Fallback format matches cholesky_factor's: the factor IS the
    # matrix; cholesky_resolve re-factorizes per call.
    if h.ndim == 2:
      x = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(h), g)
    else:
      x = _batched_impl(h, g)
    return x, h
  return _solve_factor_batched(h, g)


@_solve_factor.def_vmap
def _solve_factor_vmap(axis_size, in_batched, h, g):
  h_b, g_b = in_batched
  if not (h_b and g_b):
    h = h if h_b else jnp.broadcast_to(h, (axis_size,) + h.shape)
    g = g if g_b else jnp.broadcast_to(g, (axis_size,) + g.shape)
  return _solve_factor(h, g), (True, True)


@jax.custom_jvp
def cholesky_solve_factor(h: jax.Array, g: jax.Array):
  """Solves H x = g AND returns the packed factor for cholesky_resolve.

  One fused kernel call for the modified-Newton refactor iteration.  The
  JVP treats the factor as a constant preconditioner (see
  cholesky_resolve_const): dx = solve(fac, dg), dfac = 0.  Callers must
  stop_gradient h.
  """
  return _solve_factor(h, g)


@cholesky_solve_factor.defjvp
def _cholesky_solve_factor_jvp(primals, tangents):
  h, g = primals
  _, dg = tangents
  x, fac = _solve_factor(h, g)
  dx = cholesky_resolve(fac, dg)
  return (x, fac), (dx, jnp.zeros_like(fac))


def _factor_kernel(n):
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  def kernel(h_ref, l_ref, a, sems):
    # Operands stay in HBM (memory_space=ANY); each grid step copies one
    # (n, n, 8, 128) tile into a single VMEM scratch, factors in place,
    # and copies it back out.  The automatic block pipeline double-buffers
    # in+out blocks, which exceeds the 16 MB scoped-VMEM limit at 2+ grid
    # tiles (B >= 2048); manual DMA keeps exactly one tile resident.
    i = pl.program_id(0)
    din = pltpu.make_async_copy(h_ref.at[:, :, i], a, sems.at[0])
    din.start()
    din.wait()
    # Packed factor: strict lower triangle = L[i, k] (i > k), diagonal =
    # inv_d[k] (1/sqrt of the pivot), upper = garbage.
    for k in range(n):
      inv = jax.lax.rsqrt(jnp.maximum(a[k, k], 1e-12))
      a[k, k] = inv
      if k + 1 < n:
        col = a[k + 1:, k] * inv[None]
        a[k + 1:, k + 1:] = a[k + 1:, k + 1:] - col[:, None] * col[None, :]
        a[k + 1:, k] = col
    dout = pltpu.make_async_copy(a, l_ref.at[:, :, i], sems.at[1])
    dout.start()
    dout.wait()
  return kernel


def _resolve_kernel(n):
  def kernel(l_ref, g_ref, x_ref, y):
    # Substitution-only solve against a packed factor (see _factor_kernel).
    y[...] = g_ref[:, 0]
    for k in range(n):
      yk = y[k] * l_ref[k, k, 0]
      if k + 1 < n:
        y[k + 1:] = y[k + 1:] - l_ref[k + 1:, k, 0] * yk[None]
      y[k] = yk
    for k in reversed(range(n)):
      xk = y[k] * l_ref[k, k, 0]
      if k:
        y[:k] = y[:k] - l_ref[k, :k, 0] * xk[None]
      x_ref[k, 0] = xk
  return kernel


@functools.lru_cache(maxsize=32)
def _build_factor(n, tiles, dtype_name, sub=_SUB):
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  dtype = jnp.dtype(dtype_name)
  return pl.pallas_call(
      _factor_kernel(n),
      out_shape=jax.ShapeDtypeStruct((n, n, tiles, sub, _LANES), dtype),
      grid=(tiles,),
      in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
      out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
      scratch_shapes=[
          pltpu.VMEM((n, n, sub, _LANES), dtype),
          pltpu.SemaphoreType.DMA((2,)),
      ],
  )


@functools.lru_cache(maxsize=32)
def _build_resolve(n, tiles, dtype_name, sub=_SUB):
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  dtype = jnp.dtype(dtype_name)
  return pl.pallas_call(
      _resolve_kernel(n),
      out_shape=jax.ShapeDtypeStruct((n, tiles, sub, _LANES), dtype),
      grid=(tiles,),
      in_specs=[
          pl.BlockSpec((n, n, 1, sub, _LANES), lambda i: (0, 0, i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((n, 1, sub, _LANES), lambda i: (0, i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((n, 1, sub, _LANES), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
      scratch_shapes=[pltpu.VMEM((n, sub, _LANES), dtype)],
  )


def _pad_tiles(x_t, b, fill_eye=None, sub=None):
  """Pads the trailing batch axis to a multiple of the tile and reshapes
  the batch into (tiles, sub, 128).  sub defaults to _pick_sub(b), so the
  planner's small-batch shapes (multiples of 128 up to 1024) tile exactly
  and the pad (with its eye-fill fusion and 4x-inflated retile copy)
  vanishes; pass the matrix-aware _pick_sub(b, n) so paired matrix/rhs
  calls agree."""
  if sub is None:
    sub = _pick_sub(b)
  tile = sub * _LANES
  b_pad = -(-b // tile) * tile
  if b_pad != b:
    pad = [(0, 0)] * (x_t.ndim - 1) + [(0, b_pad - b)]
    x_t = jnp.pad(x_t, pad)
    if fill_eye is not None:
      n = x_t.shape[0]
      eye = jnp.eye(n, dtype=x_t.dtype)[:, :, None]
      mask = (jnp.arange(b_pad) >= b)[None, None, :]
      x_t = jnp.where(mask, eye, x_t)
  tiles = b_pad // tile
  return (x_t.reshape(x_t.shape[:-1] + (tiles, sub, _LANES)), tiles, b_pad,
          sub)


def cholesky_factor_b(h):
  """(..., n, n) SPD -> packed factor (..., n, n) for cholesky_resolve_b.

  Rank-polymorphic: every leading axis is a batch axis (nested vmaps —
  e.g. env batch x candidate population — compose through custom_vmap by
  stacking leading dims).  TPU-only batched Pallas path (lower triangle =
  L, diagonal = 1/L[k,k]); on other backends returns h itself (resolve
  falls back to a dense solve).  Gradients are not defined through the
  packed factor — use cholesky_solve for differentiable paths."""
  if jax.default_backend() != 'tpu' or h.dtype not in (jnp.float32,):
    return h
  batch_shape = h.shape[:-2]
  n = h.shape[-1]
  h2 = h.reshape((-1, n, n))
  b = h2.shape[0]
  h_t, tiles, b_pad, sub = _pad_tiles(jnp.moveaxis(h2, 0, -1), b,
                                      fill_eye=True, sub=_pick_sub(b, n))
  l_t = _build_factor(n, tiles, str(h.dtype), sub)(h_t)
  out = jnp.moveaxis(l_t.reshape(n, n, b_pad)[..., :b], -1, 0)
  return out.reshape(batch_shape + (n, n))


def cholesky_resolve_b(l, g):
  """Solves with a packed factor from cholesky_factor_b: (..., n, n),
  (..., n) -> (..., n); leading axes are batch axes."""
  if jax.default_backend() != 'tpu' or l.dtype not in (jnp.float32,):
    l2 = l.reshape((-1,) + l.shape[-2:])
    g2 = g.reshape((-1,) + g.shape[-1:])
    out = jax.vmap(lambda hh, gg: jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(hh), gg))(l2, g2)
    return out.reshape(g.shape)
  batch_shape = l.shape[:-2]
  n = l.shape[-1]
  l2 = l.reshape((-1, n, n))
  g2 = g.reshape((-1, n))
  b = l2.shape[0]
  l_t, tiles, b_pad, sub = _pad_tiles(jnp.moveaxis(l2, 0, -1), b,
                                      fill_eye=True, sub=_pick_sub(b, n))
  g_t, _, _, _ = _pad_tiles(jnp.moveaxis(g2, 0, -1), b, sub=sub)
  x_t = _build_resolve(n, tiles, str(l.dtype), sub)(l_t, g_t)
  out = jnp.moveaxis(x_t.reshape(n, b_pad)[:, :b], -1, 0)
  return out.reshape(batch_shape + (n,))


@jax.custom_batching.custom_vmap
def cholesky_factor(h: jax.Array) -> jax.Array:
  """Opaque factor for cholesky_resolve (pair them; formats differ by
  backend).  Unbatched / non-TPU: the matrix itself (resolve factorizes).
  Batched on TPU: the packed Pallas factor.  NOT differentiable — keep
  cholesky_solve for autodiff paths.

  The vmap rule recursively re-enters this same custom_vmap function, so
  NESTED vmaps (e.g. env batch x candidate population in the batched
  closed-loop evaluator) peel one batch axis per level and the body only
  ever executes once, with every batch axis stacked in the leading dims —
  vmap'ing the Pallas call itself is unsupported (ANY-space operands)."""
  if h.ndim == 2:
    return h
  return cholesky_factor_b(h)


@cholesky_factor.def_vmap
def _cholesky_factor_vmap(axis_size, in_batched, h):
  if not in_batched[0]:
    h = jnp.broadcast_to(h, (axis_size,) + h.shape)
  return cholesky_factor(h), True


@jax.custom_batching.custom_vmap
def cholesky_resolve(f: jax.Array, g: jax.Array) -> jax.Array:
  """Solves H x = g given f = cholesky_factor(H)."""
  if f.ndim == 2:
    return jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(f), g)
  return cholesky_resolve_b(f, g)


@cholesky_resolve.def_vmap
def _cholesky_resolve_vmap(axis_size, in_batched, f, g):
  f_b, g_b = in_batched
  if not f_b:
    f = jnp.broadcast_to(f, (axis_size,) + f.shape)
  if not g_b:
    g = jnp.broadcast_to(g, (axis_size,) + g.shape)
  return cholesky_resolve(f, g), True


@jax.custom_jvp
def cholesky_resolve_const(f: jax.Array, g: jax.Array) -> jax.Array:
  """cholesky_resolve under a constant-preconditioner JVP rule.

  The modified-Newton stale-factor path treats the packed factor as a
  PRECONDITIONER: at the solver's fixed point the gradient it multiplies
  vanishes, so tangent contributions through the factor vanish with it
  (the implicit-function derivative is preconditioner-independent).  The
  JVP is therefore the primal's two triangular substitutions applied to
  the tangent rhs — d(solve(f, g)) = solve(f, dg), df dropped — which
  lets forward-mode AD (the iLQR linearizer) run through the
  refactor_every>1 Newton path at substitution cost instead of pinning
  the planner to the full-factorization path (VERDICT r4 weak #2).

  Callers must stop_gradient the Hessian feeding cholesky_factor (the
  packed factor itself has no AD rules).
  """
  return cholesky_resolve(f, g)


@cholesky_resolve_const.defjvp
def _cholesky_resolve_const_jvp(primals, tangents):
  f, g = primals
  _, dg = tangents
  return cholesky_resolve(f, g), cholesky_resolve(f, dg)


def _batched_impl(h, g):
  """(..., n, n), (..., n) -> (..., n); leading axes are batch axes."""
  n = h.shape[-1]
  batch_shape = h.shape[:-2]
  use_pallas = os.environ.get('DEXTERITY_TPU_PALLAS_LINALG', '1') == '1'
  if (not use_pallas or jax.default_backend() != 'tpu'
      or n > _max_pallas_n() or h.dtype not in (jnp.float32,)):
    out = jax.vmap(
        lambda hh, gg: jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(hh), gg))(
                h.reshape((-1, n, n)), g.reshape((-1, n)))
    return out.reshape(g.shape)
  h = h.reshape((-1, n, n))
  g = g.reshape((-1, n))
  b = h.shape[0]
  h_t, tiles, b_pad, sub = _pad_tiles(jnp.moveaxis(h, 0, -1), b,
                                      fill_eye=True, sub=_pick_sub(b, n))
  g_t, _, _, _ = _pad_tiles(jnp.moveaxis(g, 0, -1), b, sub=sub)
  x_t = _build_pallas(n, tiles, str(h.dtype), sub)(h_t, g_t)
  x = x_t.reshape(n, b_pad)[:, :b]
  return jnp.moveaxis(x, -1, 0).reshape(batch_shape + (n,))


@jax.custom_batching.custom_vmap
def _raw_cholesky_solve(h: jax.Array, g: jax.Array) -> jax.Array:
  if h.ndim == 2:
    return jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(h), g)
  return _batched_impl(h, g)


@_raw_cholesky_solve.def_vmap
def _cholesky_solve_vmap(axis_size, in_batched, h, g):
  # Recursive re-entry: nested vmaps peel one batch axis per level (see
  # cholesky_factor docstring).
  h_b, g_b = in_batched
  if not (h_b and g_b):
    h = h if h_b else jnp.broadcast_to(h, (axis_size,) + h.shape)
    g = g if g_b else jnp.broadcast_to(g, (axis_size,) + g.shape)
  return _raw_cholesky_solve(h, g), True


def cholesky_solve(h: jax.Array, g: jax.Array) -> jax.Array:
  """Solves H x = g for SPD H (n, n); batch via vmap hits the TPU kernel.

  Wrapped in lax.custom_linear_solve so reverse-mode autodiff works
  (custom_vmap alone is not differentiable — the iLQR planner
  differentiates through the contact step): gradients are computed by
  implicit differentiation, re-using this same solver for the cotangent
  system (H symmetric).
  """
  def mv(x):
    return h @ x

  def solve_fn(_, b):
    return _raw_cholesky_solve(h, b)

  return jax.lax.custom_linear_solve(mv, g, solve=solve_fn, symmetric=True)
