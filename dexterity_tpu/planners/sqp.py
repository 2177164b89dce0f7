"""Gauss-Newton SQP MPC over the batched contact physics.

BASELINE.json configs[3] names "iLQR/SQP MPC, H=32"; this is the SQP half.
Where iLQR solves the quadratic model by a Riccati recursion and handles
the control box by clamping inside the forward pass, SQP condenses the
SAME linearized model (fx, fu, cx, cu from planners/ilqr.py's forward-mode
linearizer) onto the control sequence and solves ONE box-constrained QP
per outer iteration to optimality:

    min_dU  g'dU + 1/2 dU' Hqp dU     s.t.  lo <= u + dU <= hi

with g the exact condensed gradient (adjoint recursion) and
Hqp = reg * B'B + (2*ctrl_cost + reg) * I the Gauss-Newton Hessian of the
identity-regularized stage model — exactly the quadratic model iLQR's
backward pass accumulates (qxx = fx' vxx fx + reg*I telescopes to
reg * B'B condensed), so the two methods optimize the same subproblem and
differ only in how the box constraints are honored.  The QP is solved by
projected Newton with a gradient-based active set (the TPU-friendly
active-set shape: masked rows + identity, one batched Cholesky per
iteration, no dynamic shapes), followed by a merit line search on the
TRUE nonlinear rollout (alpha = 0 candidate included, so an iteration
never regresses) and Levenberg reg adaptation.

Reference for the config this covers: BASELINE.json configs[3]
(successive goal reorientation, H=32).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from dexterity_tpu.planners import ilqr as ilqr_lib


@dataclasses.dataclass(frozen=True)
class SQPConfig(ilqr_lib.ILQRConfig):
  # Projected-Newton iterations on the condensed QP per outer iteration.
  qp_iterations: int = 4


class SQP(ilqr_lib.ILQR):
  """SQP MPC over a GoalTask (same task/model contract as ILQR)."""

  def __init__(self, task, config: SQPConfig = SQPConfig(), dtype=None,
               extra_cost_fn=None):
    super().__init__(task, config, dtype=dtype, extra_cost_fn=extra_cost_fn)

  def solve(self, data, goal, state):
    """One MPC solve: SQP outer iterations from the shifted nominal."""
    cfg = self.config
    template = data
    x0 = self._pack(data)
    nx, nu, h = self.nx, self.nu, cfg.horizon
    dtype = self.dtype

    def rollout_states(us):
      def body(x, u):
        return self._f(template, x, u), x
      _, xs = jax.lax.scan(body, x0, us)
      return xs                                  # (H, nx) pre-step states

    def linearize(x, u):
      z = jnp.concatenate([x, u])

      def f_c(zz):
        return (self._f(template, zz[:nx], zz[nx:]),
                self._cost(template, goal, zz[:nx], zz[nx:]))

      fz, cz = jax.jacfwd(f_c)(z)
      return fz[:, :nx], fz[:, nx:], cz[:nx], cz[nx:]

    def rollout_cost(us):
      def body(x, u):
        c = self._cost(template, goal, x, u)
        return self._f(template, x, u), c
      _, cs = jax.lax.scan(body, x0, us)
      return jnp.sum(cs)

    def sqp_iter(carry, _):
      us, cost_prev, reg = carry
      xs = rollout_states(us)
      fx, fu, cx, cu = jax.vmap(linearize)(xs, us)

      # Condensed gradient via the adjoint recursion:
      # lam_t = cx_t + fx_t' lam_{t+1};  g_t = cu_t + fu_t' lam_{t+1}.
      def adjoint(lam, inp):
        fx_t, fu_t, cx_t, cu_t = inp
        g_t = cu_t + fu_t.T @ lam
        lam_prev = cx_t + fx_t.T @ lam
        return lam_prev, g_t

      _, g_steps = jax.lax.scan(adjoint, jnp.zeros(nx, dtype),
                                (fx, fu, cx, cu), reverse=True)
      g = g_steps.reshape(h * nu)

      # Sensitivity B: dX = B dU, B[t] row-block built by the forward
      # recursion B[t+1] = fx_t B[t] + e_t fu_t (carry is one (nx, H*nu)
      # row block; H matmuls of (nx, nx) x (nx, H*nu)).
      def sens(bt, inp):
        t, fx_t, fu_t = inp
        bt_next = fx_t @ bt
        col = jax.nn.one_hot(t, h, dtype=dtype)          # (H,)
        bt_next = bt_next + jnp.kron(col[None, :], fu_t)  # place fu at t
        return bt_next, bt
      ts = jnp.arange(h)
      _, b_rows = jax.lax.scan(sens, jnp.zeros((nx, h * nu), dtype),
                               (ts, fx, fu))
      big_b = b_rows.reshape(h * nx, h * nu)

      # Gauss-Newton Hessian of the identity-regularized stage model.
      hqp = (reg * (big_b.T @ big_b)
             + (2.0 * cfg.ctrl_cost + reg)
             * jnp.eye(h * nu, dtype=dtype))

      lo = jnp.tile(self._lo, h) - us.reshape(h * nu)
      hi = jnp.tile(self._hi, h) - us.reshape(h * nu)

      # Projected Newton on the box QP: gradient active set, masked-row
      # Cholesky solve on the free subspace, clip, repeat.
      def qp_iter(du, _):
        gq = g + hqp @ du
        at_lo = (du <= lo + 1e-12) & (gq > 0)
        at_hi = (du >= hi - 1e-12) & (gq < 0)
        free = ~(at_lo | at_hi)
        fm = free.astype(dtype)
        hf = hqp * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
        step = -jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(hf), gq * fm)
        du_new = jnp.clip(du + step * fm, lo, hi)
        return du_new, ()

      du0 = jnp.zeros(h * nu, dtype)
      du, _ = jax.lax.scan(qp_iter, du0, (), length=cfg.qp_iterations)

      # Merit line search on the true rollout (alpha = 0 included).
      alphas = jnp.concatenate([
          jnp.zeros(1, dtype),
          2.0 ** -jnp.arange(cfg.line_search_steps - 1, dtype=dtype)])
      du_h = du.reshape(h, nu)
      cands = jnp.clip(us[None] + alphas[:, None, None] * du_h[None],
                       self._lo, self._hi)
      costs = jax.vmap(rollout_cost)(cands)
      costs_safe = jnp.where(jnp.isnan(costs), jnp.inf, costs)
      best = jnp.argmin(costs_safe)
      ok = jnp.isfinite(costs_safe[best])
      us_out = jnp.where(ok, cands[best], us)
      cost_out = jnp.where(ok, costs_safe[best],
                           jnp.where(jnp.isfinite(cost_prev), cost_prev,
                                     costs_safe[0]))
      cost0 = costs_safe[0]
      improved = ok & (costs_safe[best] < cost0 - 1e-9 * jnp.abs(cost0))
      reg_new = jnp.where(improved,
                          jnp.maximum(reg * 0.5, cfg.reg_min),
                          jnp.minimum(reg * 4.0, cfg.reg_max))
      return (us_out, cost_out, reg_new), cost_out

    init = (state.us, jnp.asarray(jnp.inf, dtype),
            jnp.asarray(cfg.reg_init, dtype))
    (us, final_cost, _), _ = jax.lax.scan(sqp_iter, init, (),
                                          length=cfg.iterations)
    action = us[0]
    us_next = jnp.concatenate([us[1:], us[-1:]])
    return action, ilqr_lib.ILQRState(us=us_next, cost=final_cost)
