"""iLQR trajectory optimizer over the batched contact physics.

First-order planner complementing predictive sampling (BASELINE.json
configs: "Successive goal reorientation ..., iLQR/SQP MPC, H=32").  The
dynamics step is fully differentiable (constraint Newton iterations are
unrolled scans; the Cholesky solves are lax.custom_linear_solve, so
derivatives come from implicit differentiation), so linearizations come
from one forward-mode jacobian over the combined (x, u) input — (nx+nu)
batched JVPs stream through the substep scan without storing reverse-mode
residuals.  The backward Riccati recursion is a lax.scan with adaptive
Levenberg regularization and a parallel forward line search (alpha = 0 is
always a candidate, so an iteration can never regress).

Planning runs on the same reduced model as predictive sampling
(planners/common.py): coarser timestep, smaller contact budget,
moving-base-only collision pairs, and (since round 5) the modified-Newton
stale-factor path — the resolve carries a constant-preconditioner JVP
(linalg_pallas.cholesky_resolve_const), so linearization costs
substitutions, not per-tangent factorizations.

State chart: x = [qpos, qvel] (quaternions re-normalized inside the step;
derivatives live in the ambient chart, which is standard for MJPC-style
iLQR on quaternion states).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu import task as task_lib
from dexterity_tpu.core import types as T
from dexterity_tpu.physics import step as physics_step
from dexterity_tpu.planners import common
from dexterity_tpu.utils.structs import pytree_dataclass


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
  horizon: int = 16
  iterations: int = 4          # iLQR outer iterations per solve
  reg_init: float = 1e-4       # Levenberg regularization (adapted in-solve)
  reg_min: float = 1e-8
  reg_max: float = 1e4
  line_search_steps: int = 6   # parallel alphas 0, 1, 1/2, ... 1/2^(k-2)
  ctrl_cost: float = 1e-3      # quadratic control penalty
  # Reduced-fidelity planning physics (same knobs as predictive sampling).
  # refactor_every>1 is AD-legal since round 5: the stale-factor resolve
  # carries a constant-preconditioner JVP (linalg_pallas.
  # cholesky_resolve_const) — tangents through the factor vanish at the
  # Newton fixed point, so the nx+nu forward-mode linearization runs at
  # substitution cost instead of paying a fresh factorization per
  # iteration (the round-4 pin that kept hybrid iLQR 6x below real time).
  solver_iterations: int = 4
  ls_iterations: int = 6
  solver_refactor_every: int = 4
  plan_substeps: Optional[int] = None
  plan_midphase_cap: Optional[int] = 16
  plan_contact_top_k: Optional[int] = 16
  plan_implicit_damping: bool = True
  plan_self_collision: bool = False


@pytree_dataclass
class ILQRState:
  us: jax.Array                # (H, nu) nominal controls
  cost: jax.Array              # () last trajectory cost


class ILQR:
  """iLQR MPC over a GoalTask.

  Args:
    extra_cost_fn: optional (model, data, goal) -> scalar planning cost
      added to the per-step cost (MJPC-style shaping richer than the env
      reward; mirror of PredictiveSampling's extra_reward_fn but in cost
      convention — positive = penalized).
  """

  def __init__(self, task: task_lib.GoalTask,
               config: ILQRConfig = ILQRConfig(), dtype=None,
               extra_cost_fn: Optional[Callable] = None):
    self.task = task
    self.config = config
    self.extra_cost_fn = extra_cost_fn
    self.model, self.n_plan_substeps = common.reduced_planning_model(
        task,
        solver_iterations=config.solver_iterations,
        ls_iterations=config.ls_iterations,
        solver_refactor_every=config.solver_refactor_every,
        plan_substeps=config.plan_substeps,
        plan_midphase_cap=config.plan_midphase_cap,
        plan_contact_top_k=config.plan_contact_top_k,
        plan_implicit_damping=config.plan_implicit_damping,
        plan_self_collision=config.plan_self_collision)
    model = self.model
    self.dtype = dtype if dtype is not None else jnp.zeros(0).dtype
    spec = task.action_spec(model)
    self._lo = jnp.asarray(np.where(np.isfinite(spec.minimum),
                                    spec.minimum, -1.0), self.dtype)
    self._hi = jnp.asarray(np.where(np.isfinite(spec.maximum),
                                    spec.maximum, 1.0), self.dtype)
    self.nu = spec.shape[0]
    ids = []
    for eff in task.hand_effectors:
      ids.extend(eff.indices().tolist())
    self._act_ids = np.asarray(ids, np.int32)
    self.nx = model.nq + model.nv

  # -- dynamics in the flat chart -----------------------------------------

  def _pack(self, data: T.Data) -> jax.Array:
    return jnp.concatenate([data.qpos, data.qvel])

  def _unpack(self, template: T.Data, x: jax.Array) -> T.Data:
    nq = self.model.nq
    return template.replace(qpos=x[:nq], qvel=x[nq:])

  def _f(self, template: T.Data, x: jax.Array, u: jax.Array) -> jax.Array:
    d = self._unpack(template, x)
    ctrl = d.ctrl.at[jnp.asarray(self._act_ids)].set(
        jnp.clip(u, self._lo, self._hi))
    d = d.replace(ctrl=ctrl)
    d = physics_step.step_n(self.model, d, self.n_plan_substeps,
                            refresh=self.task.plan_refresh)
    return self._pack(d)

  def _cost(self, template: T.Data, goal, x: jax.Array,
            u: jax.Array) -> jax.Array:
    d = self._unpack(template, x)
    d = physics_step.fwd_position(self.model, d)
    gen = self.task.goal_generator
    dist = gen.goal_distance(goal, gen.current_state(self.model, d))
    from dexterity_tpu.planners.predictive_sampling import _reward_state
    r = self.task.get_reward(self.model, d, _reward_state(goal, dist))
    c = -r + self.config.ctrl_cost * jnp.sum(u * u)
    if self.extra_cost_fn is not None:
      c = c + self.extra_cost_fn(self.model, d, goal)
    return c

  # -- solver ---------------------------------------------------------------

  def init_state(self) -> ILQRState:
    mid = (self._lo + self._hi) / 2.0
    return ILQRState(us=jnp.tile(mid, (self.config.horizon, 1)),
                     cost=jnp.asarray(jnp.inf, self.dtype))

  def warm_start(self, plan: jax.Array) -> ILQRState:
    """ILQRState seeded from another planner's action sequence (H', nu) —
    the MJPC-standard hybrid: predictive sampling explores, iLQR refines.
    Plans shorter than the horizon repeat their last action."""
    h = self.config.horizon
    us = plan[:h]
    if us.shape[0] < h:
      us = jnp.concatenate(
          [us, jnp.tile(us[-1:], (h - us.shape[0], 1))])
    return ILQRState(us=jnp.asarray(us, self.dtype),
                     cost=jnp.asarray(jnp.inf, self.dtype))

  def trajectory_cost(self, template, goal, x0, us):
    def body(x, u):
      c = self._cost(template, goal, x, u)
      return self._f(template, x, u), c
    xT, cs = jax.lax.scan(body, x0, us)
    return jnp.sum(cs)

  def solve(self, data: T.Data, goal, state: ILQRState):
    """One MPC solve: iLQR iterations from the shifted nominal plan."""
    cfg = self.config
    template = data
    x0 = self._pack(data)
    nx, nu = self.nx, self.nu

    def rollout(us):
      def body(x, u):
        xn = self._f(template, x, u)
        return xn, x
      _, xs = jax.lax.scan(body, x0, us)
      return xs                                    # (H, nx) pre-step states

    def linearize(x, u):
      """One forward-mode jacobian over the combined (x, u) input: nx+nu
      batched JVPs through the substep scan (reverse mode would store the
      full Newton-solver residuals for every substep)."""
      z = jnp.concatenate([x, u])

      def f_c(zz):
        fx = self._f(template, zz[:nx], zz[nx:])
        cx = self._cost(template, goal, zz[:nx], zz[nx:])
        return fx, cx

      (fz, cz) = jax.jacfwd(f_c)(z)
      return fz[:, :nx], fz[:, nx:], cz[:nx], cz[nx:]

    def ilqr_iter(carry, _):
      us, cost_prev, reg = carry
      xs = rollout(us)
      fx, fu, cx, cu = jax.vmap(linearize)(xs, us)

      # Backward pass (Gauss-Newton: cost Hessians approximated by
      # identity-regularized terms; gradients exact).  Regularization is
      # applied Tassa-style through the value function (vxx + reg*I inside
      # the Q terms that build the gains): with stiff contact jacobians
      # (|fx| ~ 1e3) a plain quu shift is dominated by fu'vxx fu and the
      # gains explode.
      def backward(carry, inp):
        vx, vxx = carry
        fx_t, fu_t, cx_t, cu_t = inp
        vxx_reg = vxx + reg * jnp.eye(nx, dtype=self.dtype)
        qx = cx_t + fx_t.T @ vx
        qu = cu_t + fu_t.T @ vx
        qxx = fx_t.T @ vxx @ fx_t + reg * jnp.eye(nx, dtype=self.dtype)
        quu = fu_t.T @ vxx_reg @ fu_t + (2 * cfg.ctrl_cost + reg) * jnp.eye(
            nu, dtype=self.dtype)
        qux = fu_t.T @ vxx_reg @ fx_t
        chol = jax.scipy.linalg.cho_factor(quu)
        k = -jax.scipy.linalg.cho_solve(chol, qu)
        kk = -jax.scipy.linalg.cho_solve(chol, qux)
        vx_new = qx + kk.T @ quu @ k + kk.T @ qu + qux.T @ k
        vxx_new = qxx + kk.T @ quu @ kk + kk.T @ qux + qux.T @ kk
        vxx_new = 0.5 * (vxx_new + vxx_new.T)
        return (vx_new, vxx_new), (k, kk)

      init = (jnp.zeros(nx, self.dtype),
              reg * jnp.eye(nx, dtype=self.dtype))
      _, (ks, kks) = jax.lax.scan(backward, init, (fx, fu, cx, cu),
                                  reverse=True)

      # Forward line search over parallel step sizes.  alpha = 0 disables
      # the feedback term too: it replays the nominal bit-exactly, giving
      # the nominal cost for free AND a candidate the argmin can always
      # fall back to (with feedback on, float drift times 1e3-scale
      # contact gains can diverge even at alpha = 0).
      def forward(alpha):
        def body(carry, inp):
          x = carry
          u_nom, x_nom, k_t, kk_t = inp
          # Selection (not multiplication) so alpha = 0 replays the
          # nominal even when a diverged backward pass left NaN gains
          # (0 * NaN would poison the fallback candidate).
          upd = jnp.where(alpha > 0,
                          alpha * k_t + kk_t @ (x - x_nom),
                          jnp.zeros_like(u_nom))
          u = jnp.clip(u_nom + upd, self._lo, self._hi)
          xn = self._f(template, x, u)
          c = self._cost(template, goal, x, u)
          return xn, (u, c)
        _, (us_new, cs) = jax.lax.scan(body, x0, (us, xs, ks, kks))
        return us_new, jnp.sum(cs)

      alphas = jnp.concatenate([
          jnp.zeros(1, self.dtype),
          2.0 ** -jnp.arange(cfg.line_search_steps - 1, dtype=self.dtype)])
      us_cands, costs = jax.vmap(forward)(alphas)
      # NaN-safe selection: a diverged candidate never wins; if every
      # candidate diverged (nominal included), keep the incoming plan.
      costs_safe = jnp.where(jnp.isnan(costs), jnp.inf, costs)
      best = jnp.argmin(costs_safe)
      ok = jnp.isfinite(costs_safe[best])
      us_out = jnp.where(ok, us_cands[best], us)
      cost_out = jnp.where(ok, costs_safe[best],
                           jnp.where(jnp.isfinite(cost_prev), cost_prev,
                                     costs_safe[0]))
      cost0 = costs_safe[0]                         # nominal (alpha = 0)
      improved = ok & (costs_safe[best] < cost0 - 1e-9 * jnp.abs(cost0))
      # Levenberg adaptation: success -> trust the quadratic model more.
      reg_new = jnp.where(improved,
                          jnp.maximum(reg * 0.5, cfg.reg_min),
                          jnp.minimum(reg * 4.0, cfg.reg_max))
      return (us_out, cost_out, reg_new), cost_out

    init_carry = (state.us, jnp.asarray(jnp.inf, self.dtype),
                  jnp.asarray(cfg.reg_init, self.dtype))
    (us, final_cost, _), _ = jax.lax.scan(ilqr_iter, init_carry, (),
                                          length=cfg.iterations)
    action = us[0]
    # Receding horizon shift.
    us_next = jnp.concatenate([us[1:], us[-1:]])
    return action, ILQRState(us=us_next, cost=final_cost)
