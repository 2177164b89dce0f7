"""iLQR trajectory optimizer over the batched contact physics.

First-order planner complementing predictive sampling (BASELINE.json
configs: "Successive goal reorientation ..., iLQR/SQP MPC, H=32").  The
dynamics step is fully differentiable (constraint Newton iterations are
unrolled scans), so linearizations come from jax.jacobian; the backward
Riccati recursion is a lax.scan with Levenberg-style regularization and a
parallel forward line search over step sizes.

State chart: x = [qpos, qvel] (quaternions re-normalized inside the step;
derivatives live in the ambient chart, which is standard for MJPC-style
iLQR on quaternion states).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu import task as task_lib
from dexterity_tpu.core import types as T
from dexterity_tpu.physics import step as physics_step
from dexterity_tpu.utils.structs import pytree_dataclass


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
  horizon: int = 16
  iterations: int = 4          # iLQR outer iterations per solve
  reg: float = 1e-6            # Hessian regularization
  line_search_steps: int = 6   # parallel alphas 1, 1/2, ... 1/2^k
  ctrl_cost: float = 1e-3      # quadratic control penalty
  solver_iterations: int = 2   # reduced-fidelity planning physics
  ls_iterations: int = 4


@pytree_dataclass
class ILQRState:
  us: jax.Array                # (H, nu) nominal controls
  cost: jax.Array              # () last trajectory cost


class ILQR:
  """iLQR MPC over a GoalTask."""

  def __init__(self, task: task_lib.GoalTask,
               config: ILQRConfig = ILQRConfig(), dtype=None):
    self.task = task
    self.config = config
    model = task.compile()
    self.model = model.replace(opt=model.opt.replace(
        solver_iterations=config.solver_iterations,
        ls_iterations=config.ls_iterations))
    self.dtype = dtype if dtype is not None else jnp.zeros(0).dtype
    spec = task.action_spec(model)
    self._lo = jnp.asarray(np.where(np.isfinite(spec.minimum),
                                    spec.minimum, -1.0), self.dtype)
    self._hi = jnp.asarray(np.where(np.isfinite(spec.maximum),
                                    spec.maximum, 1.0), self.dtype)
    self.nu = spec.shape[0]
    ids = []
    for eff in task.hand_effectors:
      ids.extend(eff._indices.tolist())
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
    d = physics_step.step_n(self.model, d, self.task.n_substeps)
    return self._pack(d)

  def _cost(self, template: T.Data, goal, x: jax.Array,
            u: jax.Array) -> jax.Array:
    d = self._unpack(template, x)
    d = physics_step.fwd_position(self.model, d)
    gen = self.task.goal_generator
    dist = gen.goal_distance(goal, gen.current_state(self.model, d))
    from dexterity_tpu.planners.predictive_sampling import _reward_state
    r = self.task.get_reward(self.model, d, _reward_state(goal, dist))
    return -r + self.config.ctrl_cost * jnp.sum(u * u)

  # -- solver ---------------------------------------------------------------

  def init_state(self) -> ILQRState:
    mid = (self._lo + self._hi) / 2.0
    return ILQRState(us=jnp.tile(mid, (self.config.horizon, 1)),
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

    def rollout(us):
      def body(x, u):
        xn = self._f(template, x, u)
        return xn, x
      _, xs = jax.lax.scan(body, x0, us)
      return xs                                    # (H, nx) pre-step states

    def linearize(x, u):
      fx = jax.jacrev(lambda xx: self._f(template, xx, u))(x)
      fu = jax.jacrev(lambda uu: self._f(template, x, uu))(u)
      cx = jax.grad(lambda xx: self._cost(template, goal, xx, u))(x)
      cu = jax.grad(lambda uu: self._cost(template, goal, x, uu))(u)
      return fx, fu, cx, cu

    def ilqr_iter(us, _):
      xs = rollout(us)
      fx, fu, cx, cu = jax.vmap(linearize)(xs, us)

      # Backward pass (Gauss-Newton: cost Hessians approximated by
      # identity-regularized terms; gradients exact).
      def backward(carry, inp):
        vx, vxx = carry
        fx_t, fu_t, cx_t, cu_t = inp
        qx = cx_t + fx_t.T @ vx
        qu = cu_t + fu_t.T @ vx
        qxx = fx_t.T @ vxx @ fx_t + cfg.reg * jnp.eye(self.nx,
                                                      dtype=self.dtype)
        quu = fu_t.T @ vxx @ fu_t + (2 * cfg.ctrl_cost + cfg.reg) * jnp.eye(
            self.nu, dtype=self.dtype)
        qux = fu_t.T @ vxx @ fx_t
        chol = jax.scipy.linalg.cho_factor(quu)
        k = -jax.scipy.linalg.cho_solve(chol, qu)
        kk = -jax.scipy.linalg.cho_solve(chol, qux)
        vx_new = qx + kk.T @ quu @ k + kk.T @ qu + qux.T @ k
        vxx_new = qxx + kk.T @ quu @ kk + kk.T @ qux + qux.T @ kk
        vxx_new = 0.5 * (vxx_new + vxx_new.T)
        return (vx_new, vxx_new), (k, kk)

      init = (jnp.zeros(self.nx, self.dtype),
              cfg.reg * jnp.eye(self.nx, dtype=self.dtype))
      _, (ks, kks) = jax.lax.scan(backward, init, (fx, fu, cx, cu),
                                  reverse=True)

      # Forward line search over parallel step sizes.
      def forward(alpha):
        def body(carry, inp):
          x = carry
          u_nom, x_nom, k_t, kk_t = inp
          u = jnp.clip(u_nom + alpha * k_t + kk_t @ (x - x_nom),
                       self._lo, self._hi)
          xn = self._f(template, x, u)
          c = self._cost(template, goal, x, u)
          return xn, (u, c)
        _, (us_new, cs) = jax.lax.scan(body, x0, (us, xs, ks, kks))
        return us_new, jnp.sum(cs)

      alphas = 2.0 ** -jnp.arange(cfg.line_search_steps, dtype=self.dtype)
      us_cands, costs = jax.vmap(forward)(alphas)
      cost0 = self.trajectory_cost(template, goal, x0, us)
      best = jnp.argmin(costs)
      improved = costs[best] < cost0
      us_out = jnp.where(improved, us_cands[best], us)
      return us_out, jnp.minimum(costs[best], cost0)

    us, costs = jax.lax.scan(ilqr_iter, state.us, (),
                             length=cfg.iterations)
    final_cost = costs[-1]
    action = us[0]
    # Receding horizon shift.
    us_next = jnp.concatenate([us[1:], us[-1:]])
    return action, ILQRState(us=us_next, cost=final_cost)
