"""Predictive-sampling MPC (MJPC-style zero-order planner).

New first-class component per the north star (BASELINE.json): thousands of
vmapped candidate rollouts per solve on one chip, population shardable
across a device mesh (see dexterity_tpu.parallel.sharding).

One `solve` = sample N candidate action sequences around the nominal plan
(Gaussian noise, first candidate = nominal), roll each out H control steps
through the batched physics, score by discounted task reward, keep the
best as the new nominal, and emit its first action.  Everything is one
jitted program; the candidate axis is embarrassingly parallel.
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


@dataclasses.dataclass(frozen=True)
class PredictiveSamplingConfig:
  horizon: int = 10            # control steps to look ahead
  num_samples: int = 512       # candidate action sequences per solve
  noise_scale: float = 0.2     # exploration std, in units of ctrl range
  # Exploration noise parameterization: noise is sampled at `num_knots`
  # control points spanning the horizon and linearly interpolated to all H
  # steps (MJPC-style spline plans).  Temporally-correlated smooth
  # perturbations explore low-frequency hand motions far more efficiently
  # than per-step white noise; 0 disables (white noise).
  num_knots: int = 4
  # MPPI-style update: nominal <- softmax-weighted average of candidates at
  # this temperature (in units of the return spread); 0 keeps the argmax
  # (vanilla predictive sampling).
  temperature: float = 0.0
  # Refinement iterations per solve (CEM-style): each iteration samples
  # num_samples candidates around the current nominal, takes the
  # best/weighted plan, and shrinks the noise by `noise_decay` for the
  # next round.  Total rollouts = iterations * num_samples.  Two
  # iterations are the decisive closed-loop lever on reorient (every
  # single-iteration config measured <=50% goal success; 2x256 solves
  # 20/20 — see EVAL_CLOSED_LOOP_r03.json).
  iterations: int = 2
  noise_decay: float = 0.5
  # One-time penalty applied in the rollout at the step the task's failure
  # predicate first fires (e.g. the reorient cube hitting the ground).
  # Zeroed future rewards alone under-penalize dropping when the per-step
  # reward is small relative to a lucky rotation's payoff.
  failure_penalty: float = 30.0
  # Physics fidelity for planning rollouts (MJPC-style reduced solver; the
  # Newton warmstart carries across substeps).  4/6 is the measured
  # closed-loop floor for reorient: 2/3 drops the cube (35-50% goal
  # success), 3/4 converges 2x slower (95%), 4/6 solves 20/20.
  solver_iterations: int = 4
  ls_iterations: int = 6
  # Refactorize the Newton Hessian every k-th iteration; intermediate
  # iterations re-solve against the stale packed factor (substitution
  # only).  With 4 iterations, k=2 halves the factorization+Hessian-build
  # cost per substep (see Option.solver_refactor_every).
  solver_refactor_every: int = 2
  # Planning-model substeps per control step.  The task model integrates
  # control_dt / n_substeps (reorient: 5 x 5 ms); the planner may roll out
  # coarser physics (MJPC plans this task at ~10 ms).  None keeps the task
  # value; e.g. 3 -> 8.3 ms planning timestep, ~1.7x faster solves.
  plan_substeps: Optional[int] = None
  # Planning-model contact budget (midphase keep per kernel group /
  # constraint-stage top-K points).  The env model defaults to 64/64; a
  # stable reorient grasp has ~10-15 true contact points, so 24/24 is
  # plenty for planning-grade rollouts and cuts the narrow-phase one-hot
  # selection and contact-row assembly costs roughly in half.  None keeps
  # the env model's values (conformance fidelity).
  plan_midphase_cap: Optional[int] = 16
  plan_contact_top_k: Optional[int] = 16
  # Fold implicit joint damping into the Newton solve (M' = M + h*D), so
  # the Euler integrator's separate linear solve disappears — 1 of the 5
  # Cholesky factorizations per substep (see Option.implicit_damping).
  # Slightly different damping semantics than MuJoCo Euler (the 'implicit'
  # integrator family); closed-loop success re-validated with it on.
  plan_implicit_damping: bool = True
  # Planning-model collision set: when False, the planning model keeps only
  # candidate pairs where at least one geom sits on a moving-base body
  # (free-jointed or mocap-rooted chains) — for reorient that is cube-vs-
  # hand and cube-vs-ground, dropping the ~600 hand-self and hand-ground
  # pairs whose midphase selection dominated the rollout substep.  The env
  # model keeps full fidelity (success is still judged by the exact
  # contact model); this is the planning-model simplification MJPC makes
  # by hand-authoring reduced task models.
  plan_self_collision: bool = False
  # Hoist the midphase pair selection out of the substep loop: one
  # selection per control step (from the first substep's frames) is
  # reused by all plan_substeps — the approx_top_k scoring was ~2/3 of
  # the rollout collision stage.  Geoms move ~mm per control step vs the
  # cm-scale bounding-sphere slack of the midphase, and the constraint
  # stage still re-scores the selected slots' true depths every substep.
  plan_midphase_per_control_step: bool = True
  # Roll the candidate population through the batch-minor hot substep
  # (physics/step.py step_n_b): the FK/CRB/RNE tree sweeps run with the
  # population in the XLA lane axis at full vector width, instead of the
  # ~25% lane utilization of vmap's batch-major layout.  Numerics are
  # pinned equal to the vmapped per-env rollout (tests/test_planners.py).
  batched_rollouts: bool = True
  # Unroll factor for the control-step scan inside rollouts (the substep
  # scan under it already unrolls, step.py): >1 lets XLA fuse across
  # control-step boundaries at the cost of graph size / compile time.
  rollout_unroll: int = 1


from dexterity_tpu.utils.structs import pytree_dataclass


@pytree_dataclass
class PlannerState:
  nominal: jax.Array           # (H, nu) current plan
  best_return: jax.Array       # () score of nominal on last solve


class PredictiveSampling:
  """Zero-order sampling MPC over a GoalTask."""

  def __init__(self, task: task_lib.GoalTask,
               config: PredictiveSamplingConfig = PredictiveSamplingConfig(),
               dtype=None, extra_reward_fn=None):
    """Args:
      extra_reward_fn: optional (model, data, goal) -> scalar planning
        shaping added to the task reward inside rollouts only (MJPC-style
        planner costs richer than the env reward, e.g. keep-the-cube-over-
        the-palm terms for reorient).
    """
    self.task = task
    self.config = config
    self.extra_reward_fn = extra_reward_fn
    # Reduced-fidelity planning model (same arrays, fewer solver iters,
    # optionally a coarser integration timestep) — shared with iLQR
    # (planners/common.py).
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
    lo = np.where(np.isfinite(spec.minimum), spec.minimum, -1.0)
    hi = np.where(np.isfinite(spec.maximum), spec.maximum, 1.0)
    self._lo = jnp.asarray(lo, self.dtype)
    self._hi = jnp.asarray(hi, self.dtype)
    self.nu = spec.shape[0]
    self._act_ids = self._action_actuator_ids(model)

  def _action_actuator_ids(self, model):
    ids = []
    for eff, (a, b) in zip(self.task.hand_effectors,
                           self.task.effector_slices(model)):
      ids.extend(eff.indices().tolist())
    return np.asarray(ids, np.int32)

  # -- core ---------------------------------------------------------------

  def init_state(self, data: Optional[T.Data] = None) -> PlannerState:
    mid = (self._lo + self._hi) / 2.0
    nominal = jnp.tile(mid, (self.config.horizon, 1))
    return PlannerState(nominal=nominal,
                        best_return=jnp.asarray(-jnp.inf, self.dtype))

  def rollout_return(self, data: T.Data, goal: jax.Array,
                     actions: jax.Array) -> jax.Array:
    """Discount-free return of one action sequence (H, nu).

    Failure termination (e.g. the reorient prop falling) is modeled inside
    the rollout: rewards stop accruing once the task's failure predicate
    fires, so candidate plans that drop the prop score poorly.
    """
    model = self.model
    gen = self.task.goal_generator
    n_sub = self.n_plan_substeps

    def control_step(carry, action):
      d, alive = carry
      ctrl = d.ctrl.at[jnp.asarray(self._act_ids)].set(
          jnp.clip(action, self._lo, self._hi))
      d = d.replace(ctrl=ctrl)
      # Reduced refresh: planning rewards and the rollout failure proxy
      # are position-level at most (task.plan_refresh — 'none' for tasks
      # whose planning signals read qpos directly, e.g. reorient).
      d = physics_step.step_n(model, d, n_sub,
                              refresh=self.task.plan_refresh)
      dist = gen.goal_distance(goal, gen.current_state(model, d))
      tstate = _reward_state(goal, dist)
      r = self.task.get_reward(model, d, tstate)
      if self.extra_reward_fn is not None:
        r = r + self.extra_reward_fn(model, d, goal)
      alive_after = alive & ~self.task.rollout_failure(model, d)
      r = jnp.where(alive_after, r,
                    jnp.where(alive, -self.config.failure_penalty, 0.0))
      return (d, alive_after), r

    # `alive` starts True but must inherit data's varying-axes metadata so
    # the scan carry typechecks inside shard_map population sharding
    # (where failure_termination makes the carry shard-varying).
    alive0 = jnp.asarray(True) | (data.qpos[0] != data.qpos[0])
    (_, _), rewards = jax.lax.scan(
        control_step, (data, alive0), actions)
    return jnp.sum(rewards)

  def rollout_returns_batched(self, data: T.Data, goal: jax.Array,
                              actions: jax.Array) -> jax.Array:
    """Returns of N candidate sequences (N, H, nu) -> (N,).

    Same semantics as vmap(rollout_return) over the candidate axis (pinned
    by tests/test_planners.py) but the physics runs through step_n_b: one
    scan over control steps whose carry is the whole candidate population,
    so the tree-sweep stages (FK, frames, CRB, RNE) see the population as
    a trailing batch axis packed into the XLA lane dimension — full-width
    VPU work instead of vmap's batch-major ~3/128-lane layout.
    """
    n = actions.shape[0]
    bdata = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n,) + x.shape), data)
    goals = jnp.broadcast_to(goal[None], (n,) + goal.shape)
    return self.rollout_returns_flat(bdata, goals, actions)

  def rollout_returns_flat(self, bdata: T.Data, goals: jax.Array,
                           actions: jax.Array) -> jax.Array:
    """rollout_returns_batched with per-candidate data and goals (leading
    axis M on everything) — the form multi-stream serving flattens into
    (solve_batch: M = streams x samples)."""
    model = self.model
    gen = self.task.goal_generator
    n_sub = self.n_plan_substeps
    acts_t = jnp.swapaxes(actions, 0, 1)                 # (H, M, nu)
    act_ids = jnp.asarray(self._act_ids)
    # Position-level planning rewards never read the dynamics-output
    # fields; carrying only the true integrator state through BOTH scan
    # levels (control steps here, substeps inside step_n_b) removes the
    # per-control-step carry copies of every pass-through Data field —
    # the copy bucket alone was ~30% of single-stream device time
    # (trace_solve, round 4).  The trajectory is identical by
    # construction: each control step rebuilds the full Data from the
    # loop-invariant pre-rollout `bdata` plus the carried state.
    minimal = self.task.plan_refresh in ('none', 'position')
    carry_fields = physics_step._STEP_CARRY_MIN if minimal else None

    def per_env_reward(d, g):
      dist = gen.goal_distance(g, gen.current_state(model, d))
      r = self.task.get_reward(model, d, _reward_state(g, dist))
      if self.extra_reward_fn is not None:
        r = r + self.extra_reward_fn(model, d, g)
      return r, self.task.rollout_failure(model, d)

    def control_step(carry, action):
      c, alive = carry
      d = c if carry_fields is None else bdata.replace(**c)
      ctrl = d.ctrl.at[:, act_ids].set(
          jnp.clip(action, self._lo, self._hi))
      d = d.replace(ctrl=ctrl)
      d = physics_step.step_n_b(
          model, d, n_sub, refresh=self.task.plan_refresh,
          midphase=('per_call' if self.config.plan_midphase_per_control_step
                    else 'per_substep'),
          carry=('minimal' if minimal else 'full'))
      r, fail = jax.vmap(per_env_reward)(d, goals)
      alive_after = alive & ~fail
      r = jnp.where(alive_after, r,
                    jnp.where(alive, -self.config.failure_penalty, 0.0))
      out = (d if carry_fields is None
             else {f: getattr(d, f) for f in carry_fields})
      return (out, alive_after), r

    alive0 = (jnp.ones(bdata.qpos.shape[:1], bool)
              & (bdata.qpos[:, 0] == bdata.qpos[:, 0]))
    carry0 = (bdata if carry_fields is None
              else {f: getattr(bdata, f) for f in carry_fields})
    (_, _), rewards = jax.lax.scan(control_step, (carry0, alive0), acts_t,
                                   unroll=self.config.rollout_unroll)
    return jnp.sum(rewards, axis=0)

  def _sample_noise(self, key, n):
    """(n, H, nu) exploration noise; spline-smoothed when num_knots > 0."""
    cfg = self.config
    rng = self._hi - self._lo
    k = cfg.num_knots
    if not k or k >= cfg.horizon:
      return (jax.random.normal(key, (n, cfg.horizon, self.nu), self.dtype)
              * cfg.noise_scale * rng)
    knots = (jax.random.normal(key, (n, k, self.nu), self.dtype)
             * cfg.noise_scale * rng)
    # Linear interpolation of the k knots onto the H control steps
    # (static interpolation matrix -> one matmul over the knot axis).
    t = np.linspace(0.0, k - 1.0, cfg.horizon)
    i0 = np.clip(np.floor(t).astype(int), 0, k - 2)
    w = t - i0
    interp = np.zeros((cfg.horizon, k))
    interp[np.arange(cfg.horizon), i0] = 1.0 - w
    interp[np.arange(cfg.horizon), i0 + 1] = w
    return jnp.einsum('hk,nku->nhu', jnp.asarray(interp, self.dtype), knots)

  def _one_iteration(self, data, goal, nominal, key, noise_mult):
    """Sample around `nominal`, evaluate, return (plan, best_return)."""
    cfg = self.config
    noise = self._sample_noise(key, cfg.num_samples - 1) * noise_mult
    candidates = jnp.concatenate([nominal[None], nominal[None] + noise])
    candidates = jnp.clip(candidates, self._lo, self._hi)
    if cfg.batched_rollouts:
      returns = self.rollout_returns_batched(data, goal, candidates)
    else:
      returns = jax.vmap(lambda a: self.rollout_return(data, goal, a))(
          candidates)
    best = jnp.argmax(returns)
    if cfg.temperature > 0:
      # MPPI-style exponentially-weighted plan average (normalized by the
      # return spread so temperature is scale-free).
      spread = jnp.maximum(returns.max() - returns.min(), 1e-6)
      w = jax.nn.softmax((returns - returns.max())
                         / (cfg.temperature * spread))
      seq = jnp.einsum('n,nhu->hu', w, candidates)
      seq = jnp.clip(seq, self._lo, self._hi)
    else:
      seq = candidates[best]
    return seq, returns[best]

  def solve(self, data: T.Data, goal: jax.Array, pstate: PlannerState,
            key: jax.Array):
    """One MPC solve. Returns (action, new PlannerState)."""
    cfg = self.config
    best_seq = pstate.nominal
    best_ret = jnp.asarray(-jnp.inf, self.dtype)
    mult = 1.0
    for _ in range(max(cfg.iterations, 1)):
      key, sub = jax.random.split(key)
      best_seq, best_ret = self._one_iteration(
          data, goal, best_seq, sub, mult)
      mult = mult * cfg.noise_decay
    # Receding horizon: shift, repeat last action.
    nominal = jnp.concatenate([best_seq[1:], best_seq[-1:]])
    new_state = PlannerState(nominal=nominal, best_return=best_ret)
    return best_seq[0], new_state

  def solve_batch(self, data_b: T.Data, goals: jax.Array, pstates,
                  keys: jax.Array):
    """G concurrent MPC solves in one program: the (G, num_samples)
    candidate populations flatten into a single (G*N) rollout batch, so
    the per-op dispatch overhead that dominates small-batch substeps
    amortizes across streams (vmap(solve) keeps the streams as an outer
    batch-major axis and loses that).  Returns (actions (G, nu), new
    PlannerStates)."""
    cfg = self.config
    g = keys.shape[0]
    best_seq = pstates.nominal                          # (G, H, nu)
    best_ret = jnp.full((g,), -jnp.inf, self.dtype)
    mult = 1.0
    # The flattened (G*N) rollout initial state and goals are identical
    # across CEM iterations — build them once outside the loop.
    n_flat = cfg.num_samples
    bdata = jax.tree.map(
        lambda x: jnp.broadcast_to(
            x[:, None], (g, n_flat) + x.shape[1:]).reshape(
                (g * n_flat,) + x.shape[1:]), data_b)
    goals_f = jnp.broadcast_to(
        goals[:, None], (g, n_flat) + goals.shape[1:]).reshape(
            (g * n_flat,) + goals.shape[1:])
    for it in range(max(cfg.iterations, 1)):
      # Same per-stream key schedule as solve() (carry split[0], sample
      # with split[1]) so solve_batch == vmap(solve) exactly
      # (tests/test_planners.py).
      subs = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
      keys = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
      noise = jax.vmap(
          lambda k: self._sample_noise(k, cfg.num_samples - 1))(subs)
      noise = noise * mult                              # (G, N-1, H, nu)
      cands = jnp.concatenate(
          [best_seq[:, None], best_seq[:, None] + noise], axis=1)
      cands = jnp.clip(cands, self._lo, self._hi)       # (G, N, H, nu)
      n = cands.shape[1]
      flat = cands.reshape(g * n, *cands.shape[2:])
      returns = self.rollout_returns_flat(bdata, goals_f, flat)
      returns = returns.reshape(g, n)
      best = jnp.argmax(returns, axis=1)
      best_seq = jnp.take_along_axis(
          cands, best[:, None, None, None], axis=1)[:, 0]
      best_ret = jnp.take_along_axis(returns, best[:, None], axis=1)[:, 0]
      mult = mult * cfg.noise_decay
    nominal = jnp.concatenate([best_seq[:, 1:], best_seq[:, -1:]], axis=1)
    new_states = PlannerState(nominal=nominal, best_return=best_ret)
    return best_seq[:, 0], new_states

  def action(self, env_state, pstate: PlannerState, key: jax.Array):
    """Convenience: plan from a GoalEnvironment EnvState."""
    return self.solve(env_state.data, env_state.task.goal, pstate, key)


class _RewardState:
  """Minimal task-state view for reward evaluation during planning."""

  __slots__ = ('goal', 'goal_distance')

  def __init__(self, goal, goal_distance):
    self.goal = goal
    self.goal_distance = goal_distance


def _reward_state(goal, dist):
  return _RewardState(goal, dist)
