"""Batched closed-loop reorient evaluation for the iLQR planner.

BASELINE.json configs[3]: "Successive goal reorientation (OpenAI-cube
style goal resets), iLQR/SQP MPC, H=32".  Same success criterion as
scripts/eval_closed_loop_batch.py (orientation error <= 0.1 rad within
<= STEPS control steps, fall = failure; reference reorient.py:51,64-68).

Planner modes (PLANNER env var):
  ilqr    — pure iLQR from the shifted nominal (H=32 default)
  hybrid  — MJPC-standard hybrid: predictive sampling explores each
            control step, iLQR refines from the sampled plan, and the
            lower-cost of the two plans is executed.

Knobs (env vars): GOALS (16) HORIZON (32) ITERS (4) LS (6) CTRL_COST
  REG PLAN_SUBSTEPS (3) STEPS (300) SEED SHAPING SHAPE_* PS_SAMPLES
  OUT (EVAL_ILQR_r04.json, appended)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs('/tmp/dexterity_tpu_jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/dexterity_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)


def main():
  from dexterity_tpu import manipulation
  from dexterity_tpu.planners import ilqr as ilqr_lib
  from dexterity_tpu.planners import predictive_sampling as ps

  mode = os.environ.get('PLANNER', 'ilqr')
  g_envs = int(os.environ.get('GOALS', '16'))
  horizon = int(os.environ.get('HORIZON', '32'))
  iters = int(os.environ.get('ITERS', '4'))
  ls = int(os.environ.get('LS', '6'))
  ctrl_cost = float(os.environ.get('CTRL_COST', '1e-3'))
  reg = float(os.environ.get('REG', '1e-4'))
  plan_substeps = (int(os.environ['PLAN_SUBSTEPS'])
                   if 'PLAN_SUBSTEPS' in os.environ else 3)
  n_steps = int(os.environ.get('STEPS', '300'))
  seed = int(os.environ.get('SEED', '0'))
  shaping_on = os.environ.get('SHAPING', '1') == '1'

  task = manipulation.build_task('reorient', 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  model = task.compile()
  task.after_compile(model)
  prop_body = task._prop_body
  spawn_center = jnp.asarray([0.0, -0.13, 0.16])
  w_horiz = float(os.environ.get('SHAPE_HORIZ', '300'))
  w_drop = float(os.environ.get('SHAPE_DROP', '2000'))
  drop_margin = float(os.environ.get('SHAPE_MARGIN', '0.035'))
  prop_qadr = task._prop_qadr

  def keep_in_hand_cost(model, data, goal):
    del model, goal
    pos = data.qpos[prop_qadr:prop_qadr + 3]
    horiz = (pos[0] - spawn_center[0]) ** 2 + (pos[1] - spawn_center[1]) ** 2
    low = jnp.maximum(spawn_center[2] - drop_margin - pos[2], 0.0)
    return w_horiz * horiz + w_drop * low * low

  refac = int(os.environ.get('REFAC', '4'))
  if mode in ('sqp', 'hybrid_sqp'):
    from dexterity_tpu.planners import sqp as sqp_lib
    planner = sqp_lib.SQP(
        task,
        sqp_lib.SQPConfig(horizon=horizon, iterations=iters,
                          line_search_steps=ls, ctrl_cost=ctrl_cost,
                          reg_init=reg, plan_substeps=plan_substeps,
                          solver_refactor_every=refac),
        extra_cost_fn=keep_in_hand_cost if shaping_on else None)
  else:
    planner = ilqr_lib.ILQR(
        task,
        ilqr_lib.ILQRConfig(horizon=horizon, iterations=iters,
                            line_search_steps=ls, ctrl_cost=ctrl_cost,
                            reg_init=reg, plan_substeps=plan_substeps,
                            solver_refactor_every=refac),
        extra_cost_fn=keep_in_hand_cost if shaping_on else None)

  ps_planner = None
  if mode in ('hybrid', 'hybrid_sqp'):
    def keep_in_hand_reward(model, data, goal):
      return -keep_in_hand_cost(model, data, goal)
    ps_planner = ps.PredictiveSampling(
        task,
        ps.PredictiveSamplingConfig(
            horizon=10, num_samples=int(os.environ.get('PS_SAMPLES', '256')),
            num_knots=4, iterations=2, noise_decay=0.5,
            failure_penalty=30.0, solver_iterations=4, ls_iterations=6,
            solver_refactor_every=2, plan_substeps=3),
        extra_reward_fn=keep_in_hand_reward if shaping_on else None)

  @jax.jit
  def init(key):
    keys = jax.random.split(key, g_envs + 1)
    state, _ = jax.vmap(env.reset)(keys[1:])
    istate = jax.vmap(lambda _: planner.init_state())(jnp.arange(g_envs))
    pstate = (jax.vmap(lambda _: ps_planner.init_state())(jnp.arange(g_envs))
              if ps_planner else jnp.zeros(g_envs))
    done = jnp.zeros(g_envs, bool)
    solved = jnp.zeros(g_envs, bool)
    steps_to_solve = jnp.full(g_envs, n_steps, jnp.int32)
    return state, istate, pstate, keys[0], done, solved, steps_to_solve

  def one_solve(data, goal, istate, pstate, key):
    if mode in ('hybrid', 'hybrid_sqp'):
      ps_action, pstate2 = ps_planner.solve(data, goal, pstate, key)
      warm = planner.warm_start(pstate2.nominal)
      # Refine whichever is better: compare the iLQR trajectory cost of
      # the sampled plan vs the carried nominal, refine from the winner.
      x0 = planner._pack(data)
      c_warm = planner.trajectory_cost(data, goal, x0, warm.us)
      c_nom = planner.trajectory_cost(data, goal, x0, istate.us)
      seed_us = jnp.where(c_warm < c_nom, warm.us, istate.us)
      istate = istate.replace(us=seed_us)
      action, istate2 = planner.solve(data, goal, istate)
      return action, istate2, pstate2
    action, istate2 = planner.solve(data, goal, istate)
    return action, istate2, pstate

  @jax.jit
  def control_step(carry, i):
    state, istate, pstate, key, done, solved, stepsolve = carry
    key, sub = jax.random.split(key)
    ks = jax.random.split(sub, g_envs)
    action, istate2, pstate2 = jax.vmap(one_solve)(
        state.data, state.task.goal, istate, pstate, ks)
    state2, ts = jax.vmap(env.step)(state, action)
    ended = ts.step_type == 2
    newly_solved = ~done & ended & (state2.task.successes >= 1)
    solved = solved | newly_solved
    stepsolve = jnp.where(newly_solved, i + 1, stepsolve)
    newly_done = done | ended
    keep = lambda a, b: jnp.where(
        done.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
    state = jax.tree_util.tree_map(keep, state, state2)
    istate = jax.tree_util.tree_map(keep, istate, istate2)
    pstate = jax.tree_util.tree_map(keep, pstate, pstate2)
    return (state, istate, pstate, key, newly_done, solved, stepsolve)

  t0 = time.time()
  carry = init(jax.random.PRNGKey(seed))
  n_solves = 0
  solve_s = 0.0
  for i in range(n_steps):
    ts0 = time.time()
    carry = control_step(carry, jnp.int32(i))
    all_done = bool(jax.device_get(carry[4].all()))
    if i >= 1:                                    # skip compile step
      solve_s += time.time() - ts0
      n_solves += 1
    if all_done:
      break
  state, _, _, _, done, solved, stepsolve = carry
  err = state.task.goal_distance[:, 0]
  fell = state.task.failure_termination
  jax.block_until_ready(solved)
  wall = time.time() - t0
  solved = np.asarray(solved)
  summary = {
      'planner': mode, 'goals': g_envs,
      'success_rate': float(solved.mean()),
      'fell_rate': float(np.asarray(fell).mean()),
      'mean_steps_solved': float(np.asarray(stepsolve)[solved].mean())
      if solved.any() else None,
      'median_final_err_rad': float(np.median(np.asarray(err))),
      'solves_per_s': (g_envs * n_solves / solve_s) if solve_s else None,
      'config': {'horizon': horizon, 'iterations': iters,
                 'line_search_steps': ls, 'ctrl_cost': ctrl_cost,
                 'reg_init': reg, 'plan_substeps': plan_substeps,
                 'solver_refactor_every': refac,
                 'shaping': shaping_on, 'steps': n_steps, 'seed': seed},
      'wall_s': wall, 'backend': jax.default_backend(),
  }
  print(json.dumps(summary), flush=True)
  out = os.environ.get('OUT')
  if out:
    with open(out, 'a') as f:
      f.write(json.dumps(summary) + '\n')


if __name__ == '__main__':
  main()
