"""Closed-loop reorient MPC evaluation: goal-reach rate over N goals.

Success criterion mirrors the reference reorient task exactly
(/root/reference/dexterity/manipulation/tasks/reorient.py:51,64-68): a goal
counts as solved when the orientation error drops to <= 0.1 rad within
<= 300 control steps (7.5 s); the episode also ends (failed) if the cube
falls (prop-ground contact).  Each episode is one goal
(successes_needed=1), so N consecutive episodes = N consecutive goals.

Env-var knobs (defaults = the measured 50/50 config,
EVAL_CLOSED_LOOP_r02.json):
  GOALS (20)  SAMPLES (256)  ITERS (2)  HORIZON (10)  KNOTS (4)
  TEMP (0.0)  NOISE (0.2)  FAIL_PEN (30)  PLAN_SOLVER_ITS (4)
  PLAN_LS_ITS (6)  PLAN_SUBSTEPS (unset = task default 5)  SHAPING (1)
  SEED (0)

Prints one summary line per goal and a final JSON summary.
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
  from dexterity_tpu.planners import predictive_sampling as ps

  n_goals = int(os.environ.get('GOALS', '20'))
  samples = int(os.environ.get('SAMPLES', '256'))
  horizon = int(os.environ.get('HORIZON', '10'))
  knots = int(os.environ.get('KNOTS', '4'))
  temp = float(os.environ.get('TEMP', '0.0'))
  noise = float(os.environ.get('NOISE', '0.2'))
  plan_substeps = (int(os.environ['PLAN_SUBSTEPS'])
                   if 'PLAN_SUBSTEPS' in os.environ else None)
  iters = int(os.environ.get('ITERS', '2'))
  noise_decay = float(os.environ.get('NOISE_DECAY', '0.5'))
  fail_pen = float(os.environ.get('FAIL_PEN', '30'))
  p_solver = int(os.environ.get('PLAN_SOLVER_ITS', '4'))
  p_ls = int(os.environ.get('PLAN_LS_ITS', '6'))
  p_cap = int(os.environ.get('PLAN_CAP', '24'))
  p_topk = int(os.environ.get('PLAN_TOPK', '24'))
  shaping_on = os.environ.get('SHAPING', '1') == '1'
  seed = int(os.environ.get('SEED', '0'))

  task = manipulation.build_task('reorient', 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  model = task.compile()
  task.after_compile(model)
  prop_body = task._prop_body
  spawn_center = jnp.asarray([0.0, -0.13, 0.16])

  w_horiz = float(os.environ.get('SHAPE_HORIZ', '300'))
  w_drop = float(os.environ.get('SHAPE_DROP', '2000'))
  drop_margin = float(os.environ.get('SHAPE_MARGIN', '0.035'))
  w_vel = float(os.environ.get('SHAPE_VEL', '0'))

  prop_qadr = task._prop_qadr
  prop_dadr = model.jnt_dofadr[model.body_jntadr[prop_body]]

  def keep_in_hand(model, data, goal):
    """Planning-only shaping: keep the cube over the palm and near the
    spawn height; discourages plans that fling or drop it.  Reads the free
    joint's qpos/qvel directly — valid under plan_refresh='none' (frames
    are stale inside rollouts)."""
    del model, goal
    pos = data.qpos[prop_qadr:prop_qadr + 3]
    horiz = (pos[0] - spawn_center[0]) ** 2 + (pos[1] - spawn_center[1]) ** 2
    low = jnp.maximum(spawn_center[2] - drop_margin - pos[2], 0.0)
    r = -w_horiz * horiz - w_drop * low * low
    if w_vel:
      vel = data.qvel[prop_dadr:prop_dadr + 3]
      r = r - w_vel * jnp.sum(vel * vel)
    return r

  planner = ps.PredictiveSampling(
      task,
      ps.PredictiveSamplingConfig(
          horizon=horizon, num_samples=samples, noise_scale=noise,
          num_knots=knots, temperature=temp, plan_substeps=plan_substeps,
          iterations=iters, noise_decay=noise_decay,
          failure_penalty=fail_pen, solver_iterations=p_solver,
          ls_iterations=p_ls, plan_midphase_cap=p_cap,
          plan_contact_top_k=p_topk),
      extra_reward_fn=keep_in_hand if shaping_on else None)

  reset = jax.jit(env.reset)
  step = jax.jit(env.step)
  solve = jax.jit(planner.solve)

  key = jax.random.PRNGKey(seed)
  solved_flags, steps_taken, final_err = [], [], []
  t_start = time.time()
  for g in range(n_goals):
    key, k_reset = jax.random.split(key)
    state, ts = reset(k_reset)
    pstate = planner.init_state()
    n_steps = 0
    while True:
      key, k_plan = jax.random.split(key)
      action, pstate = solve(state.data, state.task.goal, pstate, k_plan)
      state, ts = step(state, action)
      n_steps += 1
      if bool(ts.last()) or n_steps >= 310:
        break
    solved = bool(int(state.task.successes) >= 1)
    err = float(state.task.goal_distance[0])
    solved_flags.append(solved)
    steps_taken.append(n_steps)
    final_err.append(err)
    fell = bool(state.task.failure_termination)
    print(f'goal {g:2d}: solved={int(solved)} steps={n_steps:3d} '
          f'final_err={err:.3f} rad fell={int(fell)}', flush=True)

  rate = float(np.mean(solved_flags))
  summary = {
      'goals': n_goals, 'success_rate': rate,
      'mean_steps': float(np.mean(steps_taken)),
      'mean_final_err_rad': float(np.mean(final_err)),
      'median_final_err_rad': float(np.median(final_err)),
      'config': {'samples': samples, 'horizon': horizon, 'knots': knots,
                 'temperature': temp, 'noise': noise,
                 'plan_substeps': plan_substeps, 'shaping': shaping_on,
                 'iterations': iters, 'noise_decay': noise_decay,
                 'failure_penalty': fail_pen,
                 'solver_its': [p_solver, p_ls], 'seed': seed},
      'wall_s': time.time() - t_start,
      'backend': jax.default_backend(),
  }
  print(json.dumps(summary))


if __name__ == '__main__':
  main()
