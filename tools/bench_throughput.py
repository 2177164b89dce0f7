"""Multi-stream MPC throughput: G concurrent reorient solve streams.

The headline bench (bench.py) measures single-stream solve latency — one
environment re-planning at 512 rollouts/solve.  Production MPC serving
(and the batched closed-loop evaluator) runs G independent environments
lockstep: the per-op dispatch overhead that dominates the small-batch
substep amortizes across streams, so per-chip solve throughput rises
sub-linearly in cost.  Prints solves/s (= G solves per planner step).

Env: STREAMS (4) SAMPLES (256) ITERS (2) HORIZON (10) SOLVES (10).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

os.makedirs('/tmp/dexterity_tpu_jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/dexterity_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)


def main():
  from dexterity_tpu import manipulation
  from dexterity_tpu.planners import predictive_sampling as ps

  g = int(os.environ.get('STREAMS', '4'))
  samples = int(os.environ.get('SAMPLES', '256'))
  iters = int(os.environ.get('ITERS', '2'))
  horizon = int(os.environ.get('HORIZON', '10'))
  n_rounds = int(os.environ.get('SOLVES', '10'))

  task = manipulation.build_task('reorient', 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  planner = ps.PredictiveSampling(
      task, ps.PredictiveSamplingConfig(
          horizon=horizon, num_samples=samples, iterations=iters,
          plan_substeps=3))

  keys = jax.random.split(jax.random.PRNGKey(0), g)
  states, _ = jax.jit(jax.vmap(env.reset))(keys)
  pstates = jax.vmap(lambda _: planner.init_state())(jnp.arange(g))

  solve = jax.jit(planner.solve_batch)

  def run(states, pstates, key):
    keys = jax.random.split(key, g)
    return solve(states.data, states.task.goal, pstates, keys)

  actions, pstates = run(states, pstates, jax.random.PRNGKey(1))
  jax.block_until_ready(actions)
  t0 = time.time()
  for i in range(n_rounds):
    actions, pstates = run(states, pstates, jax.random.PRNGKey(2 + i))
  jax.block_until_ready(actions)
  wall = time.time() - t0
  solves_per_s = g * n_rounds / wall
  print(json.dumps({
      'metric': 'reorient_mpc_solve_throughput_per_chip',
      'streams': g,
      'value': round(solves_per_s, 3),
      'unit': f'solves/s ({g} concurrent streams x '
              f'{samples * iters} rollouts/solve, horizon={horizon})',
      'vs_per_chip_target': round(solves_per_s / 62.5, 4),
  }))


if __name__ == '__main__':
  main()
