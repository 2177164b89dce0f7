"""Device-trace the multi-stream planner solve and print top kernels.

Traces planner.solve_batch (STREAMS concurrent reorient MPC streams, the
throughput-bench configuration) for one solve after warmup and aggregates
per-kernel device time from the trace_viewer JSON.  This profiles the REAL
hot path — reduced planning model, hoisted midphase, plan_substeps — unlike
bench_hot_stages.py which times the full env substep.

Env: STREAMS (4) SAMPLES (256) ITERS (2) HORIZON (10) TOPN (30).
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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
  topn = int(os.environ.get('TOPN', '30'))

  task = manipulation.build_task('reorient', 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  planner = ps.PredictiveSampling(
      task, ps.PredictiveSamplingConfig(
          horizon=horizon, num_samples=samples, iterations=iters,
          plan_substeps=3,
          solver_refactor_every=int(os.environ.get('REFAC', '2')),
          plan_midphase_cap=int(os.environ.get('MIDPHASE', '16')),
          plan_contact_top_k=int(os.environ.get('TOPK', '16'))))

  keys = jax.random.split(jax.random.PRNGKey(0), g)
  states, _ = jax.jit(jax.vmap(env.reset))(keys)
  pstates = jax.vmap(lambda _: planner.init_state())(jnp.arange(g))
  solve = jax.jit(planner.solve_batch)

  def run(key):
    ks = jax.random.split(key, g)
    return solve(states.data, states.task.goal, pstates, ks)

  actions, _ = run(jax.random.PRNGKey(1))
  jax.block_until_ready(actions)

  tdir = '/tmp/dex_trace_solve'
  os.system(f'rm -rf {tdir}')
  with jax.profiler.trace(tdir):
    for i in range(2):
      actions, _ = run(jax.random.PRNGKey(2 + i))
    jax.block_until_ready(actions)

  files = glob.glob(f'{tdir}/**/*.trace.json.gz', recursive=True)
  assert files, f'no trace under {tdir}'
  with gzip.open(files[0], 'rt') as fh:
    trace = json.load(fh)

  from collections import defaultdict
  agg = defaultdict(float)
  cnt = defaultdict(int)
  total = 0.0
  for e in trace['traceEvents']:
    if e.get('ph') != 'X':
      continue
    name = e.get('name', '')
    dur = e.get('dur', 0) / 1e3
    if name.startswith(('fusion', 'loop_', 'copy', 'custom-call', 'dynamic',
                        'sort', 'reduce', 'transpose', 'convert', 'select',
                        'scatter', 'gather', 'broadcast', 'concatenate',
                        'dot', 'cholesky', 'triangular', 'iota', 'slice',
                        'bitcast', 'tuple', 'while', 'all-', 'rsqrt', 'add',
                        'multiply', 'subtract', 'divide', 'pad', 'reshape')):
      agg[name] += dur
      cnt[name] += 1
      total += dur
  items = sorted(agg.items(), key=lambda kv: -kv[1])
  print(f'solve_batch streams={g} samples={samples} iters={iters} '
        f'horizon={horizon}: total device-op time {total/2:.1f} ms/solve')
  # Bucket by op class, excluding the outer while (it contains the rest).
  buckets = defaultdict(float)
  for name, ms in items:
    if name.startswith('while'):
      continue
    buckets[name.split('.')[0]] += ms
  inner = sum(buckets.values())
  print(f'inner ops: {inner/2:.1f} ms/solve')
  for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
    print(f'  bucket {k:16s} {v/2:8.2f} ms/solve')
  for name, ms in items[:topn]:
    print(f'  {ms/2:8.2f} ms  x{cnt[name]//2:5d}  {name[:72]}')


if __name__ == '__main__':
  main()
