"""Population-sharded MPC scaling measurement (BASELINE.md >80% target).

Measures sharded reorient solve throughput at 1/2/4/8 devices and writes
SCALING_r{N}.json.  Two modes:

  python tools/bench_scaling.py            # virtual CPU mesh (8 devices)
  SCALING_BACKEND=tpu python tools/bench_scaling.py   # real chip(s)

On the virtual CPU mesh the absolute numbers are meaningless but the
*efficiency* (per-device throughput retention as devices multiply while
total population is fixed per device) exercises the real collective
pattern: per-shard rollouts + all_gather argmax.  On hardware the same
script measures true ICI scaling; multi-host runs call
sharding.initialize_distributed() first.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

backend = os.environ.get('SCALING_BACKEND', 'cpu')
if backend == 'cpu':
  flags = os.environ.get('XLA_FLAGS', '')
  if 'host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

if backend == 'cpu':
  jax.config.update('jax_platforms', 'cpu')
else:
  os.makedirs('/tmp/dexterity_tpu_jax_cache', exist_ok=True)
  jax.config.update('jax_compilation_cache_dir',
                    '/tmp/dexterity_tpu_jax_cache')
  jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

import jax.numpy as jnp


def main():
  from dexterity_tpu import manipulation
  from dexterity_tpu.parallel import sharding
  from dexterity_tpu.planners import distributed
  from dexterity_tpu.planners import predictive_sampling as ps

  sharding.initialize_distributed()
  n_avail = len(jax.devices())
  # Weak scaling: per-device population fixed -> ideal scaling is constant
  # wall time per solve while total throughput grows linearly.
  per_dev = int(os.environ.get('SCALING_SAMPLES_PER_DEV',
                               '16' if backend == 'cpu' else '512'))
  horizon = int(os.environ.get('SCALING_HORIZON',
                               '2' if backend == 'cpu' else '10'))
  n_solves = int(os.environ.get('SCALING_SOLVES', '3'))

  task = manipulation.build_task('reorient', 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))

  results = []
  n_dev = 1
  while n_dev <= n_avail:
    planner = ps.PredictiveSampling(
        task, ps.PredictiveSamplingConfig(horizon=horizon,
                                          num_samples=per_dev * n_dev))
    mesh = sharding.make_mesh(n_dev)
    pstate = planner.init_state()
    with mesh:
      solve = jax.jit(lambda d, g, p, k, planner=planner, mesh=mesh:
                      distributed.sharded_solve(planner, mesh, d, g, p, k))
      action, pstate = solve(state.data, state.task.goal, pstate,
                             jax.random.PRNGKey(1))
      jax.block_until_ready(action)
      t0 = time.perf_counter()
      for i in range(n_solves):
        action, pstate = solve(state.data, state.task.goal, pstate,
                               jax.random.PRNGKey(2 + i))
      jax.block_until_ready(action)
      wall = (time.perf_counter() - t0) / n_solves
    solves_per_s = 1.0 / wall
    rollouts_per_s = (per_dev * n_dev + n_dev) / wall
    results.append(dict(n_devices=n_dev, samples=per_dev * n_dev,
                        horizon=horizon, s_per_solve=wall,
                        rollout_throughput=rollouts_per_s,
                        solves_per_s=solves_per_s))
    print(f'n_dev={n_dev:2d} samples={per_dev*n_dev:5d} '
          f'{wall*1e3:9.1f} ms/solve  '
          f'{rollouts_per_s:10.1f} rollouts/s', flush=True)
    n_dev *= 2

  base = results[0]['rollout_throughput']
  for r in results:
    r['efficiency_vs_1dev'] = (r['rollout_throughput']
                               / (base * r['n_devices']))
  out = dict(backend=backend, per_device_samples=per_dev,
             horizon=horizon, results=results)
  path = os.environ.get('SCALING_OUT', 'SCALING_r02.json')
  mode = 'a' if os.path.exists(path) and os.environ.get(
      'SCALING_APPEND') else 'w'
  with open(path, mode) as f:
    json.dump(out, f, indent=1)
    f.write('\n')
  print('wrote', path)
  for r in results:
    print(f"  {r['n_devices']} dev: efficiency "
          f"{r['efficiency_vs_1dev']*100:.1f}%")


if __name__ == '__main__':
  main()
