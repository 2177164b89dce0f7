"""Population-sharded MPC scaling measurement (BASELINE.md >80% target).

Round-4 form (VERDICT r3 item 1): the thing being scaled is the VALIDATED
closed-loop planner config — 256 samples x 2 CEM iterations, horizon 10,
plan_substeps=3, Newton 4/6, spline-knot noise — not a toy.  Strong
scaling: the fixed 256-candidate population shards across 1/2/4/8 devices
via `distributed.sharded_solve` (which `tests/test_multichip.py` pins equal
to the single-device `solve`).

  python tools/bench_scaling.py                       # virtual CPU mesh
  SCALING_BACKEND=tpu python tools/bench_scaling.py   # real chip anchor

Interpretation caveat recorded in the artifact: the virtual CPU mesh runs
N logical devices over the host's physical cores (4 here), so wall-clock
speedup saturates at the core count — the deliverables on CPU are
(a) the sharded path executing the real config end-to-end at every mesh
size and (b) `sharding_overhead` = t_sharded(1 dev) / t_unsharded, the
pure cost of the shard_map + all_gather structure.  True ICI scaling
needs real chips (the TPU run anchors 1-device; multi-host runs call
sharding.initialize_distributed() first and use the same script).
"""

import json
import multiprocessing
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


def main():
  from dexterity_tpu import manipulation
  from dexterity_tpu.parallel import sharding
  from dexterity_tpu.planners import distributed
  from dexterity_tpu.planners import predictive_sampling as ps

  sharding.initialize_distributed()
  n_avail = len(jax.devices())
  # The validated closed-loop config (EVAL_CLOSED_LOOP_r03.json
  # validated_default) — overridable for quick smoke runs only.
  samples = int(os.environ.get('SCALING_SAMPLES', '256'))
  horizon = int(os.environ.get('SCALING_HORIZON', '10'))
  n_solves = int(os.environ.get('SCALING_SOLVES', '3'))
  config = ps.PredictiveSamplingConfig(
      horizon=horizon, num_samples=samples, num_knots=4,
      iterations=2, noise_decay=0.5, failure_penalty=30.0,
      solver_iterations=4, ls_iterations=6, solver_refactor_every=2,
      plan_substeps=3)

  task = manipulation.build_task('reorient', 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
  planner = ps.PredictiveSampling(task, config)

  def time_solves(solve_fn, mesh=None):
    pstate = planner.init_state()
    if mesh is not None:
      # Pre-place the carried planner state in the solve's replicated
      # output sharding: otherwise feeding the first output back changes
      # the input shardings and triggers ONE full retrace of the program
      # (~20 s of tracing for this graph) mid-measurement.
      from jax.sharding import NamedSharding, PartitionSpec
      repl = NamedSharding(mesh, PartitionSpec())
      pstate = jax.device_put(pstate, repl)
    action, pstate = solve_fn(state.data, state.task.goal, pstate,
                              jax.random.PRNGKey(1))
    jax.block_until_ready(action)
    # Second warmup WITH the fed-back state covers any remaining
    # sharding-driven retrace before timing starts.
    action, pstate = solve_fn(state.data, state.task.goal, pstate,
                              jax.random.PRNGKey(1))
    jax.block_until_ready(action)
    t0 = time.perf_counter()
    for i in range(n_solves):
      action, pstate = solve_fn(state.data, state.task.goal, pstate,
                                jax.random.PRNGKey(2 + i))
    jax.block_until_ready(action)
    return (time.perf_counter() - t0) / n_solves

  # Unsharded single-device anchor (the exact validated solve).
  wall_unsharded = time_solves(jax.jit(planner.solve))
  print(f'unsharded 1-dev: {wall_unsharded*1e3:9.1f} ms/solve', flush=True)

  results = []
  n_dev = 1
  while n_dev <= n_avail:
    mesh = sharding.make_mesh(n_dev)
    with mesh:
      wall = time_solves(jax.jit(
          lambda d, g, p, k, mesh=mesh:
          distributed.sharded_solve(planner, mesh, d, g, p, k)), mesh=mesh)
    results.append(dict(
        n_devices=n_dev, samples=samples, horizon=horizon,
        s_per_solve=wall, solves_per_s=1.0 / wall,
        rollout_throughput=samples * config.iterations / wall,
        speedup_vs_1dev=results[0]['s_per_solve'] / wall if results
        else 1.0))
    print(f'n_dev={n_dev:2d} samples={samples:5d} '
          f'{wall*1e3:9.1f} ms/solve  '
          f'speedup {results[-1]["speedup_vs_1dev"]:.2f}x', flush=True)
    n_dev *= 2

  for r in results:
    r['efficiency_vs_1dev'] = r['speedup_vs_1dev'] / r['n_devices']
  out = dict(
      backend=backend,
      scaling_mode='strong (fixed 256-candidate population sharded)',
      config=dict(samples=samples, horizon=horizon, iterations=2,
                  noise_decay=0.5, num_knots=4, plan_substeps=3,
                  solver_its=[4, 6], refactor_every=2,
                  failure_penalty=30.0,
                  note='validated closed-loop config, '
                       'EVAL_CLOSED_LOOP_r03.json'),
      unsharded_s_per_solve=wall_unsharded,
      sharding_overhead_1dev=results[0]['s_per_solve'] / wall_unsharded,
      physical_cores=multiprocessing.cpu_count(),
      caveat=('CPU mesh devices are logical: wall-clock speedup saturates '
              'at the physical core count; deliverables are end-to-end '
              'execution of the validated config at every mesh size and '
              'the 1-device sharding overhead.' if backend == 'cpu'
              else 'single real chip; multi-chip needs a pod slice'),
      results=results)
  path = os.environ.get('SCALING_OUT', 'SCALING_r04.json')
  doc = {}
  if os.path.exists(path) and os.environ.get('SCALING_APPEND'):
    try:
      with open(path) as f:
        doc = json.load(f)
    except ValueError:
      doc = {}
  if 'results' in doc:                      # legacy single-backend layout
    doc = {doc.get('backend', 'cpu'): doc}
  doc[backend] = out
  with open(path, 'w') as f:
    json.dump(doc, f, indent=1)
    f.write('\n')
  print('wrote', path)
  for r in results:
    print(f"  {r['n_devices']} dev: efficiency "
          f"{r['efficiency_vs_1dev']*100:.1f}%")


if __name__ == '__main__':
  main()
