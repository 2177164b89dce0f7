"""Full manipulation benchmark suite, batched (BASELINE.json configs[4]).

"Full manipulation benchmark suite batched: 4096 scenarios x all tasks":
for every registered environment, run a BatchedEnvironment of SCENARIOS
auto-resetting episodes under a random policy for STEPS control steps,
with in-graph EpisodeMetrics accumulation, and record env steps/s,
episodes/s, and substeps/s per task.

  python scripts/bench_suite.py                      # real chip, B=4096
  SUITE_B=64 SUITE_STEPS=20 python scripts/bench_suite.py   # smoke

Optional virtual-mesh data parallelism: SUITE_SHARD=1 shards the batch
axis over every available device (jax.sharding + the batch program is
already one jitted SPMD step, so XLA splits it with zero code changes).
Writes SUITE_BENCH_r{N}.json (SUITE_OUT).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# SUITE_CPU=1: force the CPU backend with a virtual 8-device mesh (for
# the SUITE_SHARD=1 8-device row; the axon TPU plugin overrides the
# JAX_PLATFORMS env var, so the platform is pinned via jax.config below).
if os.environ.get('SUITE_CPU') == '1':
  _flags = os.environ.get('XLA_FLAGS', '')
  if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

import jax
import jax.numpy as jnp

if os.environ.get('SUITE_CPU') == '1':
  jax.config.update('jax_platforms', 'cpu')

os.makedirs('/tmp/dexterity_tpu_jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/dexterity_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)


def bench_task(name: str, batch: int, steps: int, seed: int, shard: bool):
  from dexterity_tpu import manipulation
  from dexterity_tpu.envs import batched
  from dexterity_tpu.parallel import sharding
  from dexterity_tpu.utils import metrics as metrics_lib

  domain, task_name = name.split('.')
  task = manipulation.build_task(domain, task_name)
  env = manipulation._environment.GoalEnvironment(task)
  benv = batched.BatchedEnvironment(env, batch)
  spec = env.action_spec()
  lo = jnp.where(jnp.isfinite(spec.minimum), spec.minimum, -1.0)
  hi = jnp.where(jnp.isfinite(spec.maximum), spec.maximum, 1.0)

  # Chunked on-device scans with a host loop between chunks: at B=4096 a
  # single 100-step device execution outruns the tunneled-TPU watchdog
  # (same constraint as scripts/eval_closed_loop_batch.py).
  chunk = min(steps, int(os.environ.get('SUITE_CHUNK', '10')))

  @jax.jit
  def run(key, state, metrics):
    def body(carry, _):
      key, state, metrics = carry
      key, sub = jax.random.split(key)
      actions = lo + (hi - lo) * jax.random.uniform(
          sub, (batch, spec.shape[0]))
      state, ts, metrics = benv.step_with_metrics(state, actions, metrics)
      return (key, state, metrics), ()
    (key, state, metrics), _ = jax.lax.scan(
        body, (key, state, metrics), (), length=chunk)
    return key, state, metrics

  def run_steps(key, state, metrics, n):
    for _ in range(-(-n // chunk)):
      key, state, metrics = run(key, state, metrics)
    jax.block_until_ready(metrics.env_steps)
    return key, state, metrics

  key = jax.random.PRNGKey(seed)
  state, _ = benv.reset(key)
  # Reward dtype follows the enabled precision (f64 in the test suite).
  metrics = metrics_lib.init(batch, dtype=jnp.zeros(0).dtype)
  if shard:
    mesh = sharding.make_mesh()
    state = sharding.shard_batch(mesh, state)
    metrics = metrics.replace(
        cur_return=sharding.shard_batch(mesh, metrics.cur_return),
        cur_length=sharding.shard_batch(mesh, metrics.cur_length))
  # Warm-up (compile + one full pass), then measure a fresh run.
  k2, s2, m2 = run_steps(key, state, metrics, steps)
  t0 = time.perf_counter()
  k2, s2, m2 = run_steps(k2, s2, m2, steps)
  wall = time.perf_counter() - t0
  summ = metrics_lib.summary(m2)
  n_sub = task.n_substeps
  return {
      'task': name, 'batch': batch, 'steps': steps,
      'env_steps_per_s': batch * steps / wall,
      'env_substeps_per_s': batch * steps * n_sub / wall,
      'episodes_per_s': summ['episodes'] / 2 / wall if summ['episodes']
      else 0.0,
      'wall_s': wall,
      'metrics': summ,
  }


def _run_one(name, batch, steps, seed, shard):
  r = bench_task(name, batch, steps, seed, shard)
  print(f"{name}: B={batch} {r['env_steps_per_s']:,.0f} env steps/s "
        f"({r['env_substeps_per_s']:,.0f} substeps/s), "
        f"{r['metrics']['episodes']} episodes", flush=True)
  return r


def main():
  from dexterity_tpu import manipulation

  batch = int(os.environ.get('SUITE_B', '4096'))
  steps = int(os.environ.get('SUITE_STEPS', '100'))
  seed = int(os.environ.get('SUITE_SEED', '0'))
  shard = os.environ.get('SUITE_SHARD', '0') == '1'
  only = os.environ.get('SUITE_TASKS')
  names = only.split(',') if only else list(manipulation.ALL_NAMES)

  if os.environ.get('SUITE_CHILD'):
    # One (task, batch) attempt; result JSON to SUITE_OUT.
    r = _run_one(names[0], batch, steps, seed, shard)
    with open(os.environ['SUITE_OUT'], 'w') as f:
      json.dump(r, f)
    return

  # Parent: one subprocess per (task, batch) attempt — a TPU device fault
  # (e.g. the tunneled-chip watchdog at extreme batch) poisons the client
  # for the whole process, so halving must respawn.  The achieved batch
  # is recorded honestly per task (no silent cap).
  import subprocess
  import sys as _sys
  import tempfile
  results = []
  for name in names:
    b = batch
    while True:
      tmp = tempfile.NamedTemporaryFile(suffix='.json', delete=False)
      env2 = dict(os.environ, SUITE_CHILD='1', SUITE_TASKS=name,
                  SUITE_B=str(b), SUITE_OUT=tmp.name)
      rc = subprocess.call([_sys.executable, os.path.abspath(__file__)],
                           env=env2)
      if rc == 0:
        with open(tmp.name) as f:
          results.append(json.load(f))
        break
      if b <= 256:
        print(f'{name}: failed down to batch {b}; recording failure',
              flush=True)
        results.append({'task': name, 'batch': b, 'error': f'rc={rc}'})
        break
      print(f'{name}: batch {b} failed (rc={rc}); retrying at {b // 2}',
            flush=True)
      b //= 2
  out = {
      'backend': jax.default_backend(),
      'n_devices': len(jax.devices()) if shard else 1,
      'batch': batch, 'steps_timed': steps,
      'policy': 'uniform random',
      'results': results,
  }
  if os.environ.get('SUITE_8DEV_JSON'):
    # Embed a previously-run virtual-8-device-mesh pass (SUITE_CPU=1
    # SUITE_SHARD=1 run) so one artifact carries the single-device TPU
    # rows, the 8-device SPMD rows, and the 2-process multihost row
    # (BASELINE configs[4] fidelity).
    try:
      with open(os.environ['SUITE_8DEV_JSON']) as f:
        out['virtual_8dev_mesh'] = json.load(f)
    except OSError as e:
      out['virtual_8dev_mesh'] = {'error': str(e)}
  if os.environ.get('SUITE_MULTIHOST') == '1':
    # 2-process jax.distributed row (BASELINE configs[4] "multi-host").
    mh_out = tempfile.NamedTemporaryFile(suffix='.json', delete=False)
    env3 = dict(os.environ, MULTIHOST_OUT=mh_out.name)
    env3.pop('SUITE_CHILD', None)
    rc = subprocess.call(
        [_sys.executable,
         os.path.join(os.path.dirname(os.path.dirname(
             os.path.abspath(__file__))), 'tools',
             'run_multihost_suite.py')], env=env3)
    if rc == 0:
      with open(mh_out.name) as f:
        out['multihost'] = json.load(f)
    else:
      out['multihost'] = {'error': f'rc={rc}'}
  path = os.environ.get('SUITE_OUT', 'SUITE_BENCH_r05.json')
  with open(path, 'w') as f:
    json.dump(out, f, indent=1)
    f.write('\n')
  print('wrote', path)


if __name__ == '__main__':
  main()
