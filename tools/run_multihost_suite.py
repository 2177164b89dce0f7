"""Multi-host (2-process) batched suite bench row (BASELINE configs[4]).

SUITE_BENCH measures the batched environment throughput per task; the
BASELINE text says "multi-host pod slice".  Real pod slices are not
reachable from this box, so this harness runs the honest local stand-in
(same pattern as tools/run_multihost_dryrun.py): a real
`jax.distributed.initialize` cluster of 2 local processes (4 virtual CPU
devices each, 8 global) stepping ONE batched environment whose batch axis
is sharded over the GLOBAL mesh — the same multi-controller SPMD program
a pod slice runs, with the collective-free data-parallel step plus the
auto-reset/goal-switch logic executing on both processes in lockstep.

Writes a JSON row (MULTIHOST_OUT, default /tmp/multihost_suite_row.json)
from process 0:
  {"task", "batch", "steps", "n_processes", "n_devices",
   "env_steps_per_s", "backend": "cpu (virtual mesh, wall-clock NOT a
   TPU throughput claim)"}

Usage: python tools/run_multihost_suite.py   (parent; spawns 2 workers)
Env: MH_TASK (reorient.state_dense) MH_B (1024) MH_STEPS (30)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 4
PORT = int(os.environ.get('MH_COORD_PORT', '12431'))


def worker(pid: int) -> None:
  import jax
  jax.config.update('jax_platforms', 'cpu')
  jax.distributed.initialize(
      coordinator_address=f'localhost:{PORT}',
      num_processes=N_PROC, process_id=pid)
  jax.config.update('jax_default_device', jax.local_devices()[0])

  import numpy as np
  from jax.sharding import NamedSharding, PartitionSpec as P

  from dexterity_tpu import manipulation
  from dexterity_tpu.parallel import sharding

  task_name = os.environ.get('MH_TASK', 'reorient.state_dense')
  batch = int(os.environ.get('MH_B', '1024'))
  steps = int(os.environ.get('MH_STEPS', '30'))

  # Warm the Gloo context before the big compiles (30 s key-exchange
  # deadline vs multi-minute compile skew — see run_multihost_dryrun.py).
  mesh = sharding.make_mesh()
  tiny = jax.make_array_from_callback(
      (len(jax.devices()),), NamedSharding(mesh, P(sharding.BATCH_AXIS)),
      lambda idx: np.ones(1, np.float32))
  jax.block_until_ready(jax.jit(
      jax.numpy.sum, out_shardings=NamedSharding(mesh, P()))(tiny))
  print(f'[worker {pid}] gloo up', flush=True)

  domain, variant = task_name.split('.')
  with jax.default_device(jax.local_devices()[0]):
    task = manipulation.build_task(domain, variant)
    env = manipulation._environment.GoalEnvironment(task)
    spec = env.action_spec()
    # Every process computes the identical full-batch initial state
    # (same keys), then each contributes its addressable shards.
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    state, _ = jax.jit(jax.vmap(env.reset))(keys)

  batch_sh = NamedSharding(mesh, P(sharding.BATCH_AXIS))
  repl = NamedSharding(mesh, P())

  def to_global(x, sh):
    host = np.asarray(x)
    return jax.make_array_from_callback(host.shape, sh,
                                        lambda idx: host[idx])

  state_g = jax.tree_util.tree_map(lambda x: to_global(x, batch_sh), state)
  key_g = to_global(jax.random.PRNGKey(1), repl)
  lo = np.where(np.isfinite(spec.minimum), spec.minimum, -1.0)
  hi = np.where(np.isfinite(spec.maximum), spec.maximum, 1.0)
  lo_g, hi_g = to_global(lo, repl), to_global(hi, repl)

  chunk = 10

  with mesh:
    @jax.jit
    def run(key, state):
      def body(carry, _):
        key, state = carry
        key, sub = jax.random.split(key)
        actions = lo_g + (hi_g - lo_g) * jax.random.uniform(
            sub, (batch, spec.shape[0]))
        state, ts = env.step_batch(state, actions)
        return (key, state), ()
      (key, state), _ = jax.lax.scan(body, (key, state), (), length=chunk)
      return key, state

    key_g, state_g = run(key_g, state_g)          # compile + warm
    jax.block_until_ready(state_g.data.qpos)
    t0 = time.perf_counter()
    n = 0
    while n < steps:
      key_g, state_g = run(key_g, state_g)
      n += chunk
    jax.block_until_ready(state_g.data.qpos)
    wall = time.perf_counter() - t0

  rate = batch * n / wall
  print(f'[worker {pid}] {task_name}: B={batch} {rate:,.0f} env steps/s '
        f'({N_PROC} processes x {DEV_PER_PROC} devices)', flush=True)
  if pid == 0:
    row = {
        'task': task_name, 'batch': batch, 'steps': n,
        'n_processes': N_PROC, 'n_devices': N_PROC * DEV_PER_PROC,
        'env_steps_per_s': rate,
        'backend': 'cpu (2-process jax.distributed virtual mesh; '
                   'exercises the multi-controller SPMD path — wall-clock '
                   'is NOT a TPU throughput claim)',
    }
    with open(os.environ.get('MULTIHOST_OUT',
                             '/tmp/multihost_suite_row.json'), 'w') as f:
      json.dump(row, f)
  jax.distributed.shutdown()


def parent() -> int:
  env = dict(os.environ)
  env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                      + f' --xla_force_host_platform_device_count='
                        f'{DEV_PER_PROC}').strip()
  env['JAX_PLATFORMS'] = 'cpu'
  procs = [subprocess.Popen(
      [sys.executable, os.path.abspath(__file__), str(pid)],
      env=env, cwd=REPO) for pid in range(N_PROC)]
  rc = 0
  for pid, p in enumerate(procs):
    try:
      code = p.wait(timeout=int(os.environ.get('MH_TIMEOUT', '1800')))
    except subprocess.TimeoutExpired:
      p.kill()
      code = -9
    if code != 0:
      print(f'[parent] worker {pid} FAILED (exit {code})', file=sys.stderr)
      rc = 1
  return rc


if __name__ == '__main__':
  if len(sys.argv) > 1:
    worker(int(sys.argv[1]))
  else:
    sys.exit(parent())
