"""Multi-host (multi-process) sharded-solve dryrun.

Exercises the one code path no single-process test can: a real
`jax.distributed.initialize` cluster (2 local processes, localhost
coordinator) with a GLOBAL device mesh spanning both processes (4 virtual
CPU devices each -> 8 global), running one population-sharded MPC solve
(`planners/distributed.sharded_solve`) whose all_gather crosses the
process boundary — the same multi-controller SPMD pattern a v5e pod slice
runs over ICI/DCN (SURVEY.md §2.8; `parallel/sharding.initialize_distributed`).

Usage (from the repo root):
    python tools/run_multihost_dryrun.py          # parent: spawns 2 workers
Exit code 0 = both workers ran the cross-process sharded solve.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 4
PORT = int(os.environ.get('DRYRUN_COORD_PORT', '12421'))


def worker(pid: int) -> None:
  import jax
  jax.config.update('jax_platforms', 'cpu')
  jax.distributed.initialize(
      coordinator_address=f'localhost:{PORT}',
      num_processes=N_PROC, process_id=pid)
  assert jax.process_count() == N_PROC
  assert len(jax.local_devices()) == DEV_PER_PROC
  assert len(jax.devices()) == N_PROC * DEV_PER_PROC
  # In multi-controller mode the process-global default device is
  # jax.devices()[0] — remote for every process but 0.  Pin local array
  # creation / single-device dispatch to this process's first device
  # (global SPMD computations below are explicitly sharded over the mesh).
  jax.config.update('jax_default_device', jax.local_devices()[0])

  import numpy as np
  from jax.sharding import NamedSharding, PartitionSpec as P

  from dexterity_tpu import manipulation
  from dexterity_tpu.parallel import sharding
  from dexterity_tpu.planners import distributed
  from dexterity_tpu.planners import predictive_sampling as ps

  # Warm the cross-process Gloo context NOW, while process skew is only
  # startup time: the CPU collective backend's key-value exchange has a
  # hard 30 s deadline, far shorter than the physics program's compile
  # time — a cold first collective after skewed compiles deadlocks.
  mesh0 = sharding.make_mesh()
  tiny = jax.make_array_from_callback(
      (len(jax.devices()),), NamedSharding(mesh0, P(sharding.BATCH_AXIS)),
      lambda idx: np.ones(1, np.float32))
  total = jax.jit(jax.numpy.sum, out_shardings=NamedSharding(mesh0, P()))(
      tiny)
  # Multi-process global arrays can't be fetched whole; read the local
  # replica (the output is replicated on every device).
  total_val = float(np.asarray(total.addressable_shards[0].data))
  assert total_val == len(jax.devices()), total_val
  print(f'[worker {pid}] barrier OK (gloo context up)', flush=True)

  # In multi-controller mode the process-global default device is
  # jax.devices()[0] — remote for every process but 0; pin local model
  # building and the local reset to this process's first device.
  with jax.default_device(jax.local_devices()[0]):
    task = manipulation.build_task('reach', 'state_dense')
    env = manipulation._environment.GoalEnvironment(task)
    planner = ps.PredictiveSampling(
        task, ps.PredictiveSamplingConfig(horizon=2, num_samples=8,
                                          num_knots=0, iterations=2))
    # Regression guard for the core/spec.py invweight placement bug: model
    # constants must live on THIS process's devices.
    model = task.compile()
    assert model.body_invweight0.sharding.device_set <= set(
        jax.local_devices()), model.body_invweight0.sharding
    # Every process computes the identical initial state locally (same
    # key), then promotes it to replicated GLOBAL arrays for the solve.
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
    pstate = planner.init_state()
  mesh = sharding.make_mesh()                     # global 8-device mesh
  repl = NamedSharding(mesh, P())

  def to_global(x):
    host = np.asarray(x)
    return jax.make_array_from_callback(host.shape, repl,
                                        lambda idx: host[idx])

  data_g = jax.tree_util.tree_map(to_global, state.data)
  goal_g = to_global(state.task.goal)
  pstate_g = jax.tree_util.tree_map(to_global, pstate)
  key_g = to_global(jax.random.PRNGKey(1))

  with mesh:
    action, pstate2 = jax.jit(
        lambda d, g, p, k: distributed.sharded_solve(
            planner, mesh, d, g, p, k))(data_g, goal_g, pstate_g, key_g)
    # Scalar reduction -> replicated output, addressable on every process.
    checksum = jax.jit(
        lambda a: jax.numpy.sum(a * a),
        out_shardings=repl)(action)
    val = float(np.asarray(checksum.addressable_shards[0].data))
  assert np.isfinite(val), val
  print(f'[worker {pid}] cross-process sharded solve OK '
        f'(|action|^2 = {val:.6f}, {jax.process_count()} processes x '
        f'{DEV_PER_PROC} devices)', flush=True)
  jax.distributed.shutdown()


def parent() -> int:
  env = dict(os.environ)
  env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                      + f' --xla_force_host_platform_device_count='
                        f'{DEV_PER_PROC}').strip()
  env['JAX_PLATFORMS'] = 'cpu'
  env.pop('JAX_COORDINATOR_ADDRESS', None)
  procs = []
  for pid in range(N_PROC):
    procs.append(subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), str(pid)],
        env=env, cwd=REPO))
  rc = 0
  for pid, p in enumerate(procs):
    try:
      code = p.wait(timeout=int(os.environ.get('DRYRUN_TIMEOUT', '900')))
    except subprocess.TimeoutExpired:
      p.kill()
      code = -9
    if code != 0:
      print(f'[parent] worker {pid} FAILED (exit {code})', file=sys.stderr)
      rc = 1
  if rc == 0:
    print(f'[parent] multi-host dryrun OK: {N_PROC} processes x '
          f'{DEV_PER_PROC} virtual devices, cross-process all_gather '
          f'executed.')
  return rc


if __name__ == '__main__':
  if len(sys.argv) > 1:
    worker(int(sys.argv[1]))
  else:
    sys.exit(parent())
