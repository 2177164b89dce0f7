"""Device-trace one pipeline stage and print top kernels by total time.

Runs STAGE (default coll; see bench_stages_scan stages) scanned K times in
one jit under jax.profiler.trace, then parses the trace_viewer JSON and
aggregates per-kernel durations on the device track.  Prints the top-N
kernels and the total device time per iteration.
"""

import glob
import gzip
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
  from dexterity_tpu.core.types import make_data
  from dexterity_tpu.physics import constraint as constraint_mod
  from dexterity_tpu.physics import kinematics, smooth
  from dexterity_tpu.physics import step as phys_step
  from dexterity_tpu.physics.collision import narrowphase

  B = int(os.environ.get('BENCH_SAMPLES', '512'))
  K = int(os.environ.get('SCAN_STEPS', '20'))
  stage_name = os.environ.get('STAGE', 'coll')
  task = manipulation.build_task('reorient', 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  model = task.compile()
  opt = model.opt
  if 'SOLVER_ITS' in os.environ:
    opt = opt.replace(solver_iterations=int(os.environ['SOLVER_ITS']))
  if 'LS_ITS' in os.environ:
    opt = opt.replace(ls_iterations=int(os.environ['LS_ITS']))
  if 'CONTACT_TOP_K' in os.environ:
    opt = opt.replace(contact_top_k=int(os.environ['CONTACT_TOP_K']))
  model = model.replace(opt=opt)
  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
  src = state.data
  d = make_data(model, dtype=src.qpos.dtype)
  d = d.replace(qpos=src.qpos, qvel=src.qvel, ctrl=src.ctrl,
                mocap_pos=src.mocap_pos, mocap_quat=src.mocap_quat)
  d = phys_step.forward(model, d)
  bdata = jtu.tree_map(
      lambda x: jnp.broadcast_to(x[None], (B,) + x.shape).copy(), d)

  def qfrc(m, dd):
    return (dd.qfrc_passive + dd.qfrc_actuator + dd.qfrc_applied
            + smooth.xfrc_accumulate(m, dd) - dd.qfrc_bias)

  stages = {
      'kin': lambda dd: kinematics.fwd_position(model, dd),
      'crb': lambda dd: smooth.crb(model, dd),
      'coll': lambda dd: narrowphase.collision(model, dd),
      'vel': lambda dd: phys_step.fwd_velocity(model, dd),
      'solve': lambda dd: constraint_mod.solve(model, dd, qfrc(model, dd)),
      'euler': lambda dd: smooth.euler(model, dd),
      'full': lambda dd: phys_step.step(model, dd),
      'hot': lambda dd: phys_step.step_hot(model, dd),
  }
  fn = stages[stage_name]

  def rollout(data):
    def body(dd, _):
      dd = fn(dd)
      return dd.replace(qpos=dd.qpos + 1e-30 * dd.qacc[0]), ()
    out, _ = jax.lax.scan(body, data, (), length=K)
    return out

  f = jax.jit(jax.vmap(rollout))
  out = f(bdata)
  jax.block_until_ready(out)

  tdir = f'/tmp/dex_trace_{stage_name}'
  os.system(f'rm -rf {tdir}')
  with jax.profiler.trace(tdir):
    out = f(bdata)
    jax.block_until_ready(out)

  files = glob.glob(f'{tdir}/**/*.trace.json.gz', recursive=True)
  assert files, f'no trace under {tdir}'
  with gzip.open(files[0], 'rt') as fh:
    trace = json.load(fh)

  # Device-track events: pick the pid whose process name mentions TPU/device.
  events = [e for e in trace['traceEvents'] if e.get('ph') == 'X']
  # Aggregate by name across all tracks that look like device compute.
  from collections import defaultdict
  agg = defaultdict(float)
  cnt = defaultdict(int)
  total = 0.0
  for e in events:
    name = e.get('name', '')
    dur = e.get('dur', 0) / 1e3  # us -> ms
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
  print(f'stage={stage_name} B={B} K={K} total device-op time: '
        f'{total:.1f} ms -> {total/K:.3f} ms/iter')
  for name, ms in items[:25]:
    print(f'  {ms:8.2f} ms  x{cnt[name]:4d}  {name[:70]}')


if __name__ == '__main__':
  main()
