"""Amortized per-stage timing: each pipeline stage scanned K times in one jit.

Single-call stage timings are dominated by dispatch/transfer overhead on the
tunneled backend; this harness scans each stage K times with a data
dependency (qpos perturbed per iteration) so the measured time is device
compute.  STAGE env var selects: kin, crb, coll, vel, asm, solve, euler,
full (default: all).
"""

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
  K = int(os.environ.get('SCAN_STEPS', '50'))
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
  # Warm up derived quantities so every stage sees realistic data.
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
      'asm': lambda dd: dd.replace(
          qacc=dd.qacc + 1e-30 * jnp.sum(
              constraint_mod.assemble(model, dd).J)),
      'solve': lambda dd: constraint_mod.solve(model, dd, qfrc(model, dd)),
      'euler': lambda dd: smooth.euler(model, dd),
      'full': lambda dd: phys_step.step(model, dd),
  }
  sel = os.environ.get('STAGE', '').split(',') if os.environ.get('STAGE') \
      else list(stages)

  for name in sel:
    fn = stages[name]

    def rollout(data, fn=fn):
      def body(dd, _):
        dd = fn(dd)
        # Data dependency: nudge qpos so iterations can't collapse.
        return dd.replace(qpos=dd.qpos + 1e-30 * dd.qacc[0]), ()
      out, _ = jax.lax.scan(body, data, (), length=K)
      return out

      # (euler advances time; harmless.)

    f = jax.jit(jax.vmap(rollout))
    t0 = time.perf_counter()
    out = f(bdata)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
      out = f(bdata)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n / K
    print(f'{name:6s} {dt*1e3:8.3f} ms/iter   (compile {compile_s:.0f}s)',
          flush=True)


if __name__ == '__main__':
  main()
