"""Stage-by-stage timing of the batched reorient physics substep.

Times each pipeline stage jitted in isolation at B=BENCH_SAMPLES (default
512), plus the composed substep, to locate where the per-substep time goes.
Run on the real chip:  python tools/profile_stages.py
TASK=juggle profiles the two-MPL-hand model (r4 VERDICT weak #5).
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


def timeit(fn, *args, n=20):
  out = fn(*args)
  jax.block_until_ready(out)
  t0 = time.perf_counter()
  for _ in range(n):
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.perf_counter() - t0) / n


def main():
  from dexterity_tpu import manipulation
  from dexterity_tpu.physics import constraint as constraint_mod
  from dexterity_tpu.physics import kinematics, smooth
  from dexterity_tpu.physics import step as phys_step
  from dexterity_tpu.physics.collision import narrowphase

  B = int(os.environ.get('BENCH_SAMPLES', '512'))
  domain = os.environ.get('TASK', 'reorient')
  variant = 'state_sparse' if domain == 'juggle' else 'state_dense'
  task = manipulation.build_task(domain, variant)
  env = manipulation._environment.GoalEnvironment(task)
  model = task.compile()
  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
  data = state.data

  bdata = jtu.tree_map(
      lambda x: jnp.broadcast_to(x[None], (B,) + x.shape).copy()
      if hasattr(x, 'shape') else x, data)

  def stage(name, fn):
    f = jax.jit(jax.vmap(lambda d: fn(model, d)))
    dt = timeit(f, bdata)
    print(f'{name:28s} {dt*1e3:9.3f} ms')
    return dt

  print(f'B={B}  nv={model.nv}  backend={jax.default_backend()}')
  total = 0.0
  total += stage('fwd_position:kinematics', kinematics.fwd_position)
  total += stage('fwd_position:crb', smooth.crb)
  total += stage('collision', narrowphase.collision)
  total += stage('fwd_velocity (all)', lambda m, d: phys_step.fwd_velocity(m, d))

  # Constraint solve on fully-forwarded data.
  fwd_pos_vel = jax.jit(jax.vmap(
      lambda d: phys_step.fwd_velocity(model,
                                       phys_step.fwd_position(model, d))))
  bdata_fv = fwd_pos_vel(bdata)
  jax.block_until_ready(bdata_fv)

  def qfrc(m, d):
    return (d.qfrc_passive + d.qfrc_actuator + d.qfrc_applied
            + smooth.xfrc_accumulate(m, d) - d.qfrc_bias)

  total += stage('constraint:assemble',
                 lambda m, d: constraint_mod.assemble(m, d))

  def solve_stage(m, d):
    return constraint_mod.solve(m, d, qfrc(m, d))
  f = jax.jit(jax.vmap(lambda d: solve_stage(model, d)))
  dt = timeit(f, bdata_fv)
  print(f'{"constraint:solve(incl asm)":28s} {dt*1e3:9.3f} ms')

  total += stage('euler', smooth.euler)
  print(f'{"sum of isolated stages":28s} {total*1e3:9.3f} ms (+solve overlaps)')

  f = jax.jit(jax.vmap(lambda d: phys_step.step(model, d)))
  dt = timeit(f, bdata)
  print(f'{"FULL substep":28s} {dt*1e3:9.3f} ms   '
        f'({B/dt:.0f} env-substeps/s)')

  # Row-count diagnostics.
  rows = jax.eval_shape(lambda d: constraint_mod.assemble(model, d), data)
  print(f'nrow={rows.J.shape[0]}  nv={model.nv}')


if __name__ == '__main__':
  main()
