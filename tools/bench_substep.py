"""Per-substep timing harness: one jitted lax.scan of K physics substeps.

This amortizes per-call dispatch/transfer overhead (which dominates single-
call stage timings on the tunneled backend) and matches the planner's
rollout structure.  Knobs via env vars:
  BENCH_SAMPLES (B, default 512), SCAN_STEPS (default 50),
  MIDPHASE_CAP / CONTACT_TOP_K / SOLVER_ITS / LS_ITS to override model.opt.
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
  from dexterity_tpu.core.types import make_data, num_contact_points
  from dexterity_tpu.physics import step as phys_step

  B = int(os.environ.get('BENCH_SAMPLES', '512'))
  K = int(os.environ.get('SCAN_STEPS', '50'))
  task = manipulation.build_task('reorient', 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  model = task.compile()
  opt = model.opt
  if 'MIDPHASE_CAP' in os.environ:
    opt = opt.replace(midphase_cap=int(os.environ['MIDPHASE_CAP']))
  if 'CONTACT_TOP_K' in os.environ:
    opt = opt.replace(contact_top_k=int(os.environ['CONTACT_TOP_K']))
  if 'SOLVER_ITS' in os.environ:
    opt = opt.replace(solver_iterations=int(os.environ['SOLVER_ITS']))
  if 'LS_ITS' in os.environ:
    opt = opt.replace(ls_iterations=int(os.environ['LS_ITS']))
  if 'REFAC' in os.environ:
    opt = opt.replace(solver_refactor_every=int(os.environ['REFAC']))
  if os.environ.get('IMPLICIT', '0') == '1':
    opt = opt.replace(implicit_damping=True)
  if 'TIMESTEP' in os.environ:
    opt = opt.replace(timestep=float(os.environ['TIMESTEP']))
  if os.environ.get('DISABLE', '0') == '1':
    opt = opt.replace(disable_constraint=True)
  model = model.replace(opt=opt)
  if os.environ.get('PROP_ONLY', '0') == '1':
    from dexterity_tpu.core import types as T
    import numpy as np
    moving = T.moving_base_bodies(model)
    gb = np.asarray(model.geom_bodyid)
    keep = [i for i in range(model.npair)
            if int(gb[model.pair_geom1[i]]) in moving
            or int(gb[model.pair_geom2[i]]) in moving]
    model = T.subset_pairs(model, keep)

  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
  src = state.data
  d = make_data(model, dtype=src.qpos.dtype)
  d = d.replace(qpos=src.qpos, qvel=src.qvel, ctrl=src.ctrl,
                mocap_pos=src.mocap_pos, mocap_quat=src.mocap_quat)
  bdata = jtu.tree_map(
      lambda x: jnp.broadcast_to(x[None], (B,) + x.shape).copy(), d)

  if os.environ.get('BATCHED', '0') == '1':
    refresh = os.environ.get('REFRESH', 'full')
    def rollout(data):
      return phys_step.step_n_b(model, data, K, refresh=refresh)
  else:
    refresh = os.environ.get('REFRESH', 'full')
    def rollout(data):
      return jax.vmap(
          lambda dd: phys_step.step_n(model, dd, K, refresh=refresh))(data)

  f = jax.jit(rollout)
  t0 = time.perf_counter()
  out = f(bdata)
  jax.block_until_ready(out)
  print(f'compile+first: {time.perf_counter()-t0:.1f} s', flush=True)

  n = max(1, int(os.environ.get('REPS', '5')))
  t0 = time.perf_counter()
  for _ in range(n):
    out = f(bdata)
  jax.block_until_ready(out)
  dt = (time.perf_counter() - t0) / n
  per_substep = dt / K
  print(f'B={B} K={K} cap={model.opt.midphase_cap} '
        f'topk={model.opt.contact_top_k} '
        f'newton={model.opt.solver_iterations}/{model.opt.ls_iterations} '
        f'slots={num_contact_points(model)}')
  print(f'scan: {dt*1e3:.1f} ms -> {per_substep*1e3:.3f} ms/substep '
        f'({B/per_substep:.0f} env-substeps/s)')
  print('finite:', bool(jnp.all(jnp.isfinite(out.qpos))))


if __name__ == '__main__':
  main()
