"""Amortized per-stage timing of the HOT (plane-form) substep pipeline.

Times nested prefixes of step_hot's stages inside one vmapped scan each, so
stage cost = difference of successive prefixes (single-stage jits are
dispatch-dominated on the tunneled backend).  Stages:
  pre    — _precompute_planes (FK + frames + inertias + CRB + RNE)
  coll   — + collide_group_planes
  act    — + actuation/passive/xfrc (qfrc_smooth)
  solve  — + constraint solve (Newton)
  full   — + euler integration (== step_hot)
Also times the batched Cholesky kernel standalone (3 calls/substep class).

Env knobs: BENCH_SAMPLES, SCAN_STEPS, MIDPHASE_CAP, CONTACT_TOP_K,
SOLVER_ITS, LS_ITS, BATCHED (step_hot_b layout instead of vmap).
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
  from dexterity_tpu.physics import smooth
  from dexterity_tpu.physics import step as phys_step
  from dexterity_tpu.physics.collision import primitives

  B = int(os.environ.get('BENCH_SAMPLES', '512'))
  K = int(os.environ.get('SCAN_STEPS', '50'))
  task = manipulation.build_task('reorient', 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  model = task.compile()
  opt = model.opt
  for name, attr in (('MIDPHASE_CAP', 'midphase_cap'),
                     ('CONTACT_TOP_K', 'contact_top_k'),
                     ('SOLVER_ITS', 'solver_iterations'),
                     ('LS_ITS', 'ls_iterations'),
                     ('REFAC', 'solver_refactor_every')):
    if name in os.environ:
      opt = opt.replace(**{attr: int(os.environ[name])})
  if os.environ.get('IMPLICIT', '0') == '1':
    opt = opt.replace(implicit_damping=True)
  if 'TIMESTEP' in os.environ:
    opt = opt.replace(timestep=float(os.environ['TIMESTEP']))
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
    print(f'prop-only pairs: {model.npair}')

  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
  src = state.data
  d = make_data(model, dtype=src.qpos.dtype)
  d = d.replace(qpos=src.qpos, qvel=src.qvel, ctrl=src.ctrl,
                mocap_pos=src.mocap_pos, mocap_quat=src.mocap_quat)
  # Valid SPD qM so the standalone Cholesky stage factorizes real data.
  pre0 = jax.jit(lambda dd: phys_step._precompute_planes(
      model, dd.qpos, dd.qvel, dd.mocap_pos, dd.mocap_quat))(d)
  d = d.replace(qM=pre0['qm'], qfrc_bias=pre0['qfrc_bias'])
  bdata = jtu.tree_map(
      lambda x: jnp.broadcast_to(x[None], (B,) + x.shape).copy(), d)

  # Each stage returns (data, probe): probe is a scalar that depends on
  # EVERY output of the stage, and is folded into the next iteration's
  # qpos — otherwise XLA dead-code-eliminates the untimed tail of the
  # pipeline and all prefixes time the same.
  def _psum(pre):
    return sum(jnp.sum(v) for v in jax.tree.leaves(pre))

  def stage_pre(data):
    pre = phys_step._precompute_planes(model, data.qpos, data.qvel,
                                       data.mocap_pos, data.mocap_quat)
    return data, _psum(pre)

  def _coll(data):
    pre = phys_step._precompute_planes(model, data.qpos, data.qvel,
                                       data.mocap_pos, data.mocap_quat)
    groups = primitives.collide_group_planes(
        model, pre['gpos'], pre['gmat'], data.qpos[0] * 0, data.qpos.dtype)
    return pre, groups

  def stage_coll(data):
    pre, groups = _coll(data)
    return data, _psum(pre) + _psum(groups)

  def _act(data):
    pre, groups = _coll(data)
    data = data.replace(qM=pre['qm'], qfrc_bias=pre['qfrc_bias'],
                        cdof=pre['cdof6'].T, ten_length=pre['ten_length'],
                        ten_velocity=pre['ten_velocity'])
    if model.neq:
      data = data.replace(xpos=pre['xpos_p'].T, xquat=pre['xquat_p'].T)
    data = smooth.actuation(model, data)
    data = smooth.passive(model, data)
    qfrc_smooth = (data.qfrc_passive + data.qfrc_actuator
                   + data.qfrc_applied
                   + smooth.xfrc_planes(model, pre['xipos3'], pre['cdof6'],
                                        data.xfrc_applied)
                   - data.qfrc_bias)
    return data, pre, groups, qfrc_smooth

  def stage_act(data):
    d2, pre, groups, qf = _act(data)
    return data, _psum(groups) + jnp.sum(qf) + jnp.sum(d2.qM)

  def stage_solve(data):
    d2, pre, groups, qf = _act(data)
    d2 = constraint_mod.solve(model, d2, qf, contact_groups=groups)
    # Thread qacc into the next iteration's qvel (a real state update, like
    # the integrator) — scalar probes alone were loop-collapsed by XLA.
    return data.replace(qvel=data.qvel + 1e-30 * d2.qacc,
                        qacc=d2.qacc), jnp.zeros((), data.qpos.dtype)

  def stage_full(data):
    d2 = phys_step.step_hot(model, data)
    return d2, jnp.zeros((), data.qpos.dtype)

  def chol3(data):
    from dexterity_tpu.physics import linalg_pallas
    x = linalg_pallas.cholesky_solve(data.qM, data.qfrc_bias)
    x = linalg_pallas.cholesky_solve(data.qM, x)
    x = linalg_pallas.cholesky_solve(data.qM, x)
    return data, jnp.sum(x)

  stages = {
      'pre': stage_pre,
      'coll': stage_coll,
      'act': stage_act,
      'solve': stage_solve,
      'full': stage_full,
      'chol3': chol3,
  }
  sel = os.environ.get('STAGE', '').split(',') if os.environ.get('STAGE') \
      else list(stages)

  prev = 0.0
  for name in sel:
    fn = stages[name]

    def rollout(data, fn=fn):
      def body(dd, _):
        dd, probe = fn(dd)
        return dd.replace(qpos=dd.qpos + 1e-30 * probe), ()
      out, _ = jax.lax.scan(body, data, (), length=K)
      return out

    f = jax.jit(jax.vmap(rollout))
    t0 = time.perf_counter()
    out = f(bdata)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
      out = f(bdata)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n / K
    delta = dt * 1e3 - prev
    print(f'{name:6s} {dt*1e3:8.3f} ms/iter  (+{delta:6.3f})  '
          f'(compile {compile_s:.0f}s)', flush=True)
    if name in ('pre', 'coll', 'act', 'solve', 'full'):
      prev = dt * 1e3


if __name__ == '__main__':
  main()
