"""Ablation inside collide_group_planes (scan-amortized, real code path).

Replicates collide_group_planes stage by stage so the cost of each part is
the difference of successive rows:
  score  — midphase scores + approx_top_k only
  onehot — + one-hot selection of dyn/static planes
  kern   — + SoA narrow-phase kernels + tangent frames (== full stage)
Also per-group 'kern' isolation via GROUP=i.

Env: BENCH_SAMPLES, SCAN_STEPS, MIDPHASE_CAP, CONTACT_TOP_K, STAGE, GROUP.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

os.makedirs('/tmp/dexterity_tpu_jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/dexterity_tpu_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)


def main():
  from dexterity_tpu import manipulation
  from dexterity_tpu.core.types import GeomType, make_data
  from dexterity_tpu.physics import step as phys_step
  from dexterity_tpu.physics.collision import soa
  from dexterity_tpu.physics.collision.primitives import (
      _bounding_radius, _pair_groups, _tangent_frame_soa, collision_size,
      onehot_select)

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
  model = model.replace(opt=opt)
  if os.environ.get('PROP_ONLY', '0') == '1':
    from dexterity_tpu.core import types as T
    moving = T.moving_base_bodies(model)
    gb = np.asarray(model.geom_bodyid)
    keep = [i for i in range(model.npair)
            if int(gb[model.pair_geom1[i]]) in moving
            or int(gb[model.pair_geom2[i]]) in moving]
    model = T.subset_pairs(model, keep)

  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
  src = state.data
  d0 = make_data(model, dtype=src.qpos.dtype)
  d0 = d0.replace(qpos=src.qpos, qvel=src.qvel, ctrl=src.ctrl,
                  mocap_pos=src.mocap_pos, mocap_quat=src.mocap_quat)
  d0 = jax.jit(lambda d: phys_step.fwd_position(model, d))(d0)
  bdata = jtu.tree_map(
      lambda x: jnp.broadcast_to(x[None], (B,) + x.shape).copy(), d0)

  groups, _ = _pair_groups(model)
  radius = _bounding_radius(model)
  size_np = collision_size(model)
  margin_np = np.asarray(jax.device_get(model.pair_margin))
  dtype = d0.qpos.dtype
  only = int(os.environ['GROUP']) if os.environ.get('GROUP') else None

  def run(data, stage):
    gpos = tuple(data.geom_xpos[:, c] for c in range(3))
    gmat = tuple(data.geom_xmat[:, i, j] for i in range(3) for j in range(3))
    all_planes = list(gpos) + list(gmat)

    def expand(gids, rows=range(12)):
      return tuple(all_planes[r][gids] for r in rows)

    acc = jnp.zeros((), dtype)
    for gi, ((t1g, t2g), grp) in enumerate(groups.items()):
      if only is not None and gi != only:
        continue
      m = grp['m']
      g1 = np.asarray(grp['g1'], np.int32)
      g2 = np.asarray(grp['g2'], np.int32)
      pair_np = np.asarray(grp['pair'], np.int32)
      n = len(g1)

      if m < n:
        p1 = expand(g1, rows=range(3))
        p2 = expand(g2, rows=range(3))
        delta = soa.sub(p2, p1)
        r2 = jnp.asarray(radius[g2], dtype)
        if t1g == GeomType.PLANE:
          nrm1 = expand(g1, rows=(5, 8, 11))
          score = soa.dot(delta, nrm1) - r2
        else:
          r1 = jnp.asarray(radius[g1], dtype)
          score = jnp.sqrt(jnp.maximum(soa.dot(delta, delta), 0.0)) - r1 - r2
        if jax.default_backend() == 'tpu':
          negs, sel = jax.lax.approx_max_k(-score, m, recall_target=0.95)
          sel = sel.astype(jnp.int32)
        else:
          negs, sel = jax.lax.top_k(-score, m)
        if stage == 'score':
          acc = acc + jnp.sum(negs) + jnp.sum(sel)
          continue
        frames = expand(g1, rows=range(3, 12)) + expand(g2, rows=range(3, 12))
        dyn = onehot_select(sel, jnp.stack(p1 + p2 + frames))
        stat = onehot_select(sel, jnp.asarray(np.concatenate([
            size_np[g1].T, size_np[g2].T,
            pair_np[None].astype(np.float64),
            margin_np[pair_np][None]]), dtype))
        if stage == 'onehot':
          acc = acc + jnp.sum(dyn) + jnp.sum(stat)
          continue
        p1 = tuple(dyn[0:3]); p2 = tuple(dyn[3:6])
        m1_ = tuple(dyn[6:15]); m2_ = tuple(dyn[15:24])
        s1 = tuple(stat[0:3]); s2 = tuple(stat[3:6])
      else:
        if stage in ('score', 'onehot'):
          continue
        p1 = expand(g1, rows=range(3))
        p2 = expand(g2, rows=range(3))
        m1_ = expand(g1, rows=range(3, 12))
        m2_ = expand(g2, rows=range(3, 12))
        s1 = tuple(jnp.asarray(size_np[g1, c], dtype) for c in range(3))
        s2 = tuple(jnp.asarray(size_np[g2, c], dtype) for c in range(3))

      sfn, k = soa.KERNELS[(t1g, t2g)]
      d, p, nrm = sfn(p1, m1_, s1, p2, m2_, s2)
      tt1, tt2 = _tangent_frame_soa(nrm)
      acc = (acc + jnp.sum(d) + sum(jnp.sum(c) for c in p)
             + sum(jnp.sum(c) for c in nrm) + sum(jnp.sum(c) for c in tt1)
             + sum(jnp.sum(c) for c in tt2))
    return acc

  stages = os.environ.get('STAGE', 'score,onehot,kern').split(',')
  prev = 0.0
  for stage in stages:
    def rollout(data, stage=stage):
      def body(dd, _):
        v = run(dd, stage)
        return dd.replace(qpos=dd.qpos + 1e-30 * v,
                          geom_xpos=dd.geom_xpos + 1e-30 * v), ()
      out, _ = jax.lax.scan(body, data, (), length=K)
      return out.qpos

    f = jax.jit(jax.vmap(rollout))
    t0 = time.perf_counter()
    out = f(bdata); jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
      out = f(bdata)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n / K
    print(f'{stage:6s} {dt*1e3:8.3f} ms/iter  (+{dt*1e3-prev:6.3f})  '
          f'(compile {compile_s:.0f}s)', flush=True)
    prev = dt * 1e3


if __name__ == '__main__':
  main()
