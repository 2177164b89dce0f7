"""Ablation timing inside the collision stage (scan-amortized, TPU).

Parts:
  split   — per-geom component planes only
  mid     — midphase scores + top_k + index gathers
  kern    — kernels + frames + stacks on STATIC first-m pairs (no midphase)
  coll    — the real collide_all
Select with PARTS=mid,kern etc.
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
  from dexterity_tpu.physics.collision import primitives, soa
  from dexterity_tpu.physics.collision.primitives import (_bounding_radius,
                                                          _pair_groups,
                                                          _tangent_frame_soa)

  B = int(os.environ.get('BENCH_SAMPLES', '512'))
  K = int(os.environ.get('SCAN_STEPS', '30'))
  task = manipulation.build_task('reorient', 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  model = task.compile()
  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
  src = state.data
  d0 = make_data(model, dtype=src.qpos.dtype)
  d0 = d0.replace(qpos=src.qpos, qvel=src.qvel, ctrl=src.ctrl,
                  mocap_pos=src.mocap_pos, mocap_quat=src.mocap_quat)
  d0 = phys_step.forward(model, d0)
  bdata = jtu.tree_map(
      lambda x: jnp.broadcast_to(x[None], (B,) + x.shape).copy(), d0)

  groups, _ = _pair_groups(model)
  radius = _bounding_radius(model)
  size_np = np.asarray(jax.device_get(model.geom_size))
  dtype = d0.qpos.dtype

  def part_split(data):
    gpos = tuple(data.geom_xpos[:, c] for c in range(3))
    gmat = tuple(data.geom_xmat[:, i, j] for i in range(3) for j in range(3))
    return sum(p.sum() for p in gpos) + sum(m.sum() for m in gmat)

  def part_mid(data):
    gpos = tuple(data.geom_xpos[:, c] for c in range(3))
    gmat = tuple(data.geom_xmat[:, i, j] for i in range(3) for j in range(3))
    acc = 0.0
    for (t1g, t2g), grp in groups.items():
      m = grp['m']
      g1 = np.asarray(grp['g1'], np.int32)
      g2 = np.asarray(grp['g2'], np.int32)
      if m >= len(g1):
        continue
      c1 = tuple(gpos[c][g1] for c in range(3))
      c2 = tuple(gpos[c][g2] for c in range(3))
      delta = soa.sub(c2, c1)
      r2 = jnp.asarray(radius[g2], dtype)
      if t1g == GeomType.PLANE:
        nrm1 = tuple(gmat[3 * c + 2][g1] for c in range(3))
        score = soa.dot(delta, nrm1) - r2
      else:
        r1 = jnp.asarray(radius[g1], dtype)
        score = jnp.sqrt(jnp.maximum(soa.dot(delta, delta), 0.0)) - r1 - r2
      _, sel = jax.lax.top_k(-score, m)
      gg1 = jnp.asarray(g1)[sel]
      p1 = tuple(gpos[c][gg1] for c in range(3))
      acc = acc + sum(p.sum() for p in p1) + sel.sum()
    return acc

  def part_kern(data):
    gpos = tuple(data.geom_xpos[:, c] for c in range(3))
    gmat = tuple(data.geom_xmat[:, i, j] for i in range(3) for j in range(3))
    acc = 0.0
    for (t1g, t2g), grp in groups.items():
      m = grp['m']
      g1 = np.asarray(grp['g1'], np.int32)[:m]
      g2 = np.asarray(grp['g2'], np.int32)[:m]
      sfn, k = soa.KERNELS[(t1g, t2g)]
      p1 = tuple(gpos[c][g1] for c in range(3))
      p2 = tuple(gpos[c][g2] for c in range(3))
      m1_ = tuple(gmat[c][g1] for c in range(9))
      m2_ = tuple(gmat[c][g2] for c in range(9))
      s1 = tuple(jnp.asarray(size_np[g1, c], dtype) for c in range(3))
      s2 = tuple(jnp.asarray(size_np[g2, c], dtype) for c in range(3))
      d, p, nrm = sfn(p1, m1_, s1, p2, m2_, s2)
      tt1, tt2 = _tangent_frame_soa(nrm)
      acc = (acc + d.sum() + sum(c.sum() for c in p)
             + sum(c.sum() for c in tt1) + sum(c.sum() for c in tt2))
    return acc

  def part_coll(data):
    out = primitives.collide_all(model, data)
    return (out.contact.dist.sum() + out.contact.pos.sum()
            + out.contact.frame.sum())

  parts = {'split': part_split, 'mid': part_mid, 'kern': part_kern,
           'coll': part_coll}
  sel = (os.environ.get('PARTS').split(',') if os.environ.get('PARTS')
         else list(parts))

  for name in sel:
    fn = parts[name]

    def rollout(data, fn=fn):
      def body(carry, _):
        data, acc = carry
        v = fn(data)
        data = data.replace(qpos=data.qpos + 1e-30 * v)
        return (data, acc + v), ()
      (data, acc), _ = jax.lax.scan(body, (data, 0.0), (), length=K)
      return acc
    f = jax.jit(jax.vmap(rollout))
    t0 = time.perf_counter()
    out = f(bdata); jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
      out = f(bdata)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n / K
    print(f'{name:6s} {dt*1e3:8.3f} ms/iter  (compile {compile_s:.0f}s)',
          flush=True)


if __name__ == '__main__':
  main()
