"""Vision-preset throughput measurement (r5 VERDICT weak #6).

Camera observables render host-side (EGL via pure_callback, rendering.py);
this tool measures what that host round-trip does to batched env stepping:
env steps/s for the reorient VISION preset at B=BATCH (default 8) vs the
state preset at the same batch, plus the per-step host/device time split.

  MUJOCO_GL=egl python tools/bench_vision.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('MUJOCO_GL', 'egl')

import jax
import jax.numpy as jnp

os.makedirs('/tmp/dexterity_tpu_jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/dexterity_tpu_jax_cache')


def bench(obs_set, batch: int, steps: int):
  from dexterity_tpu import manipulation
  from dexterity_tpu.manipulation.shared import observations
  from dexterity_tpu.manipulation.tasks import reorient
  task = reorient.reorient_task(observation_set=obs_set)
  env = manipulation._environment.GoalEnvironment(task)
  keys = jax.random.split(jax.random.PRNGKey(0), batch)
  reset = jax.jit(jax.vmap(env.reset))
  step = jax.jit(jax.vmap(env.step))
  states, ts = reset(keys)
  nu = env.action_spec().shape[0]
  actions = jnp.zeros((batch, nu))
  states, ts = step(states, actions)            # compile
  jax.block_until_ready(jax.tree_util.tree_leaves(ts.observation)[0])
  t0 = time.perf_counter()
  for _ in range(steps):
    states, ts = step(states, actions)
  jax.block_until_ready(jax.tree_util.tree_leaves(ts.observation)[0])
  wall = time.perf_counter() - t0
  return batch * steps / wall, wall / steps


def main():
  batch = int(os.environ.get('BATCH', '8'))
  steps = int(os.environ.get('STEPS', '20'))
  from dexterity_tpu.manipulation.shared import observations
  state_rate, state_ms = bench(
      observations.ObservationSet.STATE_ONLY, batch, steps)
  vis_rate, vis_ms = bench(
      observations.ObservationSet.VISION_ONLY, batch, steps)
  print(f'B={batch} backend={jax.default_backend()}')
  print(f'state_dense : {state_rate:10,.1f} env steps/s '
        f'({state_ms*1e3:.1f} ms/step-batch)')
  print(f'vision_dense: {vis_rate:10,.1f} env steps/s '
        f'({vis_ms*1e3:.1f} ms/step-batch)')
  print(f'host-render overhead: {(vis_ms-state_ms)*1e3:.1f} ms/step-batch '
        f'({(vis_ms-state_ms)/batch*1e3:.2f} ms per camera frame set)')


if __name__ == '__main__':
  main()
