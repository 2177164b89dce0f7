"""Renders a task rollout to an animated GIF (host-side MuJoCo renderer).

The reference's examples render GIFs/mp4s through dm_control
(/root/reference/dexterity/examples/actuate_fingers.py,
oracle_reach.py); this is the equivalent visualization path for the TPU
framework: physics runs in JAX, frames come from
dexterity_tpu.rendering.HostRenderer over the exported MJCF.

Usage:
  python scripts/render_rollout.py --environment_name reorient.state_dense \
      --steps 100 --out /tmp/rollout.gif
  # --policy random|zero|oracle (oracle: reach only)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs('/tmp/dexterity_tpu_jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/dexterity_tpu_jax_cache')
# The axon TPU plugin overrides the JAX_PLATFORMS env var; honor an
# explicit CPU request via jax.config (rendering is host-side anyway).
if os.environ.get('DEXTERITY_TPU_BACKEND') == 'cpu':
  jax.config.update('jax_platforms', 'cpu')


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--environment_name', default='reach.state_dense')
  ap.add_argument('--steps', type=int, default=100)
  ap.add_argument('--out', default='/tmp/rollout.gif')
  ap.add_argument('--policy', default='random',
                  choices=['random', 'zero', 'oracle'])
  ap.add_argument('--height', type=int, default=240)
  ap.add_argument('--width', type=int, default=320)
  ap.add_argument('--fps', type=int, default=20)
  ap.add_argument('--seed', type=int, default=0)
  args = ap.parse_args()

  from dexterity_tpu import manipulation, rendering
  from dexterity_tpu.manipulation.shared import cameras

  domain, task_name = args.environment_name.split('.')
  task = manipulation.build_task(domain, task_name)
  env = manipulation._environment.GoalEnvironment(task)
  model = task.compile()
  task.after_compile(model)
  renderer = rendering.HostRenderer(
      task.arena.spec, model, [cameras.FRONT_CLOSE],
      height=args.height, width=args.width)

  reset = jax.jit(env.reset)
  step = jax.jit(env.step)
  key = jax.random.PRNGKey(args.seed)
  key, sub = jax.random.split(key)
  state, ts = reset(sub)
  spec = env.action_spec()
  lo = np.where(np.isfinite(spec.minimum), spec.minimum, -1.0)
  hi = np.where(np.isfinite(spec.maximum), spec.maximum, 1.0)

  if args.policy == 'oracle':
    assert domain == 'reach', 'oracle policy is defined for reach'
    hand = task.hands[0]

  frames = []
  rng = np.random.default_rng(args.seed)
  for i in range(args.steps):
    if args.policy == 'random':
      action = jnp.asarray(lo + rng.uniform(0, 1, lo.shape) * (hi - lo))
    elif args.policy == 'zero':
      action = jnp.asarray((lo + hi) / 2)
    else:
      qpos_goal = state.task.goal[15:]
      action = jnp.asarray(
          hand.joint_positions_to_control(np.asarray(qpos_goal)))
    state, ts = step(state, action)
    img = renderer.render_state(
        np.asarray(state.data.qpos), np.asarray(state.data.mocap_pos),
        np.asarray(state.data.mocap_quat))[0]
    frames.append(img)
    if bool(ts.last()):
      break

  import imageio
  imageio.mimsave(args.out, frames, fps=args.fps, loop=0)
  print(f'wrote {args.out} ({len(frames)} frames, '
        f'{args.width}x{args.height})')


if __name__ == '__main__':
  main()
