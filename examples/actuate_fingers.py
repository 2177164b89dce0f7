"""Scripted finger actuation (reference: examples/actuate_fingers.py).

Drives each Shadow-hand actuator group through a sinusoidal schedule and
prints joint tracking statistics.  Pass --gif PATH to also render the
rollout to an animated GIF through the host-side MuJoCo renderer
(dexterity_tpu.rendering) — the reference example's offscreen-render
output (examples/actuate_fingers.py upstream).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--gif', default='', help='render rollout to this path')
  ap.add_argument('--fps', type=int, default=25)
  args = ap.parse_args()
  from dexterity_tpu.core import types as T
  from dexterity_tpu.models import hands
  from dexterity_tpu.physics import step as physics_step
  from dexterity_tpu.manipulation.goals.fingertip_position import (
      compensate_gravity)

  hand = hands.ShadowHandSeriesE()
  model = hand.spec.compile()
  data = T.make_data(model)
  data = compensate_gravity(model, data,
                            np.arange(1, model.nbody, dtype=np.int32))

  rng = np.asarray(model.actuator_ctrlrange)
  mid = rng.mean(axis=1)
  amp = (rng[:, 1] - rng[:, 0]) / 2

  step = jax.jit(lambda d: physics_step.step_n(model, d, 5))
  qpos_hist = []
  for t in range(100):
    phase = 2 * np.pi * t / 100
    ctrl = mid + 0.5 * amp * np.sin(phase + np.arange(model.nu))
    data = data.replace(ctrl=jnp.asarray(ctrl))
    data = step(data)
    qpos_hist.append(np.asarray(data.qpos))
  qpos_hist = np.stack(qpos_hist)
  print(f'rolled {len(qpos_hist)} control steps; qpos range per joint:')
  span = qpos_hist.max(axis=0) - qpos_hist.min(axis=0)
  for name, s in zip(model.jnt_names, span):
    print(f'  {name:12s} travelled {s:.3f} rad')

  if args.gif:
    from dexterity_tpu import rendering
    from dexterity_tpu.manipulation.shared import cameras
    # Frame the palm/fingers (the hand extends along +z from the forearm
    # root at the origin; the palm sits around z ~= 0.35).
    cam = cameras.CameraConfig(
        name='hand_front', pos=(0.0, -0.45, 0.35),
        xyaxes=(1.0, 0.0, 0.0, 0.0, 0.1, 0.995))
    renderer = rendering.HostRenderer(hand.spec, model, [cam],
                                      height=240, width=320)
    zero3 = np.zeros((0, 3))
    zero4 = np.zeros((0, 4))
    frames = [renderer.render_state(q, zero3, zero4)[0] for q in qpos_hist]
    import imageio
    imageio.mimsave(args.gif, frames, fps=args.fps, loop=0)
    print(f'wrote {args.gif} ({len(frames)} frames)')


if __name__ == '__main__':
  main()
