"""Scripted finger actuation (reference: examples/actuate_fingers.py).

Drives each Shadow-hand actuator group through a sinusoidal schedule and
prints joint tracking statistics (the reference renders a GIF; here the
model can be exported to MJCF for external viewing — see
scripts/export_task.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
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


if __name__ == '__main__':
  main()
