"""Interactive exploration CLI (reference: dexterity/manipulation/explore.py).

Lists registered environments, loads one, optionally wraps actions with
Gaussian noise, and rolls a random policy printing observations and
rewards.  The reference launches the dm_control GUI viewer; headless TPU
hosts instead export the task to MJCF (`--export path.xml`) to open it in
any MuJoCo viewer.

Run: python -m dexterity_tpu.manipulation.explore \
        --environment_name=reach.state_dense --steps 20
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--environment_name', type=str, default=None)
  parser.add_argument('--seed', type=int, default=None)
  parser.add_argument('--steps', type=int, default=10)
  parser.add_argument('--action_noise', type=float, default=0.0)
  parser.add_argument('--export', type=str, default=None,
                      help='write the compiled task as MJCF XML and exit')
  args = parser.parse_args(argv)

  from dexterity_tpu import manipulation

  if args.environment_name is None:
    print('Available environments:')
    for i, name in enumerate(manipulation.ALL_NAMES):
      print(f'  [{i}] {name}')
    choice = input('Select environment (index or name): ').strip()
    name = (manipulation.ALL_NAMES[int(choice)] if choice.isdigit()
            else choice)
  else:
    name = args.environment_name
  domain, task_name = name.split('.')

  if args.export:
    from dexterity_tpu.mjcf import export
    task = manipulation.build_task(domain, task_name)
    xml = export.export_mjcf(task.arena.spec)
    with open(args.export, 'w') as f:
      f.write(xml)
    print(f'exported {name} to {args.export}')
    return

  env = manipulation.load_interactive(domain, task_name, seed=args.seed)
  from dexterity_tpu.manipulation.wrappers import ActionNoise
  if args.action_noise > 0:
    env = ActionNoise(env, scale=args.action_noise)

  ts = env.reset()
  print('observation shapes:')
  for k, v in ts.observation.items():
    print(f'  {k}: {np.asarray(v).shape}')
  spec = env.action_spec()
  rng = np.random.RandomState(args.seed or 0)
  for t in range(args.steps):
    lo = np.where(np.isfinite(spec.minimum), spec.minimum, -1)
    hi = np.where(np.isfinite(spec.maximum), spec.maximum, 1)
    action = rng.uniform(lo, hi)
    ts = env.step(action)
    print(f'step {t}: reward={float(ts.reward):+.4f} '
          f'discount={float(ts.discount):.1f} '
          f'type={int(ts.step_type)}')


if __name__ == '__main__':
  main()
