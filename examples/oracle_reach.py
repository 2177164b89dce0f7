"""Oracle reach rollout (reference: examples/oracle_reach.py).

The oracle reads the goal's auxiliary joint configuration and maps it
through joint_positions_to_control; prints per-episode wall time, steps,
return, and success rate.

Run: python examples/oracle_reach.py [--episodes N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--episodes', type=int, default=2)
  parser.add_argument('--max_steps', type=int, default=200)
  parser.add_argument('--seed', type=int, default=0)
  args = parser.parse_args()

  from dexterity_tpu import manipulation

  env = manipulation.load('reach', 'state_dense')
  hand = env.task.hand
  reset = jax.jit(env.reset)
  step = jax.jit(env.step)

  success_count = 0
  for ep in range(args.episodes):
    t0 = time.time()
    state, ts = reset(jax.random.PRNGKey(args.seed + ep))
    ep_return = 0.0
    steps = 0
    for _ in range(args.max_steps):
      goal_qpos = np.asarray(state.task.goal[15:])
      ctrl = hand.joint_positions_to_control(goal_qpos)
      state, ts = step(state, jnp.asarray(ctrl))
      ep_return += float(ts.reward)
      steps += 1
      if bool(ts.last()):
        break
    solved = int(state.task.successes) >= env.task.successes_needed
    success_count += int(solved)
    print(f'episode {ep}: {time.time() - t0:.2f}s, steps={steps}, '
          f'return={ep_return:.3f}, successes={int(state.task.successes)}, '
          f'solved={solved}')
  print(f'success rate: {success_count}/{args.episodes}')


if __name__ == '__main__':
  main()
