"""Batched fingertip IK demo (reference: examples/inverse_kinematics.py).

Samples feasible fingertip targets by FK on random joint configurations,
solves them (all attempts in parallel), and reports per-solve wall time and
success rate.

Run: python examples/inverse_kinematics.py [--solves N]
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
  parser.add_argument('--solves', type=int, default=10)
  parser.add_argument('--seed', type=int, default=0)
  args = parser.parse_args()

  from dexterity_tpu.inverse_kinematics.ik_solver import IKSolver
  from dexterity_tpu.models import hands

  solver = IKSolver(hands.AdroitHand())
  solve = jax.jit(lambda t, k: solver.solve(t, key=k))

  rng = np.random.RandomState(args.seed)
  successes = 0
  times = []
  for i in range(args.solves):
    qpos = rng.uniform(solver._lo * 0.8, solver._hi * 0.8)
    data = solver._fk(jnp.asarray(qpos))
    targets = jnp.asarray(data.site_xpos[solver._site_ids])
    t0 = time.time()
    qpos_sol, ok = solve(targets, jax.random.PRNGKey(i))
    jax.block_until_ready(qpos_sol)
    dt = time.time() - t0
    times.append(dt)
    successes += int(bool(ok))
    print(f'solve {i}: {"ok " if bool(ok) else "FAIL"} {dt * 1000:.1f} ms')
  print(f'success rate: {successes}/{args.solves}; '
        f'mean wall (post-compile): {np.mean(times[1:]) * 1000:.1f} ms')


if __name__ == '__main__':
  main()
