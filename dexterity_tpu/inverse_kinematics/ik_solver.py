"""Batched multi-fingertip inverse kinematics
(reference: dexterity/inverse_kinematics/ik_solver.py).

Same semantics as the reference's damped-least-squares IK — per-step
fingertip twist = gain * position error, DLS mapping to joint velocities,
position integration with limit clipping, progress-stall early stop — but
all `num_attempts` restarts run in parallel under vmap (the reference runs
up to 30 x 100 sequential Jacobian solves per call; here they are one
batched while_loop, SURVEY.md §3.4), and `solve_batch` vmaps over target
sets too.

Tunables match ik_solver.py:17-36: gain 0.95, dt 1.0, regularization 1e-5,
progress threshold 20.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu.core import types as T
from dexterity_tpu.core.types import ObjType
from dexterity_tpu.controllers import dls
from dexterity_tpu.physics import kinematics

_LINEAR_VELOCITY_GAIN = 0.95
_INTEGRATION_TIMESTEP_SEC = 1.0
_REGULARIZATION_WEIGHT = 1e-5
_PROGRESS_THRESHOLD = 20.0


class IKSolver:
  """Inverse kinematics solver for a dexterous hand."""

  def __init__(self, hand):
    self.hand = hand
    self.model = hand.spec.compile()
    self._site_ids = np.asarray(
        [self.model.site_names.index(n) for n in hand.fingertip_site_names],
        np.int32)
    jids = [self.model.jnt_names.index(n) for n in hand.joint_names]
    self._qpos_adr = np.asarray(
        [self.model.jnt_qposadr[j] for j in jids], np.int32)
    rng = np.asarray(self.model.jnt_range)[jids]
    self._lo, self._hi = rng[:, 0], rng[:, 1]
    self._nullspace_reference = rng.mean(axis=1)
    self._mapper = dls.DampedLeastSquaresMapper(
        dls.DampedLeastSquaresParameters(
            model=self.model,
            object_types=[ObjType.SITE] * len(self._site_ids),
            object_names=[self.model.site_names[s] for s in self._site_ids],
            regularization_weight=_REGULARIZATION_WEIGHT))

  # -- single attempt (pure) ----------------------------------------------

  def _fk(self, qpos):
    data = T.make_data(self.model, dtype=qpos.dtype)
    data = data.replace(qpos=data.qpos.at[self._qpos_adr].set(qpos))
    return kinematics.fwd_position(self.model, data)

  def _attempt(self, qpos0, targets, linear_tol, max_steps):
    """Runs one IK descent. Returns (qpos, linear_err(k,))."""
    lo = jnp.asarray(self._lo, qpos0.dtype)
    hi = jnp.asarray(self._hi, qpos0.dtype)
    targets = targets.reshape(-1, 3)

    def tip_positions(qpos):
      data = self._fk(qpos)
      return data, data.site_xpos[self._site_ids]

    data0, tips0 = tip_positions(qpos0)

    def body(carry):
      qpos, prev_tips, _, _, step = carry
      data, tips = tip_positions(qpos)
      twists = _LINEAR_VELOCITY_GAIN * (
          targets - tips) / _INTEGRATION_TIMESTEP_SEC
      qdot = self._mapper.compute_joint_velocities(data, twists)
      qpos_new = jnp.clip(
          qpos + qdot[self._qpos_adr] * _INTEGRATION_TIMESTEP_SEC, lo, hi)
      _, tips_new = tip_positions(qpos_new)
      err = jnp.linalg.norm(targets - tips_new, axis=1)
      change = jnp.linalg.norm(tips_new - tips, axis=1)
      stalled = jnp.any(err / (change + 1e-10) > _PROGRESS_THRESHOLD)
      return qpos_new, tips_new, err, stalled, step + 1

    def cond(carry):
      _, _, err, stalled, step = carry
      return (~stalled) & (step < max_steps) & jnp.any(err > linear_tol)

    err0 = jnp.linalg.norm(targets - tips0, axis=1)
    carry = (qpos0, tips0, err0, jnp.asarray(False), jnp.asarray(0))
    qpos, _, err, _, _ = jax.lax.while_loop(cond, body, carry)
    return qpos, err

  # -- public API -----------------------------------------------------------

  def solve(self, target_positions, linear_tol: float = 1e-3,
            max_steps: int = 100, early_stop: bool = False,
            num_attempts: int = 30,
            stop_on_first_successful_attempt: bool = False,
            key: Optional[jax.Array] = None):
    """Solves IK for 5 fingertip targets.

    Returns (qpos, success): the solution minimizing distance to the
    nullspace reference among successful attempts (ik_solver.py:143-153),
    or the best-error attempt with success=False.
    """
    del early_stop, stop_on_first_successful_attempt  # all-parallel
    key = key if key is not None else jax.random.PRNGKey(0)
    targets = jnp.asarray(target_positions).reshape(-1)
    dtype = targets.dtype
    nullref = jnp.asarray(self._nullspace_reference, dtype)
    lo = jnp.asarray(self._lo, dtype)
    hi = jnp.asarray(self._hi, dtype)

    inits = jax.random.uniform(
        key, (num_attempts, len(self._lo)), dtype, lo, hi)
    inits = inits.at[0].set(nullref)  # first attempt: nullspace midrange

    qpos_all, err_all = jax.vmap(
        lambda q0: self._attempt(q0, targets, linear_tol, max_steps))(inits)

    ok = jnp.all(err_all <= linear_tol, axis=1)
    null_dist = jnp.linalg.norm(qpos_all - nullref, axis=1)
    score = jnp.where(ok, null_dist, jnp.inf)
    any_ok = jnp.any(ok)
    best_ok = jnp.argmin(score)
    best_err = jnp.argmin(err_all.max(axis=1))
    best = jnp.where(any_ok, best_ok, best_err)
    return qpos_all[best], any_ok

  def solve_batch(self, target_batch, key=None, **kw):
    """vmapped solve over a batch of target sets."""
    n = target_batch.shape[0]
    key = key if key is not None else jax.random.PRNGKey(0)
    keys = jax.random.split(key, n)
    return jax.vmap(lambda t, k: self.solve(t, key=k, **kw))(
        target_batch, keys)
