"""Fingertip-position goal generator
(reference: dexterity/manipulation/goals/fingertip_position.py).

Samples reachable fingertip positions: qpos ~ N(midrange, 0.1*range),
clipped, settled for 2 physics steps under position control, rejected when
self-colliding; up to `max_rejection_samples` attempts in a bounded
lax.while_loop.  The sampled post-settle joint configuration is appended to
the goal vector (slots [15:15+nj]) so oracle policies can read it — the
public goal (goal_spec / goal_state observable / distance) remains the 15-D
fingertip positions.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu import goal as goal_lib
from dexterity_tpu.models.binding import HandBinding
from dexterity_tpu.utils import collisions, specs


class FingertipCartesianPosition(goal_lib.GoalGenerator):

  def __init__(self, hand, prefix: str,
               max_rejection_samples: int = 100, scale: float = 0.1,
               settle_steps: int = 2,
               name: str = 'fingertip_position_goal_generator'):
    self._hand = hand
    self._binding = HandBinding(hand, prefix)
    self._prefix = prefix
    self._max_rejection_samples = max_rejection_samples
    self._scale = scale
    self._settle_steps = settle_steps
    self._name = name
    self._self_mask: Optional[np.ndarray] = None

  @property
  def public_dim(self) -> int:
    return 15

  @property
  def aux_dim(self) -> int:
    return self._hand.num_joints

  def goal_spec(self) -> specs.Array:
    return specs.Array(shape=(15,), dtype=np.float64, name=self._name)

  def full_goal_shape(self):
    return (self.public_dim + self.aux_dim,)

  def after_compile(self, model) -> None:
    self._binding.resolve(model)
    self._self_mask = collisions.self_mask(model, self._prefix)

  def initialize_episode(self, model, data, key):
    # Gravity compensation for the hand bodies
    # (reference: fingertip_position.py:49-55).
    from dexterity_tpu.physics import smooth
    del key
    self.after_compile(model)
    return compensate_gravity(model, data, self._binding.body_ids)

  def current_state(self, model, data):
    self.after_compile(model)
    return data.site_xpos[self._binding.site_ids].reshape(-1)

  def next_goal(self, model, data, key):
    from dexterity_tpu.physics import step as physics_step
    self.after_compile(model)
    b = self._binding
    dtype = data.qpos.dtype
    lo = jnp.asarray(b.jnt_range[:, 0], dtype)
    hi = jnp.asarray(b.jnt_range[:, 1], dtype)
    mid = (lo + hi) / 2.0
    rng = hi - lo
    p2c = jnp.asarray(self._hand.position_to_control, dtype)
    saved = (data.qpos, data.qvel, data.ctrl, data.time)

    def attempt(carry):
      key, _, _, _, tries = carry
      key, sub = jax.random.split(key)
      qpos_desired = mid + self._scale * rng * jax.random.normal(
          sub, mid.shape, dtype)
      qpos_desired = jnp.clip(qpos_desired, lo, hi)
      d = data.replace(
          qpos=data.qpos.at[b.qpos_adr].set(qpos_desired),
          qvel=jnp.zeros_like(data.qvel),
          ctrl=data.ctrl.at[b.act_ids].set(p2c @ qpos_desired))
      d = physics_step.step_n(model, d, self._settle_steps)
      colliding = collisions.has_collision(d, self._self_mask)
      return key, d, qpos_desired, ~colliding, tries + 1

    def cond(carry):
      _, _, _, ok, tries = carry
      return (~ok) & (tries < self._max_rejection_samples)

    d0 = data
    carry = (key, d0, jnp.zeros_like(mid), jnp.asarray(False),
             jnp.asarray(0))
    key, d_settled, _, ok, _ = jax.lax.while_loop(cond, attempt, carry)

    goal_pos = d_settled.site_xpos[b.site_ids].reshape(-1)
    goal_qpos = d_settled.qpos[b.qpos_adr]
    goal = jnp.concatenate([goal_pos, goal_qpos])

    # Restore physics state (reference restores qpos/ctrl/time).
    data = data.replace(qpos=saved[0], qvel=saved[1], ctrl=saved[2],
                        time=saved[3])
    return goal, data, ok

  def relative_goal(self, goal_state, current_state):
    return goal_state[..., :15] - current_state

  def goal_distance(self, goal_state, current_state):
    rel = self.relative_goal(goal_state, current_state).reshape(-1, 3)
    return jnp.linalg.norm(rel, axis=1)

  @property
  def name(self) -> str:
    return self._name


def compensate_gravity(model, data, body_ids: np.ndarray):
  """Sets xfrc_applied to cancel gravity on the given bodies
  (reference: dexterity/utils/mujoco_utils.py:91-99)."""
  g = model.opt.gravity
  masses = model.body_mass[body_ids]
  forces = -masses[:, None] * g[None, :]
  xfrc = data.xfrc_applied.at[body_ids, :3].set(
      forces.astype(data.xfrc_applied.dtype))
  return data.replace(xfrc_applied=xfrc)
