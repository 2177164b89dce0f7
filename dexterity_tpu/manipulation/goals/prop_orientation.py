"""Prop-orientation goal generator
(reference: dexterity/manipulation/goals/prop_orientation.py).

Goal = uniformly random unit quaternion; distance = norm of the axis-angle
of the quaternion difference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu import goal as goal_lib
from dexterity_tpu.physics import math as tmath
from dexterity_tpu.utils import specs


def uniform_quaternion(key, dtype=jnp.float32):
  """Marsaglia-style uniform rotation sample."""
  q = jax.random.normal(key, (4,), dtype)
  return q / jnp.maximum(jnp.linalg.norm(q), 1e-12)


class PropOrientation(goal_lib.GoalGenerator):

  def __init__(self, prop, prefix: str,
               name: str = 'prop_orientation_goal_generator'):
    self._prop = prop
    self._prefix = prefix
    self._name = name
    self._body_id = None

  @property
  def public_dim(self) -> int:
    return 4

  @property
  def aux_dim(self) -> int:
    return 0

  def goal_spec(self) -> specs.Array:
    return specs.Array(shape=(4,), dtype=np.float64, name=self._name)

  def full_goal_shape(self):
    return (4,)

  def after_compile(self, model) -> None:
    if self._body_id is None:
      root = self._prefix + self._prop.spec.worldbody.children[0].name
      self._body_id = model.body_names.index(root)
      jid = model.body_jntadr[self._body_id]
      self._qadr = model.jnt_qposadr[jid]

  def current_state(self, model, data):
    """The prop's world orientation, read from its free-joint qpos (always
    valid — identical to data.xquat[body] after FK normalization, but
    needs no kinematics refresh, so planner rollouts can skip FK
    entirely; see GoalTask.plan_refresh)."""
    self.after_compile(model)
    q = data.qpos[self._qadr + 3:self._qadr + 7]
    return q / jnp.maximum(jnp.linalg.norm(q), 1e-12)

  def next_goal(self, model, data, key):
    del model
    return (uniform_quaternion(key, data.qpos.dtype), data,
            jnp.asarray(True))

  def relative_goal(self, goal_state, current_state):
    """Quaternion taking current to goal (tr.quat_diff_active)."""
    return tmath.quat_mul(tmath.quat_inv(current_state), goal_state)

  def goal_distance(self, goal_state, current_state):
    err = self.relative_goal(goal_state, current_state)
    aa = tmath.quat_to_axis_angle(err)
    return jnp.linalg.norm(aa, keepdims=True)

  @property
  def name(self) -> str:
    return self._name
