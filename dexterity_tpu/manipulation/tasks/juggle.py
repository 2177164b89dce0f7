"""Two-hand juggling (reference: dexterity/manipulation/tasks/juggle.py).

Two MPL hands welded to mocap bodies, juggling ball free prop placed on the
left palm after settle steps; reward is 0.0 (the reference domain is WIP,
juggle.py:143-144).  Variant: state_sparse.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu import task as task_lib
from dexterity_tpu.effectors import HandEffector
from dexterity_tpu.manipulation.goals import fingertip_position
from dexterity_tpu.manipulation.shared import observations, tags
from dexterity_tpu.models import arenas, hands, props
from dexterity_tpu.models.binding import HandBinding
from dexterity_tpu.models.observables import FreePropObservables, HandObservables
from dexterity_tpu.physics import step as physics_step
from dexterity_tpu.utils.registry import TaggedTasks

_HAND_QUAT = (0.0, 0.0, 0.7, 0.0)
_RIGHT_HAND_POS = (-0.1, 0.0, 0.1)
_LEFT_HAND_POS = (0.1, 0.0, 0.1)
_BALL_RADIUS = 0.025
_PHYSICS_TIMESTEP = 0.02
_CONTROL_TIMESTEP = 0.02
_SETTLE_STEPS = 2

SUITE = TaggedTasks()


class Juggle(task_lib.Task):
  """Juggle a ball with two hands."""

  def __init__(self, arena, hands_, hand_effectors, use_dense_reward: bool,
               prefixes, ball, ball_prefix,
               observable_options=None,
               control_timestep: float = _CONTROL_TIMESTEP,
               physics_timestep: float = _PHYSICS_TIMESTEP) -> None:
    super().__init__(arena=arena, hands=hands_,
                     hand_effectors=hand_effectors)
    self._use_dense_reward = use_dense_reward
    self._bindings = [HandBinding(h, p) for h, p in zip(hands_, prefixes)]
    self._hand_obs = [HandObservables(h, p, options=observable_options)
                      for h, p in zip(hands_, prefixes)]
    self._ball = ball
    self._ball_obs = FreePropObservables(
        ball, ball_prefix,
        options={'position': {'enabled': True},
                 'orientation': {'enabled': True},
                 'linear_velocity': {'enabled': True},
                 'angular_velocity': {'enabled': True}})
    self.set_timesteps(control_timestep, physics_timestep)

  @property
  def left_hand(self):
    return self.hands[0]

  @property
  def right_hand(self):
    return self.hands[1]

  def after_compile(self, model):
    for b in self._bindings:
      b.resolve(model)
    for o in self._hand_obs:
      o.after_compile(model)
    self._ball_obs.after_compile(model)
    # Left palm body for ball placement.
    self._left_palm = model.body_names.index(
        self._bindings[0].prefix + 'palm')
    jid = model.body_jntadr[self._ball_obs.body_id]
    self._ball_qadr = model.jnt_qposadr[jid]

  def initialize_episode(self, model, data, key):
    """Midrange joint init, settle, ball on left palm
    (reference: juggle.py:105-128)."""
    del key
    for b in self._bindings:
      mid = jnp.asarray(b.jnt_range.mean(axis=1), data.qpos.dtype)
      data = data.replace(qpos=data.qpos.at[b.qpos_adr].set(mid))
    data = physics_step.step_n(model, data, _SETTLE_STEPS)
    palm_pos = data.xpos[self._left_palm]
    ball_pos = palm_pos + jnp.asarray([0.0, -0.05, 0.05], data.qpos.dtype)
    qadr = self._ball_qadr
    data = data.replace(
        qpos=data.qpos.at[qadr:qadr + 3].set(ball_pos),
        qvel=data.qvel)
    return physics_step.fwd_position(model, data)

  def observables(self, model, data, task_state, eff_state):
    obs = {}
    for o in self._hand_obs:
      obs.update(o.as_dict(model, data))
    obs.update(self._ball_obs.as_dict(model, data))
    return obs

  def get_reward(self, model, data, task_state):
    return jnp.asarray(0.0, data.qpos.dtype)


def juggle_task(observation_set: observations.ObservationSet,
                use_dense_reward: bool) -> Juggle:
  """Configure and instantiate a Juggle task (reference: juggle.py:147-181)."""
  arena = arenas.Standard()
  left = hands.MPLHand(side=hands.HandSide.LEFT, name='mpl_left')
  right = hands.MPLHand(side=hands.HandSide.RIGHT, name='mpl_right')
  arena.add_mocap(left, position=_LEFT_HAND_POS, quaternion=_HAND_QUAT,
                  name='left_mocap')
  arena.add_mocap(right, position=_RIGHT_HAND_POS, quaternion=_HAND_QUAT,
                  name='right_mocap')
  prefixes = (f'{left.name}/', f'{right.name}/')
  left_eff = HandEffector(hand=left, hand_name=left.name,
                          attach_prefix=prefixes[0])
  right_eff = HandEffector(hand=right, hand_name=right.name,
                           attach_prefix=prefixes[1])
  ball = props.JugglingBall(radius=_BALL_RADIUS)
  ball_prefix = arena.add_free_entity(ball)
  return Juggle(
      arena=arena, hands_=[left, right],
      hand_effectors=[left_eff, right_eff],
      use_dense_reward=use_dense_reward,
      prefixes=prefixes, ball=ball, ball_prefix=ball_prefix,
      observable_options=observations.make_options(
          observation_set.value, observations.HAND_OBSERVABLES))


@SUITE.add(tags.STATE, tags.SPARSE)
def state_sparse() -> Juggle:
  """Juggle task with full state observations and sparse reward."""
  return juggle_task(observation_set=observations.ObservationSet.STATE_ONLY,
                     use_dense_reward=False)
