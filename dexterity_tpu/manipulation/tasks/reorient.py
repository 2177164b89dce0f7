"""In-hand cube re-orientation
(reference: dexterity/manipulation/tasks/reorient.py).

Shadow hand + OpenAI cube free prop; goal = uniform random quaternion;
shaped reward = orientation 1/(err+0.1) * 1.0 + success bonus * 800 +
||ctrl||^2 * (-0.1) per Chen et al.; translucent goal-hint cube is
rendering-only and carried as a mocap body for export parity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dexterity_tpu import task as task_lib
from dexterity_tpu.effectors import HandEffector
from dexterity_tpu.manipulation.goals import fingertip_position, prop_orientation
from dexterity_tpu.manipulation.shared import cameras, observations, rewards, tags, workspaces
from dexterity_tpu.models import arenas, hands, props
from dexterity_tpu.models.binding import HandBinding
from dexterity_tpu.models.observables import FreePropObservables, HandObservables
from dexterity_tpu.physics import step as physics_step
from dexterity_tpu.utils import collisions
from dexterity_tpu.utils.registry import TaggedTasks


@dataclasses.dataclass(frozen=True)
class Workspace:
  prop_bbox: workspaces.BoundingBox


_HINT_POS = (0.12, 0.0, 0.15)
_PROP_SIZE = 0.02
_ORIENTATION_EPS = 0.1
_ORIENTATION_THRESHOLD = 0.1
_ORIENTATION_WEIGHT = 1.0
_SUCCESS_BONUS_WEIGHT = 800.0
_ACTION_SMOOTHING_WEIGHT = -0.1
_PHYSICS_TIMESTEP = 0.005
_CONTROL_TIMESTEP = 0.025
_SUCCESSES_NEEDED = 1
_MAX_STEPS_SINGLE_SOLVE = 300
_MAX_TIME_SINGLE_SOLVE = _MAX_STEPS_SINGLE_SOLVE * _CONTROL_TIMESTEP
_STEPS_BEFORE_MOVING_TARGET = 5
_MAX_PLACE_SAMPLES = 20

_BBOX_SIZE = 0.05
_WORKSPACE = Workspace(
    prop_bbox=workspaces.BoundingBox(
        lower=(-_BBOX_SIZE / 2, -0.13 - _BBOX_SIZE / 2, 0.16),
        upper=(+_BBOX_SIZE / 2, -0.13 + _BBOX_SIZE / 2, 0.16)))

_FREEPROP_OBSERVABLES = observations.ObservableNames(
    prop_pose=('position', 'orientation', 'linear_velocity',
               'angular_velocity'))

SUITE = TaggedTasks()


class ReOrient(task_lib.GoalTask):
  """Manipulate an object to a goal orientation."""

  def __init__(self, arena, hand, hand_effector, goal_generator, prop,
               hand_prefix: str, prop_prefix: str,
               workspace: Workspace = _WORKSPACE,
               fall_termination: bool = True,
               observable_options=None,
               prop_observable_options=None,
               camera_observables=None,
               success_threshold: float = _ORIENTATION_THRESHOLD,
               successes_needed: int = _SUCCESSES_NEEDED,
               steps_before_changing_goal: int = _STEPS_BEFORE_MOVING_TARGET,
               max_time_per_goal: Optional[float] = _MAX_TIME_SINGLE_SOLVE,
               control_timestep: float = _CONTROL_TIMESTEP,
               physics_timestep: float = _PHYSICS_TIMESTEP) -> None:
    super().__init__(
        arena=arena, hands=[hand], hand_effectors=[hand_effector],
        goal_generator=goal_generator,
        success_threshold=success_threshold,
        successes_needed=successes_needed,
        steps_before_changing_goal=steps_before_changing_goal,
        max_time_per_goal=max_time_per_goal)
    self._fall_termination = fall_termination
    self._workspace = workspace
    self._prop = prop
    self._prop_prefix = prop_prefix
    self._binding = HandBinding(hand, hand_prefix)
    self._hand_obs = HandObservables(hand, hand_prefix,
                                     options=observable_options)
    self._prop_obs = FreePropObservables(prop, prop_prefix,
                                         options=prop_observable_options)
    self._hand_prefix = hand_prefix
    self._camera_obs = camera_observables
    self.set_timesteps(control_timestep, physics_timestep)

  @property
  def hand(self):
    return self.hands[0]

  def after_compile(self, model):
    self._binding.resolve(model)
    self._hand_obs.after_compile(model)
    self._prop_obs.after_compile(model)
    self._prop_body = self._prop_obs.body_id
    jid = model.body_jntadr[self._prop_body]
    self._prop_qadr = model.jnt_qposadr[jid]
    # Contact masks: prop-vs-ground (fall detection) and prop-vs-anything
    # (spawn rejection).
    self._fall_mask = collisions.group_mask(
        model, [self._prop_prefix], ['ground'])
    self._prop_mask = collisions.group_mask(
        model, [self._prop_prefix],
        [n for n in model.geom_names if not n.startswith(self._prop_prefix)])

  def initialize_episode(self, model, data, key):
    """Gravity compensation for the hand; prop placed uniformly in the
    spawn bbox with rejection on penetration (PropPlacer semantics,
    reference: reorient.py:143-151,182-188)."""
    data = fingertip_position.compensate_gravity(
        model, data, self._binding.body_ids)
    b_lo = jnp.asarray(self._workspace.prop_bbox.lower, data.qpos.dtype)
    b_hi = jnp.asarray(self._workspace.prop_bbox.upper, data.qpos.dtype)
    qadr = self._prop_qadr

    def attempt(carry):
      key, _, _, tries = carry
      key, k_pos, k_quat = jax.random.split(key, 3)
      pos = jax.random.uniform(k_pos, (3,), data.qpos.dtype, b_lo, b_hi)
      quat = prop_orientation.uniform_quaternion(k_quat, data.qpos.dtype)
      d = data.replace(
          qpos=data.qpos.at[qadr:qadr + 3].set(pos)
          .at[qadr + 3:qadr + 7].set(quat))
      d = physics_step.fwd_position(model, d)
      colliding = collisions.has_collision(d, self._prop_mask)
      return key, d, ~colliding, tries + 1

    def cond(carry):
      _, _, ok, tries = carry
      return (~ok) & (tries < _MAX_PLACE_SAMPLES)

    carry = (key, data, jnp.asarray(False), jnp.asarray(0))
    _, d, _, _ = jax.lax.while_loop(cond, attempt, carry)
    return d

  def on_goal_update(self, model, data, task_state):
    """Points the translucent hint body at the goal orientation
    (reference: reorient.py:187,198-199)."""
    if model.nmocap == 0:
      return data
    hint_id = model.body_mocapid[
        model.body_names.index('target_prop')]
    quat = task_state.goal[:4].astype(data.mocap_quat.dtype)
    return data.replace(
        mocap_quat=data.mocap_quat.at[hint_id].set(quat))

  def observables(self, model, data, task_state, eff_state):
    obs = self._hand_obs.as_dict(model, data)
    obs.update(self._prop_obs.as_dict(model, data))
    obs['goal_state'] = task_state.goal[:4]
    if self._camera_obs is not None and self._camera_obs.enabled:
      obs.update(self._camera_obs.as_dict(model, data))
    return obs

  def failure_termination(self, model, data):
    if not self._fall_termination:
      return jnp.asarray(False)
    return collisions.has_collision(data, self._fall_mask)

  # Planner rollouts need no kinematics refresh: the reward and failure
  # proxy below read the free prop's qpos directly (see plan_refresh in
  # task.py / predictive_sampling.py).
  plan_refresh = 'none'

  def rollout_failure(self, model, data):
    """Position-level fall proxy for planner rollouts: the prop's center
    below 2x its size means it left the hand and is about to hit the
    ground (the exact predicate needs contact data, which rollout steps
    don't refresh).  Reads the free joint's qpos (== xpos for a free
    body) so rollouts can skip the FK refresh entirely."""
    if not self._fall_termination:
      return jnp.asarray(False)
    return data.qpos[self._prop_qadr + 2] < 2.0 * _PROP_SIZE

  def get_reward(self, model, data, task_state):
    """Shaped reorientation reward (reference: reorient.py:238-284)."""
    distance = task_state.goal_distance[0]
    shaped = {
        'orientation': rewards.Reward(
            value=1.0 / (distance + _ORIENTATION_EPS),
            weight=_ORIENTATION_WEIGHT),
        'success_bonus': rewards.Reward(
            value=rewards.tolerance(distance, 0.0, _ORIENTATION_THRESHOLD),
            weight=_SUCCESS_BONUS_WEIGHT),
        'action_smoothing': rewards.Reward(
            value=jnp.sum(data.ctrl ** 2),
            weight=_ACTION_SMOOTHING_WEIGHT),
    }
    return rewards.weighted_average(shaped)


def reorient_task(observation_set: observations.ObservationSet) -> ReOrient:
  """Configure and instantiate a ReOrient task
  (reference: reorient.py:324-364)."""
  arena = arenas.Standard()
  hand = hands.ShadowHandSeriesE()
  hand_prefix = arena.attach(hand, pos=hand.palm_upright_pose.xpos,
                             quat=hand.palm_upright_pose.xquat)
  hand_effector = HandEffector(hand=hand, hand_name=hand.name,
                               attach_prefix=hand_prefix)
  prop = props.OpenAICube(size=_PROP_SIZE, name='prop')
  prop_prefix = arena.add_free_entity(prop)
  # Goal-hint cube: mocap body for viewers/export (contactless).
  hint = arena.spec.add_mocap('target_prop', pos=_HINT_POS)
  del hint
  goal_generator = prop_orientation.PropOrientation(prop=prop,
                                                    prefix=prop_prefix)
  # Closeup camera used for rendering / vision observables
  # (reference: reorient.py:153-156).
  camera_observables = cameras.add_camera_observables(
      arena, observation_set.value, cameras.FRONT_CLOSE)
  return ReOrient(
      arena=arena, hand=hand, hand_effector=hand_effector,
      goal_generator=goal_generator, prop=prop,
      hand_prefix=hand_prefix, prop_prefix=prop_prefix,
      observable_options=observations.make_options(
          observation_set.value, observations.HAND_OBSERVABLES),
      prop_observable_options=observations.make_options(
          observation_set.value, _FREEPROP_OBSERVABLES),
      camera_observables=camera_observables)


@SUITE.add(tags.STATE)
def state_dense() -> ReOrient:
  return reorient_task(observation_set=observations.ObservationSet.STATE_ONLY)
