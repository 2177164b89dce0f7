"""Dexterous hand entities: Shadow Hand E, Adroit, MPL.

TPU-native counterpart of the reference's hand classes
(dexterity/models/hands/{shadow_hand_e,adroit_hand,mpl_hand}.py): each hand
wraps a JSON model asset as a ModelSpec, adds fingertip sites where the
source XML lacks them, and exposes

  * joint groups / name tables,
  * control <-> joint-position projections derived from the actuator and
    tendon coupling structure (the reference's hand-written
    POSITION_TO_CONTROL / CONTROL_TO_POSITION matrices fall out as the
    coupling matrix and its pseudo-inverse),
  * palm-upright attachment poses,
  * vmappable joint-angle samplers (reference:
    models/hands/dexterous_hand.py:120-168).

Hands are specs, not live objects: tasks attach them into an arena spec and
compile once; all runtime state lives in the physics Data pytree.
"""

from __future__ import annotations

import copy
import enum
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from dexterity_tpu.core import serialization
from dexterity_tpu.core import spec as S
from dexterity_tpu.core.types import ActuatorTrn, JointType

_ASSETS = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'assets')

# Palm-upright pose shared by the Shadow-derived hands (reference:
# shadow_hand_e.py:13-14, adroit_hand.py:13-14).
_PALM_UPRIGHT_POS = (0.0, 0.2, 0.1)
_PALM_UPRIGHT_QUAT = (0.0, 0.0, 0.707106781186, -0.707106781186)


class HandSide(enum.Enum):
  LEFT = enum.auto()
  RIGHT = enum.auto()


class HandPose:
  def __init__(self, xpos, xquat):
    self.xpos = np.asarray(xpos, np.float64)
    self.xquat = np.asarray(xquat, np.float64) / np.linalg.norm(xquat)


class JointGrouping:
  """A collection of joints belonging to a hand part (reference:
  dexterous_hand.py:29-44)."""

  def __init__(self, name: str, joint_names: Sequence[str]):
    self.name = name
    self.joint_names = tuple(joint_names)


class DexterousHand:
  """Base hand entity wrapping a ModelSpec."""

  asset: str = ''
  palm_upright_pose = HandPose(_PALM_UPRIGHT_POS, _PALM_UPRIGHT_QUAT)

  def __init__(self, name: Optional[str] = None):
    self.spec = serialization.load_spec(os.path.join(_ASSETS, self.asset))
    # Join geom mesh provenance with the packaged render meshes so camera
    # observables show the vendor geometry, not the fitted primitives.
    from dexterity_tpu.models import meshes as mesh_assets
    mesh_assets.attach_mesh_assets(self.spec,
                                   os.path.splitext(self.asset)[0])
    self.name = name or self.spec.name
    self.spec.name = self.name
    self._setup()
    # Name tables (pre-prefix, hand-local).
    self.joint_names = tuple(self.spec.joint_names())
    self.actuator_names = tuple(a.name for a in self.spec.actuators)
    self._build_projections()
    self._build_joint_groups()

  # -- subclass hooks ----------------------------------------------------

  def _setup(self):
    """Adds fingertip sites / model edits before compilation."""

  @property
  def fingertip_site_names(self) -> Tuple[str, ...]:
    raise NotImplementedError

  def _build_joint_groups(self):
    groups = {}
    for jname in self.joint_names:
      key = _group_key(jname)
      groups.setdefault(key, []).append(jname)
    self.joint_groups = tuple(
        JointGrouping(k, v) for k, v in groups.items())

  # -- projections -------------------------------------------------------

  def _build_projections(self):
    """Derives position<->control projections from actuator structure.

    position_to_control @ qpos = ctrl that holds that pose;
    control_to_position = pinv (splits coupled-joint commands evenly) —
    semantics of the reference constants
    (shadow_hand_e_constants.py:162-187)."""
    jnames = list(self.joint_names)
    nj = len(jnames)
    tendons = {t.name: t for t in self.spec.tendons}
    rows = []
    for a in self.spec.actuators:
      row = np.zeros(nj)
      if a.trntype == ActuatorTrn.JOINT:
        row[jnames.index(a.target)] = 1.0
      else:
        for jn, coef in tendons[a.target].joints:
          row[jnames.index(jn)] = coef
      rows.append(row)
    self.position_to_control = np.stack(rows) if rows else np.zeros((0, nj))
    self.control_to_position = np.linalg.pinv(self.position_to_control)

  def joint_positions_to_control(self, qpos):
    return self.position_to_control @ qpos

  def control_to_joint_positions(self, control):
    return self.control_to_position @ control

  # -- joint-angle sampling (reference: dexterous_hand.py:120-168) --------

  @property
  def joint_ranges(self) -> np.ndarray:
    """(num_joints, 2) joint limits from the model spec."""
    by_name = {j.name: j for b in self.spec.worldbody.walk()
               for j in b.joints}
    return np.asarray([by_name[n].range for n in self.joint_names])

  @property
  def coupled_joint_ids(self) -> Tuple[Tuple[int, ...], ...]:
    """Joint-index groups driven by a single actuator (reference:
    shadow_hand_e_constants.py COUPLED_JOINT_IDS derivation)."""
    out = []
    for row in self.position_to_control:
      nz = np.nonzero(row)[0]
      if len(nz) > 1:
        out.append(tuple(int(i) for i in nz))
    return tuple(out)

  def postprocess_sampled_joint_angles(self, qpos):
    """Forces coupled joints to share a value (reference:
    shadow_hand_e.py:124-129, mpl_hand.py:115-120). jnp/np compatible."""
    for ids in self.coupled_joint_ids:
      idx = np.asarray(ids)
      if hasattr(qpos, 'at'):
        qpos = qpos.at[idx].set(qpos[ids[-1]])
      else:
        qpos[idx] = qpos[ids[-1]]
    return qpos

  def sample_joint_angles(self, key, range_fraction: float = 1.0):
    """Uniform random joint configuration within range_fraction * limits.

    Pure-JAX counterpart of the reference's sample_joint_angles
    (dexterous_hand.py:120-142); not guaranteed collision-free.
    """
    import jax
    import jax.numpy as jnp
    if not 0 <= range_fraction <= 1:
      raise ValueError('range_fraction must be between 0 and 1.')
    rng = self.joint_ranges * range_fraction
    lo = jnp.asarray(rng[:, 0])
    hi = jnp.asarray(rng[:, 1])
    qpos = jax.random.uniform(key, lo.shape, lo.dtype, lo, hi)
    return self.postprocess_sampled_joint_angles(qpos)

  def sample_collision_free_joint_angles(self, model, data, binding, key,
                                         range_fraction: float = 1.0,
                                         max_tries: int = 100):
    """Rejection-samples a self-collision-free configuration in-graph.

    TPU-native counterpart of the reference's
    sample_collision_free_joint_angles (dexterous_hand.py:144-168): the
    unbounded host loop on a copied physics becomes a bounded
    lax.while_loop over (set qpos -> FK -> collision check).

    Args:
      model: compiled task Model.
      data: current Data (restored state is not modified).
      binding: resolved HandBinding of this hand in `model`.
      key: PRNG key.
      range_fraction: fraction of each joint's range to sample from.
      max_tries: rejection budget (static).

    Returns:
      (qpos (num_joints,), ok bool) — ok is False if the budget ran out;
      the last sample is returned either way (GoalInitializationError
      semantics are the caller's responsibility).
    """
    import jax
    import jax.numpy as jnp

    from dexterity_tpu.physics import step as physics_step
    from dexterity_tpu.utils import collisions
    if not 0 <= range_fraction <= 1:
      raise ValueError('range_fraction must be between 0 and 1.')
    self_mask = collisions.self_mask(model, binding.prefix)
    dtype = data.qpos.dtype
    rng = self.joint_ranges * range_fraction
    lo = jnp.asarray(rng[:, 0], dtype)
    hi = jnp.asarray(rng[:, 1], dtype)
    qpos_adr = np.asarray(binding.qpos_adr)

    def attempt(carry):
      key, _, _, tries = carry
      key, sub = jax.random.split(key)
      qpos = jax.random.uniform(sub, lo.shape, dtype, lo, hi)
      qpos = self.postprocess_sampled_joint_angles(qpos)
      d = data.replace(qpos=data.qpos.at[qpos_adr].set(qpos))
      d = physics_step.fwd_position(model, d)
      colliding = collisions.has_collision(d, self_mask)
      return key, qpos, ~colliding, tries + 1

    def cond(carry):
      _, _, ok, tries = carry
      return (~ok) & (tries < max_tries)

    carry = (key, jnp.zeros(self.num_joints, dtype), jnp.asarray(False),
             jnp.asarray(0))
    _, qpos, ok, _ = jax.lax.while_loop(cond, attempt, carry)
    return qpos, ok

  @property
  def num_joints(self) -> int:
    return len(self.joint_names)

  @property
  def num_actuators(self) -> int:
    return len(self.actuator_names)

  @property
  def underactuated(self) -> bool:
    return self.num_actuators < self.num_joints


def _group_key(joint_name: str) -> str:
  """Maps joint names to part groups (WR/FF/MF/RF/LF/TH or mpl parts)."""
  for prefix in ('WR', 'FF', 'MF', 'RF', 'LF', 'TH'):
    if joint_name.startswith(prefix):
      return prefix
  return joint_name.split('_')[0]


class AdroitHand(DexterousHand):
  """Adroit manipulation platform: fully-actuated 24-DoF Shadow variant
  (reference: models/hands/adroit_hand.py)."""

  asset = 'adroit_hand.json'

  @property
  def fingertip_site_names(self) -> Tuple[str, ...]:
    # Existing sites in the source XML (adroit_hand.xml S_*tip).
    return ('S_fftip', 'S_mftip', 'S_rftip', 'S_lftip', 'S_thtip')


class ShadowHandSeriesE(DexterousHand):
  """Shadow Dexterous Hand E: 24 joints / 20 actuators, tendon-coupled
  distal pairs (reference: models/hands/shadow_hand_e.py)."""

  asset = 'shadow_hand_e.json'

  def _setup(self):
    # Add fingertip sites at the tip body origins
    # (reference: shadow_hand_e.py:151-169).
    for tip in ('fftip', 'mftip', 'rftip', 'lftip', 'thtip'):
      body = self.spec.find_body(tip)
      body.add_site(f'{tip}_site', pos=np.zeros(3),
                    size=np.full(3, 0.001), rgba=(1.0, 0.0, 0.0, 1.0),
                    group=4)

  @property
  def fingertip_site_names(self) -> Tuple[str, ...]:
    return ('fftip_site', 'mftip_site', 'rftip_site', 'lftip_site',
            'thtip_site')

  @property
  def coupled_joint_names(self):
    """Tendon-coupled (J0, J1) pairs driven by a single actuator."""
    return tuple(
        tuple(jn for jn, _ in t.joints)
        for t in self.spec.tendons
        if any(a.target == t.name and a.trntype == ActuatorTrn.TENDON
               for a in self.spec.actuators))


class MPLHand(DexterousHand):
  """Modular Prosthetic Limb: 22 joints / 13 actuators, polynomial
  equality couplings (reference: models/hands/mpl_hand.py)."""

  def __init__(self, side: HandSide = HandSide.RIGHT,
               name: Optional[str] = None):
    self.asset = ('mpl_left.json' if side == HandSide.LEFT
                  else 'mpl_right.json')
    self.side = side
    super().__init__(name=name)

  @property
  def fingertip_site_names(self) -> Tuple[str, ...]:
    # Existing distal touch sites in the MPL XML (reference:
    # mpl_hand_constants.py:149-155).
    return ('index_distal', 'middle_distal', 'ring_distal', 'pinky_distal',
            'thumb_distal')
