"""Compiled model and simulation state pytrees.

The TPU-native inversion of the reference's PyMJCF object graph (see
SURVEY.md §7): compile-time Python builds an immutable `Model` — a pytree of
device arrays describing the kinematic tree, joints, geoms, sites, actuators,
tendons, equality constraints and candidate contact pairs — and runtime is
pure jitted functions `(Model, Data) -> Data` that batch with vmap and shard
with pjit/shard_map.

Conventions follow MuJoCo where a convention is needed (quaternions (w,x,y,z),
qpos/qvel layouts, solref/solimp constraint parametrization) so that reference
rollouts can be compared within tolerance, but the implementation is
independent, JAX-first code.

Structural fields (counts, index tables, names) are static aux-data stored as
nested tuples: they determine trace-time control flow and jit cache keys.
Numeric parameters are array leaves so models remain differentiable and
donate/shard cleanly.
"""

from __future__ import annotations

import enum
from typing import Optional, Tuple

import jax
import numpy as np

from dexterity_tpu.utils.structs import pytree_dataclass, static_field


class JointType(enum.IntEnum):
  FREE = 0
  BALL = 1
  SLIDE = 2
  HINGE = 3


class GeomType(enum.IntEnum):
  PLANE = 0
  SPHERE = 1
  CAPSULE = 2
  ELLIPSOID = 3
  CYLINDER = 4
  BOX = 5
  MESH = 6  # carried for export/viz; collisions use fitted primitives


class ActuatorTrn(enum.IntEnum):
  JOINT = 0
  TENDON = 1


class BiasType(enum.IntEnum):
  NONE = 0
  AFFINE = 1


class EqType(enum.IntEnum):
  CONNECT = 0
  WELD = 1
  JOINT = 2   # polynomial joint coupling (MPL hands)
  TENDON = 3  # polynomial tendon coupling (MPL distal joints)


class ObjType(enum.IntEnum):
  """Object types addressable by jacobians/velocity queries.

  Mirrors the subset validated by the reference mapper
  (dexterity/controllers/mapper.py:52-90): body, geom, site.
  """
  BODY = 0
  GEOM = 1
  SITE = 2


# Number of qpos / qvel entries per joint type.
QPOS_WIDTH = {JointType.FREE: 7, JointType.BALL: 4,
              JointType.SLIDE: 1, JointType.HINGE: 1}
DOF_WIDTH = {JointType.FREE: 6, JointType.BALL: 3,
             JointType.SLIDE: 1, JointType.HINGE: 1}


@pytree_dataclass
class Option:
  """Physics options (subset of MuJoCo <option>)."""
  timestep: jax.Array        # ()
  gravity: jax.Array         # (3,)
  # Constraint solver settings (static: control trace-time loop counts).
  solver_iterations: int = static_field(default=8)
  ls_iterations: int = static_field(default=8)
  # Max contact points kept per step (top-K deepest candidates).
  contact_top_k: int = static_field(default=64)
  # Midphase: per type-group, only the `midphase_cap` nearest candidate
  # pairs (by bounding-sphere distance) run the expensive narrow-phase
  # kernel each step. 0 = exhaustive (used by import-time pruning).
  midphase_cap: int = static_field(default=64)
  # Tighter cap for groups whose first geom is a PLANE: in articulated
  # scenes almost every body stays far above the ground, so very few
  # plane pairs can be near simultaneously — and plane-box contributes 8
  # slots per pair, so its cap dominates the contact slot count.
  # 0 = use midphase_cap.
  midphase_cap_plane: int = static_field(default=16)
  # Disables the constraint solver entirely (mjDSBL_CONSTRAINT analogue;
  # used by smooth-dynamics conformance tests).
  disable_constraint: bool = static_field(default=False)
  # Newton refactorization period: 1 = exact Newton (factor the Hessian
  # every iteration, MuJoCo semantics); k > 1 = modified Newton that
  # refactorizes every k-th iteration and re-solves intermediate
  # iterations against the stale factor (substitution only — ~10x cheaper
  # than a factorization; the backtracking line search keeps descent
  # monotone).  Planning-model option; k > 1 unrolls the Newton loop and
  # is not differentiable (iLQR keeps the default).
  solver_refactor_every: int = static_field(default=1)
  # Folds implicit joint damping into the constraint solve: the Newton
  # objective uses M' = M + h*diag(dof_damping), so the resulting qacc is
  # already the implicitly-damped constrained acceleration and the Euler
  # integrator needs no second linear solve (MuJoCo 'implicit'-integrator
  # family).  Planning-model option; the env contract keeps MuJoCo's
  # Euler semantics (constraints against M, damping solve in mj_Euler).
  implicit_damping: bool = static_field(default=False)


@pytree_dataclass
class Model:
  """Immutable compiled model; a pytree of arrays + static structure."""

  # ---- static structure -------------------------------------------------
  nq: int = static_field()
  nv: int = static_field()
  nu: int = static_field()
  nbody: int = static_field()
  njnt: int = static_field()
  ngeom: int = static_field()
  nsite: int = static_field()
  ntendon: int = static_field()
  neq: int = static_field()
  nmocap: int = static_field()
  npair: int = static_field()

  body_parentid: Tuple[int, ...] = static_field()
  body_jntadr: Tuple[int, ...] = static_field()   # first joint of body or -1
  body_jntnum: Tuple[int, ...] = static_field()
  body_dofadr: Tuple[int, ...] = static_field()   # first dof of body or -1
  body_dofnum: Tuple[int, ...] = static_field()
  body_mocapid: Tuple[int, ...] = static_field()  # -1 if not mocap

  jnt_type: Tuple[int, ...] = static_field()
  jnt_bodyid: Tuple[int, ...] = static_field()
  jnt_qposadr: Tuple[int, ...] = static_field()
  jnt_dofadr: Tuple[int, ...] = static_field()
  jnt_limited: Tuple[bool, ...] = static_field()

  dof_bodyid: Tuple[int, ...] = static_field()
  dof_jntid: Tuple[int, ...] = static_field()

  geom_type: Tuple[int, ...] = static_field()
  geom_bodyid: Tuple[int, ...] = static_field()
  geom_condim: Tuple[int, ...] = static_field()

  site_bodyid: Tuple[int, ...] = static_field()

  actuator_trntype: Tuple[int, ...] = static_field()
  actuator_trnid: Tuple[int, ...] = static_field()
  actuator_biastype: Tuple[int, ...] = static_field()

  tendon_limited: Tuple[bool, ...] = static_field()

  eq_type: Tuple[int, ...] = static_field()
  eq_obj1: Tuple[int, ...] = static_field()
  eq_obj2: Tuple[int, ...] = static_field()

  # Candidate contact pairs, fixed at compile time (geoms are few; broad
  # phase is compile-time pruning, narrow phase is masked, static-shape).
  pair_geom1: Tuple[int, ...] = static_field()
  pair_geom2: Tuple[int, ...] = static_field()
  pair_condim: Tuple[int, ...] = static_field()

  # Names for debugging / lookup (not used in compute).
  body_names: Tuple[str, ...] = static_field()
  jnt_names: Tuple[str, ...] = static_field()
  geom_names: Tuple[str, ...] = static_field()
  site_names: Tuple[str, ...] = static_field()
  actuator_names: Tuple[str, ...] = static_field()
  tendon_names: Tuple[str, ...] = static_field()

  # ---- options ----------------------------------------------------------
  opt: Option

  # ---- array parameters ---------------------------------------------------
  qpos0: jax.Array           # (nq,) reference configuration
  body_pos: jax.Array        # (nbody, 3)
  body_quat: jax.Array       # (nbody, 4)
  body_ipos: jax.Array       # (nbody, 3)
  body_iquat: jax.Array      # (nbody, 4)
  body_mass: jax.Array       # (nbody,)
  body_inertia: jax.Array    # (nbody, 3) principal moments

  jnt_pos: jax.Array         # (njnt, 3)
  jnt_axis: jax.Array        # (njnt, 3)
  jnt_range: jax.Array       # (njnt, 2)
  jnt_solref: jax.Array      # (njnt, 2)
  jnt_solimp: jax.Array      # (njnt, 5)
  jnt_margin: jax.Array      # (njnt,)

  dof_damping: jax.Array     # (nv,)
  dof_armature: jax.Array    # (nv,)
  dof_frictionloss: jax.Array  # (nv,)

  geom_pos: jax.Array        # (ngeom, 3)
  geom_quat: jax.Array       # (ngeom, 4)
  geom_size: jax.Array       # (ngeom, 3)
  geom_friction: jax.Array   # (ngeom, 3) slide, torsion, roll
  geom_solref: jax.Array     # (ngeom, 2)
  geom_solimp: jax.Array     # (ngeom, 5)
  geom_margin: jax.Array     # (ngeom,)

  site_pos: jax.Array        # (nsite, 3)
  site_quat: jax.Array       # (nsite, 4)

  actuator_gainprm: jax.Array    # (nu, 3)
  actuator_biasprm: jax.Array    # (nu, 3)
  actuator_ctrlrange: jax.Array  # (nu, 2)
  actuator_forcerange: jax.Array  # (nu, 2)  (+/-inf when unlimited)
  actuator_gear: jax.Array       # (nu,)

  tendon_moment: jax.Array   # (ntendon, nv) fixed-tendon coefficient matrix
  tendon_range: jax.Array    # (ntendon, 2)
  tendon_solref: jax.Array   # (ntendon, 2)
  tendon_solimp: jax.Array   # (ntendon, 5)
  tendon_margin: jax.Array   # (ntendon,)

  eq_data: jax.Array         # (neq, 11)
  eq_solref: jax.Array       # (neq, 2)
  eq_solimp: jax.Array       # (neq, 5)

  pair_friction: jax.Array   # (npair, 3)
  pair_solref: jax.Array     # (npair, 2)
  pair_solimp: jax.Array     # (npair, 5)
  pair_margin: jax.Array     # (npair,)

  # Inverse-weight tables at qpos0 (MuJoCo *_invweight0 semantics), used by
  # the constraint regularizer.  Filled by spec.compile().
  dof_invweight0: jax.Array   # (nv,)
  body_invweight0: jax.Array  # (nbody, 2) [translation, rotation]
  tendon_invweight0: jax.Array  # (ntendon,)

  def id_by_name(self, kind: str, name: str) -> int:
    names = getattr(self, f'{kind}_names')
    return names.index(name)


def subset_pairs(model: Model, keep) -> Model:
  """Model restricted to the candidate contact pairs in `keep` (static
  index list).  Used to build reduced planning models (e.g. prop-contact-
  only rollouts, MJPC-style): the pair tables are the only model state the
  collision/constraint stages read per pair."""
  import numpy as _np
  keep = _np.asarray(keep, _np.int64)
  return model.replace(
      npair=int(len(keep)),
      pair_geom1=tuple(model.pair_geom1[i] for i in keep),
      pair_geom2=tuple(model.pair_geom2[i] for i in keep),
      pair_condim=tuple(model.pair_condim[i] for i in keep),
      pair_friction=model.pair_friction[keep],
      pair_solref=model.pair_solref[keep],
      pair_solimp=model.pair_solimp[keep],
      pair_margin=model.pair_margin[keep])


def moving_base_bodies(model: Model) -> set:
  """Bodies whose kinematic chain to the world crosses a FREE joint or a
  mocap body — i.e. bodies whose workspace is unbounded at compile time."""
  import numpy as _np
  moving = [False] * model.nbody
  for b in range(1, model.nbody):
    p = model.body_parentid[b]
    here = model.body_mocapid[b] >= 0
    if model.body_jntnum[b]:
      for k in range(model.body_jntnum[b]):
        if model.jnt_type[model.body_jntadr[b] + k] == int(JointType.FREE):
          here = True
    moving[b] = here or moving[p]
  return {b for b in range(model.nbody) if moving[b]}


# Row indices of Contact.param (one (npoint,) plane per scalar parameter).
PARAM_MARGIN = 0
PARAM_SOLREF = slice(1, 3)
PARAM_SOLIMP = slice(3, 8)
PARAM_FRICTION = slice(8, 11)
PARAM_CONDIM = 11
PARAM_BODY1 = 12
PARAM_BODY2 = 13
PARAM_IW = 14          # body_invweight0[b1, 0] + body_invweight0[b2, 0]
NPARAM = 15


@pytree_dataclass
class Contact:
  """Static-shape contact slots in component-plane (SoA) layout.

  TPU layout rule: nothing pair-sized carries a trailing dim of 3/9 — each
  scalar component is its own (npoint,) plane, so downstream math stays
  elementwise over the lane-sized slot axis and XLA never relayouts tiny
  minor dims.  With the midphase (Option.midphase_cap > 0) the pair
  occupying a slot is dynamic; only the margin (needed for top-K scoring)
  rides along per slot — the remaining pair parameters are resolved in the
  constraint stage by a one-hot contraction of the selected slots' pair
  ids against the static (NPARAM, npair) table (constant MXU operand, so
  nothing pair-parameter-sized is ever materialized per env)."""
  dist: jax.Array      # (npoint,) signed distance (penetration < 0)
  pos: jax.Array       # (3, npoint) midpoint position planes
  frame: jax.Array     # (9, npoint) planes: normal, tangent1, tangent2
  pair: jax.Array      # (npoint,) int32 candidate-pair index (-1 unused)
  margin: jax.Array    # (npoint,) pair margin (for top-K scoring)


@pytree_dataclass
class Data:
  """Simulation state + forward-pass products for one environment instance.

  Batched by vmap over the leading axis of every leaf.
  """

  # ---- state --------------------------------------------------------------
  time: jax.Array            # ()
  qpos: jax.Array            # (nq,)
  qvel: jax.Array            # (nv,)
  ctrl: jax.Array            # (nu,)
  qfrc_applied: jax.Array    # (nv,)
  xfrc_applied: jax.Array    # (nbody, 6) world-frame force/torque at body COM
  mocap_pos: jax.Array       # (nmocap, 3)
  mocap_quat: jax.Array      # (nmocap, 4)

  # ---- forward products -----------------------------------------------------
  xpos: jax.Array            # (nbody, 3) frame origin
  xquat: jax.Array           # (nbody, 4)
  xipos: jax.Array           # (nbody, 3) COM position
  ximat: jax.Array           # (nbody, 3, 3) inertia frame orientation
  site_xpos: jax.Array       # (nsite, 3)
  site_xmat: jax.Array       # (nsite, 3, 3)
  geom_xpos: jax.Array       # (ngeom, 3)
  geom_xmat: jax.Array       # (ngeom, 3, 3)

  cdof: jax.Array            # (nv, 6) dof spatial axes: rows [ang(3), lin(3)]
  cvel: jax.Array            # (nbody, 6) body COM spatial velocity [ang, lin]

  qM: jax.Array              # (nv, nv) dense joint-space inertia
  qLD: jax.Array             # (nv, nv) Cholesky factor of qM (+armature)
  qfrc_bias: jax.Array       # (nv,)
  qfrc_passive: jax.Array    # (nv,)
  qfrc_actuator: jax.Array   # (nv,)
  qfrc_constraint: jax.Array  # (nv,)
  # Dof-space (joint-structural) constraint force: limits, frictionloss and
  # JOINT/TENDON equality rows only — the part of qfrc_constraint a joint
  # torque sensor sees (contacts and CONNECT/WELD wrenches are external to
  # the joint).  Feeds the joint_torques observable.
  qfrc_constraint_axis: jax.Array  # (nv,)
  qacc_smooth: jax.Array     # (nv,)
  qacc: jax.Array            # (nv,)

  ten_length: jax.Array      # (ntendon,)
  ten_velocity: jax.Array    # (ntendon,)
  actuator_length: jax.Array   # (nu,)
  actuator_velocity: jax.Array  # (nu,)
  actuator_force: jax.Array  # (nu,)

  contact: Contact


def make_data(model: Model, dtype=None) -> Data:
  """Creates a zero-initialized Data at the model reference configuration."""
  import jax.numpy as jnp  # local: keep module import light

  if dtype is None:
    dtype = jnp.zeros(0).dtype  # respects jax_enable_x64

  def z(*shape):
    return jnp.zeros(shape, dtype=dtype)

  nq, nv, nu = model.nq, model.nv, model.nu
  nbody, nsite, ngeom = model.nbody, model.nsite, model.ngeom
  npoint = num_contact_points(model)
  ident = jnp.tile(jnp.array([1.0, 0, 0, 0], dtype=dtype), (nbody, 1))
  eye3 = jnp.tile(jnp.eye(3, dtype=dtype), (nbody, 1, 1))
  return Data(
      time=jnp.asarray(0.0, dtype=dtype),
      qpos=jnp.asarray(model.qpos0, dtype=dtype),
      qvel=z(nv), ctrl=z(nu), qfrc_applied=z(nv),
      xfrc_applied=z(nbody, 6),
      mocap_pos=z(model.nmocap, 3),
      mocap_quat=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype=dtype),
                          (model.nmocap, 1)),
      xpos=z(nbody, 3), xquat=ident, xipos=z(nbody, 3), ximat=eye3,
      site_xpos=z(nsite, 3),
      site_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (nsite, 1, 1)),
      geom_xpos=z(ngeom, 3),
      geom_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (ngeom, 1, 1)),
      cdof=z(nv, 6), cvel=z(nbody, 6),
      qM=z(nv, nv), qLD=z(nv, nv),
      qfrc_bias=z(nv), qfrc_passive=z(nv), qfrc_actuator=z(nv),
      qfrc_constraint=z(nv), qfrc_constraint_axis=z(nv),
      qacc_smooth=z(nv), qacc=z(nv),
      ten_length=z(model.ntendon), ten_velocity=z(model.ntendon),
      actuator_length=z(nu), actuator_velocity=z(nu), actuator_force=z(nu),
      contact=Contact(
          dist=jnp.full((npoint,), 1e10, dtype=dtype),
          pos=z(3, npoint),
          frame=jnp.broadcast_to(
              jnp.asarray(np.eye(3).reshape(9, 1), dtype=dtype),
              (9, npoint)),
          pair=-jnp.ones((npoint,), jnp.int32),
          margin=z(npoint),
      ),
  )


# Max contact points generated per candidate geom pair, by the pair's
# (type1, type2).  Plane/box and box/box pairs produce multiple points.
# Cylinders collide as capsules (rounded-cap approximation).
def collision_type(t: int) -> int:
  return int(GeomType.CAPSULE) if int(t) == int(GeomType.CYLINDER) else int(t)


def max_points_per_pair(type1: int, type2: int) -> int:
  t1, t2 = sorted((collision_type(type1), collision_type(type2)))
  box = int(GeomType.BOX)
  plane = int(GeomType.PLANE)
  if (t1, t2) == (plane, box):
    return 8  # all corners (sort-free kernel)
  if (t1, t2) == (box, box):
    return 8
  if t2 == box:  # sphere/capsule/etc vs box
    return 2 if t1 == int(GeomType.CAPSULE) else 1
  if t1 == plane and t2 == int(GeomType.CAPSULE):
    return 2
  return 1


def num_contact_points(model: Model) -> int:
  """Total static contact slots: per type-group, min(n_pairs, midphase_cap)
  pairs times the group's points-per-pair."""
  groups = {}
  for g1, g2 in zip(model.pair_geom1, model.pair_geom2):
    t1 = collision_type(model.geom_type[g1])
    t2 = collision_type(model.geom_type[g2])
    key = tuple(sorted((t1, t2)))
    groups[key] = groups.get(key, 0) + 1
  cap = model.opt.midphase_cap
  cap_plane = getattr(model.opt, 'midphase_cap_plane', 0) or cap
  n = 0
  for (t1, t2), count in groups.items():
    gcap = cap_plane if (cap and t1 == int(GeomType.PLANE)) else cap
    m = count if cap == 0 else min(count, gcap)
    n += m * max_points_per_pair(t1, t2)
  return max(n, 1)
