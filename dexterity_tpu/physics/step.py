"""Forward dynamics pipeline and step function.

`forward(model, data)` recomputes every derived quantity from (qpos, qvel,
ctrl, mocap); `step(model, data)` = forward + Euler integration.  Both are
pure and jit/vmap/shard_map-friendly — the TPU-native replacement for the
reference's `physics.step()` / `physics.forward()` C boundary
(SURVEY.md §2.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dexterity_tpu.core.types import Data, Model
from dexterity_tpu.physics import constraint as constraint_mod
from dexterity_tpu.physics import kinematics, smooth


def fwd_position(model: Model, data: Data) -> Data:
  data = kinematics.fwd_position(model, data)
  data = smooth.crb(model, data)
  from dexterity_tpu.physics.collision import narrowphase
  data = narrowphase.collision(model, data)
  return data


def fwd_velocity(model: Model, data: Data) -> Data:
  data = kinematics.fwd_velocity_kinematics(model, data)
  data = smooth.actuation(model, data)
  data = smooth.passive(model, data)
  data = smooth.rne(model, data)
  return data


def fwd_acceleration(model: Model, data: Data) -> Data:
  qfrc_smooth = (data.qfrc_passive + data.qfrc_actuator + data.qfrc_applied
                 + smooth.xfrc_accumulate(model, data) - data.qfrc_bias)
  # qacc_smooth (an M-solve) is not needed on the hot path: the constraint
  # solver's objective uses qfrc_smooth directly.
  data = constraint_mod.solve(model, data, qfrc_smooth)
  return data


def forward(model: Model, data: Data) -> Data:
  data = fwd_position(model, data)
  data = fwd_velocity(model, data)
  data = fwd_acceleration(model, data)
  return data


def step(model: Model, data: Data) -> Data:
  data = forward(model, data)
  data = smooth.euler(model, data)
  return data


def step_hot(model: Model, data: Data) -> Data:
  """One physics substep via the plane-form (SoA) pipeline.

  Same semantics as `step` (equality modulo float reassociation is pinned
  by tests/test_hot_step.py) but no AoS derived tensors are materialized:
  body poses, geom frames, inertias and the tree contractions all run on
  component planes (see physics/math.py plane note), which is ~2x faster
  per substep at planner batch sizes on TPU.  Derived Data fields other
  than the integrator carry are left stale — callers that need frames or
  contacts after the step must refresh (step_n does).
  """
  pre = _precompute_planes(model, data.qpos, data.qvel, data.mocap_pos,
                           data.mocap_quat)
  return _finish_step(model, data, pre)


def _precompute_planes(model: Model, qpos, qvel, mocap_pos, mocap_quat):
  """Tree-sweep plane products for one substep (FK/frames/CRB/RNE).

  Rank-polymorphic: with qpos (nq,) all outputs are per-env planes; with
  qpos (nq, B) (mocap/qvel batched the same way, batch-minor) every output
  gains a trailing B — the layout where XLA packs the batch into the lane
  axis and the sweep runs at full vreg width (step_hot_b)."""
  dtype = qpos.dtype
  xpos_p, xquat_p, cdof6 = kinematics.body_poses_planes(
      model, qpos, mocap_pos, mocap_quat)
  gpos, gmat = kinematics.frame_planes(
      xpos_p, xquat_p, model.geom_bodyid, model.geom_pos, model.geom_quat,
      dtype)
  body10, xipos3 = smooth.inertia_origin_planes(model, xpos_p, xquat_p)
  qm = smooth.crb_planes(model, body10, cdof6)
  qfrc_bias, _ = smooth.rne_planes(model, body10, cdof6, qvel)
  if model.ntendon:
    dof_qposadr = kinematics._dof_qposadr(model)
    ten_length = model.tendon_moment @ qpos[dof_qposadr]
    ten_velocity = model.tendon_moment @ qvel
  else:
    bshape = qpos.shape[1:]
    ten_length = jnp.zeros((0,) + bshape, dtype)
    ten_velocity = jnp.zeros((0,) + bshape, dtype)
  return dict(xpos_p=xpos_p, xquat_p=xquat_p, cdof6=cdof6,
              gpos=gpos, gmat=gmat, xipos3=xipos3, qm=qm,
              qfrc_bias=qfrc_bias, ten_length=ten_length,
              ten_velocity=ten_velocity)


def _finish_step(model: Model, data: Data, pre: dict,
                 selinfo=None) -> Data:
  """Collision, actuation, constraint solve and integration (per-env)."""
  from dexterity_tpu.physics import constraint as constraint_mod
  from dexterity_tpu.physics.collision import primitives
  dtype = data.qpos.dtype
  xpos_p, xquat_p, cdof6 = pre['xpos_p'], pre['xquat_p'], pre['cdof6']

  # Group form, never concatenated into a Contact: the constraint stage's
  # top-K selection consumes the groups directly (one-hot contractions at
  # static offsets), saving the 13-plane payload copy per substep.
  contact_groups = primitives.collide_group_planes(
      model, pre['gpos'], pre['gmat'], data.qpos[0] * 0, dtype,
      selinfo=selinfo)

  updates = dict(qM=pre['qm'], cdof=cdof6.T,
                 ten_length=pre['ten_length'],
                 ten_velocity=pre['ten_velocity'],
                 qfrc_bias=pre['qfrc_bias'])
  if model.neq:
    # CONNECT/WELD row assembly reads AoS body poses (tiny arrays).
    updates.update(xpos=xpos_p.T, xquat=xquat_p.T)
  data = data.replace(**updates)

  data = smooth.actuation(model, data)
  data = smooth.passive(model, data)
  qfrc_smooth = (data.qfrc_passive + data.qfrc_actuator + data.qfrc_applied
                 + smooth.xfrc_planes(model, pre['xipos3'], cdof6,
                                      data.xfrc_applied)
                 - data.qfrc_bias)
  data = constraint_mod.solve(model, data, qfrc_smooth,
                              contact_groups=contact_groups)
  return smooth.euler_from_smooth(model, data, qfrc_smooth)


def step_hot_b(model: Model, data: Data, selinfo=None) -> Data:
  """Batched step_hot: `data` has a leading batch axis on every field.

  Equivalent to vmap(step_hot) (pinned by tests/test_hot_step.py) but the
  tree-sweep stages (FK, frames, inertias, CRB, RNE) run batch-minor:
  planes shaped (c, n, B) put the batch in the XLA lane axis, so the
  30-40-wide body/dof sweeps run at full vector width instead of the ~25%
  lane utilization of the vmap layout.  The pair-axis stages (narrow
  phase, constraint solve) stay batch-major under vmap — their minor axes
  (candidate pairs, top-K slots) are already lane-sized, and the one-hot
  selection contractions want the batch as an MXU batch dim.  The
  transpose seam between the two layouts moves only per-body/geom-sized
  arrays (~1 MB at B=512, negligible next to either stage)."""
  pre = _precompute_planes(
      model,
      jnp.moveaxis(data.qpos, 0, -1),
      jnp.moveaxis(data.qvel, 0, -1),
      jnp.moveaxis(data.mocap_pos, 0, -1),
      jnp.moveaxis(data.mocap_quat, 0, -1))
  pre_major = jax.tree.map(lambda p: jnp.moveaxis(p, -1, 0), pre)
  if selinfo is None:
    return jax.vmap(lambda d, p: _finish_step(model, d, p))(data, pre_major)
  return jax.vmap(lambda d, p, s: _finish_step(model, d, p, selinfo=s))(
      data, pre_major, selinfo)


# True integrator state plus the per-dof/per-actuator dynamics outputs a
# caller may read after the control step (e.g. the joint_torques observable
# reads qfrc_* and qacc).  Everything else in Data is derived geometry that
# is recomputed from qpos anyway.
_STEP_CARRY = ('time', 'qpos', 'qvel', 'qacc', 'qacc_smooth', 'qfrc_bias',
               'qfrc_passive', 'qfrc_actuator', 'qfrc_constraint',
               'qfrc_constraint_axis', 'actuator_length',
               'actuator_velocity', 'actuator_force')

# Planner-rollout carry: rewards/failure predicates under refresh='none'
# read qpos/qvel only, and the Newton warm start reads qacc — the ten
# dynamics-output fields above exist for env observables and just ride the
# scan as dead copies (XLA can't alias scan carries it rewrites; the carry
# copies were ~4% of a bench solve).  The non-carried fields keep their
# pre-rollout values.
_STEP_CARRY_MIN = ('time', 'qpos', 'qvel', 'qacc')


def step_n(model: Model, data: Data, n: int,
           refresh: str = 'full') -> Data:
  """n physics substeps under lax.scan (control_dt / physics_dt).

  Only the minimal state rides the scan carry — the large derived products
  (frames, contacts, mass matrix) stay out of the loop, which keeps the
  carry small and lets XLA fuse freely.  After the scan, derived
  quantities are refreshed once (MuJoCo mj_step1-style), so observables /
  rewards / failure predicates read quantities consistent with the
  post-step qpos instead of values one substep stale.  (qM/qLD are NOT
  refreshed; re-run smooth.crb if needed.)

  refresh:
    'full' — position + collision + velocity kinematics (env contract).
    'position' — frames/sites only; the cheap mode for planner rollouts
      whose rewards are position-level (contacts and cvel stay stale).
    'none' — integrator carry only; for rollouts whose rewards/failure
      predicates read qpos directly (e.g. reorient's free-prop pose).
  """
  def body(carry, _):
    d = step_hot(model, data.replace(**carry))
    return {f: getattr(d, f) for f in _STEP_CARRY}, ()

  carry0 = {f: getattr(data, f) for f in _STEP_CARRY}
  carry, _ = jax.lax.scan(body, carry0, (), length=n)
  data = data.replace(**carry)
  if refresh == 'none':
    return data
  data = kinematics.fwd_position(model, data)
  if refresh == 'position':
    return data
  from dexterity_tpu.physics.collision import narrowphase
  data = narrowphase.collision(model, data)
  data = kinematics.fwd_velocity_kinematics(model, data)
  return data


def step_n_b(model: Model, data: Data, n: int,
             refresh: str = 'full', midphase: str = 'per_substep',
             carry: str = 'full') -> Data:
  """Batched step_n (leading batch axis): step_hot_b under the scan.

  Same carry/refresh contract as step_n; the refresh stages run under
  vmap (they feed per-env observables/rewards).  Use from planner rollouts
  where the whole candidate population steps in lockstep — the batch-minor
  tree sweeps inside step_hot_b are the point (see its docstring).

  midphase='per_call' hoists the midphase pair selection out of the
  substep loop: the first substep's FK builds the slot one-hot once
  (primitives.midphase_selinfo) and every substep of this call reuses it
  (planner rollouts; the env contract keeps per-substep selection).

  carry='minimal' rides only (time, qpos, qvel, qacc) through the scan —
  for planner rollouts whose rewards read qpos/qvel (see _STEP_CARRY_MIN);
  the env contract keeps the full dynamics-output carry."""
  fields = _STEP_CARRY_MIN if carry == 'minimal' else _STEP_CARRY
  selinfo = None
  carry0 = {f: getattr(data, f) for f in fields}
  n_scan = n
  if midphase == 'per_call' and model.npair:
    # The first substep's tree sweep doubles as the selection build: its
    # geom frames feed midphase_selinfo, then the same `pre` finishes
    # substep 1 (no extra FK), and substeps 2..n reuse the slot one-hot.
    from dexterity_tpu.physics.collision import primitives
    pre0 = _precompute_planes(
        model,
        jnp.moveaxis(data.qpos, 0, -1),
        jnp.moveaxis(data.qvel, 0, -1),
        jnp.moveaxis(data.mocap_pos, 0, -1),
        jnp.moveaxis(data.mocap_quat, 0, -1))
    gpos_major = tuple(jnp.moveaxis(p, -1, 0) for p in pre0['gpos'])
    gmat_major = tuple(jnp.moveaxis(p, -1, 0) for p in pre0['gmat'])
    dtype = data.qpos.dtype
    selinfo = jax.vmap(
        lambda gp, gm: primitives.midphase_selinfo(model, gp, gm, dtype))(
            gpos_major, gmat_major)
    if all(si is None for si in selinfo):
      selinfo = None
    else:
      pre0_major = jax.tree.map(lambda p: jnp.moveaxis(p, -1, 0), pre0)
      d1 = jax.vmap(lambda d, p, si: _finish_step(model, d, p, selinfo=si))(
          data, pre0_major, selinfo)
      carry0 = {f: getattr(d1, f) for f in fields}
      n_scan = n - 1

  def body(carry, _):
    d = step_hot_b(model, data.replace(**carry), selinfo=selinfo)
    return {f: getattr(d, f) for f in fields}, ()

  # Unroll short control-step bursts (3-5 substeps): XLA then fuses across
  # substep boundaries instead of materializing the scan carry in HBM each
  # iteration.  Long rollouts keep the scan (graph size / compile time).
  if n_scan:
    carry, _ = jax.lax.scan(body, carry0, (), length=n_scan,
                            unroll=(n_scan <= 8))
  else:
    carry = carry0
  data = data.replace(**carry)
  if refresh == 'none':
    return data
  data = jax.vmap(lambda d: kinematics.fwd_position(model, d))(data)
  if refresh == 'position':
    return data
  from dexterity_tpu.physics.collision import narrowphase
  def vrefresh(d):
    d = narrowphase.collision(model, d)
    return kinematics.fwd_velocity_kinematics(model, d)
  return jax.vmap(vrefresh)(data)
