"""Damped least squares mapper (reference: dexterity/controllers/dls/dls.py).

Stacks per-fingertip 3xnv position Jacobians (rotation rows dropped,
dls.py:148-160) and solves (J^T J + lambda I) v = J^T V; plain pseudoinverse
when lambda == 0 (dls.py:166-174).  Pure jax; vmappable over batches of
states and targets — a batch of DLS solves is one batched Cholesky on the
MXU instead of the reference's sequential np.linalg.solve calls.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from dexterity_tpu.controllers import mapper
from dexterity_tpu.core.types import ObjType
from dexterity_tpu.physics import kinematics


@dataclasses.dataclass(frozen=True)
class DampedLeastSquaresParameters(mapper.Parameters):
  regularization_weight: float = 0.0

  def __post_init__(self):
    super().__post_init__()
    if self.regularization_weight < 0:
      raise ValueError(
          '`regularization_weight` must be non-negative, but was '
          f'{self.regularization_weight}.')


@dataclasses.dataclass(frozen=True)
class DampedLeastSquaresMapper(mapper.CartesianVelocitytoJointVelocityMapper):
  params: DampedLeastSquaresParameters

  def stacked_jacobian(self, data):
    """(3*k, nv) stacked translational Jacobians at the objects."""
    model = self.params.model
    jacs = []
    for otype, oid in zip(self.params.object_types,
                          self.params.object_ids()):
      otype = ObjType(otype)
      if otype == ObjType.SITE:
        bodyid = model.site_bodyid[oid]
        point = data.site_xpos[oid]
      elif otype == ObjType.GEOM:
        bodyid = model.geom_bodyid[oid]
        point = data.geom_xpos[oid]
      else:
        bodyid = oid
        point = data.xpos[oid]
      jacp, _ = kinematics.jac_point(model, data, bodyid, point)
      jacs.append(jacp)
    return jnp.concatenate(jacs, axis=0)

  def compute_joint_velocities(self, data, target_velocities,
                               nullspace_bias=None):
    """Args:
      data: physics Data with fwd_position computed.
      target_velocities: (k, 3) or (3k,) linear target velocities.

    Returns: (nv,) joint velocities.
    """
    del nullspace_bias  # parity: unused by the reference mapper
    jac = self.stacked_jacobian(data)
    v = jnp.reshape(jnp.asarray(target_velocities), (-1,))
    lam = self.params.regularization_weight
    if lam > 0:
      a = jac.T @ jac + lam * jnp.eye(jac.shape[1], dtype=jac.dtype)
      b = jac.T @ v
      return jax.scipy.linalg.solve(a, b, assume_a='pos')
    return jnp.linalg.lstsq(jac, v)[0]
