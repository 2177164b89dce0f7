"""Cartesian-velocity -> joint-velocity mapper interface
(reference: dexterity/controllers/mapper.py).

Parameters validate object types/names against the compiled model exactly as
the reference validates against mjModel (mapper.py:52-90); the mapping
itself is a pure jax function over (model, data, target_velocities).
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Sequence

from dexterity_tpu.core.types import Model, ObjType


@dataclasses.dataclass(frozen=True)
class Parameters:
  """Parameters for a cartesian-to-joint velocity mapper."""
  model: Model
  object_types: Sequence[ObjType]
  object_names: Sequence[str]

  def __post_init__(self):
    if len(self.object_types) != len(self.object_names):
      raise ValueError('object_types and object_names must align.')
    for otype, oname in zip(self.object_types, self.object_names):
      if otype not in (ObjType.BODY, ObjType.GEOM, ObjType.SITE):
        raise ValueError(
            f'Objects of type {otype} are not supported; only '
            'body, geom and site are.')
      names = {ObjType.BODY: self.model.body_names,
               ObjType.GEOM: self.model.geom_names,
               ObjType.SITE: self.model.site_names}[ObjType(otype)]
      if oname not in names:
        raise ValueError(f'Could not find MuJoCo object with name {oname!r} '
                         f'and type {ObjType(otype).name}.')

  def object_ids(self):
    out = []
    for otype, oname in zip(self.object_types, self.object_names):
      names = {ObjType.BODY: self.model.body_names,
               ObjType.GEOM: self.model.geom_names,
               ObjType.SITE: self.model.site_names}[ObjType(otype)]
      out.append(names.index(oname))
    return tuple(out)


class CartesianVelocitytoJointVelocityMapper(abc.ABC):
  """Maps Cartesian 6D target velocities to joint velocities."""

  @abc.abstractmethod
  def compute_joint_velocities(self, data, target_velocities,
                               nullspace_bias=None):
    ...
