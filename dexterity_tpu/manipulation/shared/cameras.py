"""Camera configurations (reference: manipulation/shared/cameras.py).

Cameras are carried as metadata on compiled environments; offscreen
rendering is host-side (see mjcf.export to view a task in any MuJoCo
viewer).  Vision observables are deferred (SURVEY.md §7 P4).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class CameraConfig:
  name: str
  pos: Tuple[float, float, float]
  xyaxes: Tuple[float, float, float, float, float, float]


FRONT_CLOSE = CameraConfig(
    name='front_close', pos=(0.0, -0.5, 0.5),
    xyaxes=(1.0, 0.0, 0.0, 0.0, 0.7, 0.75))
LEFT_CLOSE = CameraConfig(
    name='left_close', pos=(-0.6, 0.0, 0.5),
    xyaxes=(0.0, -1.0, 0.0, 0.7, 0.0, 0.75))
RIGHT_CLOSE = CameraConfig(
    name='right_close', pos=(0.6, 0.0, 0.5),
    xyaxes=(0.0, 1.0, 0.0, -0.7, 0.0, 0.75))
FRONT_FAR = CameraConfig(
    name='front_far', pos=(0.0, -1.0, 0.7),
    xyaxes=(1.0, 0.0, 0.0, 0.0, 0.7, 0.75))
TOP_DOWN = CameraConfig(
    name='top_down', pos=(0.0, 0.0, 2.5),
    xyaxes=(1.0, 0.0, 0.0, 0.0, 1.0, 0.0))


def add_camera_observables(arena, obs_settings, *camera_configs):
  """Realizes obs_settings.camera for the given cameras
  (reference: manipulation/shared/cameras.py:53-64).

  Returns a CameraObservables whose as_dict(model, data) yields one
  (height, width, 3) uint8 observation per camera, rendered host-side
  (dexterity_tpu.rendering docstring documents the boundary).
  """
  from dexterity_tpu import rendering
  return rendering.CameraObservables(arena.spec, camera_configs,
                                     obs_settings.camera)
