"""Host-side camera rendering for vision observables.

The TPU compute path is pure JAX; pixels are produced by MuJoCo's native
offscreen renderer (EGL) on the host, bridged into jitted observation
functions with jax.pure_callback.  This is an explicit host boundary — the
physics state (qpos + mocap) crosses to the host per control step when a
vision preset is enabled, which is the standard trade for camera RL
pipelines (the reference renders through dm_control's composer camera
observables, manipulation/shared/cameras.py:53-64 + observations.py VISION
preset; same host-side boundary there).

The renderer works on the task's exported MJCF (mjcf/export.py) with the
camera configs inserted, and copies state across by joint name, so it stays
valid for any composed arena.  mujoco is an optional dependency used only
when rendering is requested.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Sequence

import numpy as np

# Must be set before mujoco loads an OpenGL platform library; EGL is the
# headless-friendly default (README documents the host-side boundary).
os.environ.setdefault('MUJOCO_GL', 'egl')

_fmt = None  # set lazily from mjcf.export


class StateBridge:
  """Maps framework physics state onto a host MuJoCo model of the task.

  Builds a MuJoCo model from the exported MJCF (real vendor meshes
  included when packaged) and copies (qpos, mocap) across by joint name —
  robust to ordering differences, valid for any composed arena.  Shared
  by the offscreen camera renderer and the interactive viewer
  (manipulation/explore.py --interactive; reference launches
  dm_control.viewer, explore.py:58-62).
  """

  def __init__(self, spec, model, camera_configs: Sequence = ()):
    import mujoco  # deferred: optional dependency

    from dexterity_tpu.mjcf import export

    xml = export.export_mjcf(spec, keep_visual=True, include_meshes=True)
    root = ET.fromstring(xml)
    wb = root.find('worldbody')
    existing = {c.get('name') for c in wb.findall('camera')}
    for cfg in camera_configs:
      if cfg.name in existing:
        continue
      ET.SubElement(
          wb, 'camera', name=cfg.name,
          pos=' '.join(f'{v:.12g}' for v in cfg.pos),
          xyaxes=' '.join(f'{v:.12g}' for v in cfg.xyaxes))
    # A headlight-ish top light so renders are not black.
    if wb.find('light') is None:
      ET.SubElement(wb, 'light', pos='0 0 2', dir='0 0 -1',
                    diffuse='0.8 0.8 0.8')
    self.mm = mujoco.MjModel.from_xml_string(
        ET.tostring(root, encoding='unicode'))
    self.md = mujoco.MjData(self.mm)
    self._mujoco = mujoco
    # State mapping by joint name (robust to any ordering differences).
    self._qpos_map = []  # (ours_adr, theirs_adr, width)
    for ji, name in enumerate(model.jnt_names):
      tj = mujoco.mj_name2id(self.mm, mujoco.mjtObj.mjOBJ_JOINT, name)
      if tj < 0:
        raise ValueError(f'joint {name!r} missing from exported model')
      w = {0: 7, 1: 4, 2: 1, 3: 1}[int(self.mm.jnt_type[tj])]
      self._qpos_map.append((int(model.jnt_qposadr[ji]),
                             int(self.mm.jnt_qposadr[tj]), w))
    self._nmocap = int(self.mm.nmocap)

  def scene_option(self):
    """MjvOption showing the right geom groups for this model."""
    opt = self._mujoco.MjvOption()
    if self.mm.nmesh > 0:
      # Real vendor meshes are present (mjcf/export.py include_meshes):
      # show visual groups 0-2, hide the fitted collision primitives
      # (groups 3-5) the meshes replace.
      opt.geomgroup[:3] = 1
      opt.geomgroup[3:] = 0
    else:
      # No mesh assets: the fitted primitives ARE the visuals (they sit
      # in groups viewers hide by default) — enable every group.
      opt.geomgroup[:] = 1
    return opt

  def copy_state(self, qpos: np.ndarray, mocap_pos: np.ndarray,
                 mocap_quat: np.ndarray) -> None:
    """Copies (nq,), (nmocap, 3), (nmocap, 4) into the MuJoCo data and
    refreshes derived quantities."""
    md = self.md
    for ours, theirs, w in self._qpos_map:
      md.qpos[theirs:theirs + w] = qpos[ours:ours + w]
    if self._nmocap:
      md.mocap_pos[:] = np.asarray(mocap_pos)[:self._nmocap]
      md.mocap_quat[:] = np.asarray(mocap_quat)[:self._nmocap]
    self._mujoco.mj_forward(self.mm, md)


class HostRenderer:
  """Renders camera images for states of a compiled task model."""

  def __init__(self, spec, model, camera_configs: Sequence,
               height: int = 84, width: int = 84):
    """Args:
      spec: the task's ModelSpec (arena.spec).
      model: the compiled Model (for joint name/address tables).
      camera_configs: CameraConfig sequence (shared/cameras.py presets).
      height/width: image size (CameraObservableSpec.height/width).
    """
    self._bridge = StateBridge(spec, model, camera_configs)
    self._mm = self._bridge.mm
    self._md = self._bridge.md
    self._mujoco = self._bridge._mujoco
    # The GL context is thread-affine (EGL) and XLA may invoke callbacks
    # from different threads per call: pin all GL work (context creation
    # included) to one dedicated worker thread.
    import concurrent.futures
    self._renderer = None
    self._executor = concurrent.futures.ThreadPoolExecutor(
        max_workers=1, thread_name_prefix='dexterity-render')
    self._cameras = [cfg.name for cfg in camera_configs]
    self.height, self.width = height, width

  def render_state(self, qpos: np.ndarray, mocap_pos: np.ndarray,
                   mocap_quat: np.ndarray) -> np.ndarray:
    """(nq,), (nmocap, 3), (nmocap, 4) -> (ncam, h, w, 3) uint8."""
    if self._renderer is None:
      self._renderer = self._mujoco.Renderer(self._mm, self.height,
                                             self.width)
      self._scene_option = self._bridge.scene_option()
    self._bridge.copy_state(qpos, mocap_pos, mocap_quat)
    out = []
    for cam in self._cameras:
      self._renderer.update_scene(self._md, camera=cam,
                                  scene_option=self._scene_option)
      out.append(self._renderer.render().copy())
    return np.stack(out)

  def render_batch(self, qpos, mocap_pos, mocap_quat) -> np.ndarray:
    """Arbitrary leading batch dims -> (..., ncam, h, w, 3) uint8."""
    return self._executor.submit(
        self._render_batch_worker, qpos, mocap_pos, mocap_quat).result()

  def _render_batch_worker(self, qpos, mocap_pos, mocap_quat) -> np.ndarray:
    qpos = np.asarray(qpos)
    mocap_pos = np.asarray(mocap_pos)
    mocap_quat = np.asarray(mocap_quat)
    batch_shape = qpos.shape[:-1]
    flat_q = qpos.reshape((-1,) + qpos.shape[len(batch_shape):])
    n = flat_q.shape[0]
    if mocap_pos.size == 0:  # reshape(-1, 0, 3) is ambiguous for numpy
      flat_p = np.zeros((n, 0, 3))
      flat_r = np.zeros((n, 0, 4))
    else:
      flat_p = mocap_pos.reshape((-1,) + mocap_pos.shape[len(batch_shape):])
      flat_r = mocap_quat.reshape((-1,) + mocap_quat.shape[len(batch_shape):])
    imgs = np.stack([
        self.render_state(flat_q[i], flat_p[i], flat_r[i])
        for i in range(flat_q.shape[0])])
    return imgs.reshape(batch_shape + imgs.shape[1:])


class CameraObservables:
  """Realizes CameraObservableSpec as jit-compatible pixel observables.

  Built lazily at first use (after the task's model is compiled); inside
  jitted observation functions the rendering crosses to the host through
  jax.pure_callback, so the observation dict stays a pure function of
  (model, data) from the caller's perspective.
  """

  def __init__(self, spec, camera_configs: Sequence, camera_spec):
    self._spec = spec
    self._configs = tuple(camera_configs)
    self._cam_spec = camera_spec
    self._renderer = None
    if getattr(camera_spec, 'depth', False) or getattr(
        camera_spec, 'segmentation', False):
      raise NotImplementedError(
          'depth/segmentation camera observables are not supported')

  @property
  def enabled(self) -> bool:
    return bool(getattr(self._cam_spec, 'enabled', False))

  def _get_renderer(self, model):
    if self._renderer is None:
      self._renderer = HostRenderer(
          self._spec, model, self._configs,
          height=self._cam_spec.height, width=self._cam_spec.width)
    return self._renderer

  def as_dict(self, model, data):
    if not self.enabled:
      return {}
    import jax
    import jax.numpy as jnp
    renderer = self._get_renderer(model)
    h, w = self._cam_spec.height, self._cam_spec.width
    ncam = len(self._configs)
    result_shape = jax.ShapeDtypeStruct((ncam, h, w, 3), jnp.uint8)
    imgs = jax.pure_callback(
        renderer.render_batch, result_shape,
        data.qpos, data.mocap_pos, data.mocap_quat,
        vmap_method='expand_dims')
    return {cfg.name: imgs[..., i, :, :, :]
            for i, cfg in enumerate(self._configs)}
