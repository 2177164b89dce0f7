"""Visual-mesh fidelity: camera observables render the real vendor hand
meshes, not the fitted collision primitives (VERDICT r3 item 5; reference
renders the vendored STL meshes via dm_control — models/hands/
shadow_hand_e.py:24 loads the vendor MJCF whose visual meshes draw)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dexterity_tpu import manipulation


def test_export_includes_shadow_visual_meshes():
  mujoco = pytest.importorskip('mujoco')
  from dexterity_tpu.mjcf import export

  task = manipulation.build_task('reorient', 'state_dense')
  xml = export.export_mjcf(task.arena.spec, keep_visual=True,
                           include_meshes=True)
  mm = mujoco.MjModel.from_xml_string(xml)
  assert mm.nmesh > 0
  mesh_geoms = int(np.sum(mm.geom_type == mujoco.mjtGeom.mjGEOM_MESH))
  assert mesh_geoms > 0
  # Conformance export stays primitives-only (physics interchange).
  xml_conf = export.export_mjcf(task.arena.spec, keep_visual=True)
  mm_conf = mujoco.MjModel.from_xml_string(xml_conf)
  assert mm_conf.nmesh == 0


def test_mpl_dual_use_meshes_reemitted_as_visuals():
  """MPL's vendor meshes are collision+visual in one; export re-emits them
  as visual-only geoms and hides the fitted primitives (group 4)."""
  mujoco = pytest.importorskip('mujoco')
  from dexterity_tpu.mjcf import export
  from dexterity_tpu.models import hands

  hand = hands.MPLHand()
  xml = export.export_mjcf(hand.spec, keep_visual=True, include_meshes=True)
  mm = mujoco.MjModel.from_xml_string(xml)
  assert mm.nmesh > 0
  is_mesh = mm.geom_type == mujoco.mjtGeom.mjGEOM_MESH
  assert int(np.sum(is_mesh)) > 0
  # Every emitted visual mesh is non-colliding; the fitted primitives the
  # meshes replace sit in the hidden group 4.
  assert np.all(mm.geom_contype[is_mesh] == 0)
  assert np.all(mm.geom_conaffinity[is_mesh] == 0)
  prim_with_provenance = (~is_mesh) & (mm.geom_group == 4)
  assert int(np.sum(prim_with_provenance)) > 0


def test_state_bridge_copies_qpos_by_joint_name():
  """The viewer/renderer state bridge maps (qpos, mocap) onto the host
  MuJoCo model by joint name — the --interactive state-copy path."""
  mujoco = pytest.importorskip('mujoco')
  from dexterity_tpu.rendering import StateBridge

  task = manipulation.build_task('reorient', 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  model = task.compile()
  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(3))
  bridge = StateBridge(task.arena.spec, model)
  bridge.copy_state(np.asarray(state.data.qpos),
                    np.asarray(state.data.mocap_pos),
                    np.asarray(state.data.mocap_quat))
  qpos = np.asarray(state.data.qpos)
  for ji, name in enumerate(model.jnt_names):
    tj = mujoco.mj_name2id(bridge.mm, mujoco.mjtObj.mjOBJ_JOINT, name)
    w = {0: 7, 1: 4, 2: 1, 3: 1}[int(bridge.mm.jnt_type[tj])]
    ours = int(model.jnt_qposadr[ji])
    theirs = int(bridge.mm.jnt_qposadr[tj])
    np.testing.assert_allclose(bridge.md.qpos[theirs:theirs + w],
                               qpos[ours:ours + w], atol=0)
  # mj_forward ran: body frames are populated.
  assert np.any(bridge.md.xpos != 0)


def test_vision_pixels_rendered_from_meshes():
  """The VISION preset's HostRenderer model contains the vendor meshes and
  produces non-trivial pixels."""
  pytest.importorskip('mujoco')
  from dexterity_tpu.manipulation.shared import observations
  from dexterity_tpu.manipulation.tasks import reach

  task = reach.reach_task(
      observation_set=observations.ObservationSet.VISION_ONLY,
      use_dense_reward=True)
  env = manipulation._environment.GoalEnvironment(task)
  state, ts = jax.jit(env.reset)(jax.random.PRNGKey(0))
  img = ts.observation['front_close']
  assert img.shape == (84, 84, 3)
  assert img.dtype == jnp.uint8
  assert int(np.asarray(img).max()) > 0
  # The realized renderer model carries the mesh assets.
  cams = task._camera_obs
  assert cams._renderer is not None
  assert cams._renderer._mm.nmesh > 0
