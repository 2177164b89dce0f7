"""Model asset serialization + MJCF export round trips."""

import numpy as np
import pytest

from dexterity_tpu.core import serialization
from dexterity_tpu.models import hands


def test_spec_json_roundtrip(tmp_path):
  hand = hands.AdroitHand()
  path = str(tmp_path / 'hand.json')
  serialization.save_spec(hand.spec, path)
  spec2 = serialization.load_spec(path)
  m1 = hand.spec.compile()
  m2 = spec2.compile()
  assert m1.nq == m2.nq and m1.nu == m2.nu and m1.npair == m2.npair
  np.testing.assert_allclose(np.asarray(m1.body_pos), np.asarray(m2.body_pos))
  np.testing.assert_allclose(np.asarray(m1.jnt_range),
                             np.asarray(m2.jnt_range))
  np.testing.assert_allclose(np.asarray(m1.actuator_gainprm),
                             np.asarray(m2.actuator_gainprm))
  np.testing.assert_allclose(np.asarray(m1.tendon_moment),
                             np.asarray(m2.tendon_moment))
  assert m1.jnt_names == m2.jnt_names


def test_export_reimports_in_mujoco():
  """Exported MJCF compiles in MuJoCo with matching dimensions
  (reference export_task parity; conformance export pins the pair list)."""
  mujoco = pytest.importorskip('mujoco')
  from dexterity_tpu.mjcf import export
  hand = hands.ShadowHandSeriesE()
  model = hand.spec.compile()
  xml = export.export_for_conformance(hand.spec)
  mm = mujoco.MjModel.from_xml_string(xml)
  assert mm.nq == model.nq
  assert mm.nv == model.nv
  assert mm.nu == model.nu
  assert mm.npair == model.npair


def test_export_plain_mjcf_compiles():
  mujoco = pytest.importorskip('mujoco')
  from dexterity_tpu.mjcf import export
  from dexterity_tpu import manipulation
  task = manipulation.build_task('reach', 'state_dense')
  xml = export.export_mjcf(task.arena.spec)
  mm = mujoco.MjModel.from_xml_string(xml)
  assert mm.nu == 24
