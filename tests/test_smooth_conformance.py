"""Conformance: smooth (contact-free) dynamics vs MuJoCo.

Builds equivalent models in MuJoCo and dexterity_tpu and asserts FK, inertia,
bias forces, actuation and multi-step Euler trajectories agree to tight
tolerances.  MuJoCo is a test-only dependency (skipped when absent); runtime
code never imports it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip('mujoco')

from dexterity_tpu.core import spec as S
from dexterity_tpu.core import types as T
from dexterity_tpu.physics import step as tstep

PEND_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body name="link1" pos="0 0.1 0.5" quat="0.9689124 0.2474040 0 0">
      <inertial pos="0.02 0 -0.15" quat="0.9689124 0.2474040 0 0" mass="1.2"
                diaginertia="0.02 0.015 0.012"/>
      <joint name="j1" axis="0 1 0" pos="0 0 0.1" damping="0.1" armature="0.01" limited="false"/>
      <body name="link2" pos="0 0 -0.3">
        <inertial pos="0 0.01 -0.1" mass="0.4" diaginertia="0.004 0.003 0.002"/>
        <joint name="j2" axis="1 0 0.3" pos="0.01 0 0" damping="0.05" armature="0.002" limited="false"/>
        <site name="tip" pos="0 0 -0.2"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    <position name="a1" joint="j1" kp="5" kv="0.1" ctrlrange="-1 1" ctrllimited="true"/>
    <general name="a2" joint="j2" gainprm="2" biastype="affine" biasprm="0 -2 -0.05"
             ctrlrange="-0.5 0.5" ctrllimited="true" forcerange="-3 3" forcelimited="true"/>
  </actuator>
</mujoco>
"""

FREE_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body name="box" pos="0.1 0.2 1.0" quat="0.9689124 0.2474040 0 0">
      <freejoint/>
      <inertial pos="0.01 0.02 0.03" quat="0.9689124 0 0.2474040 0" mass="0.7"
                diaginertia="0.003 0.0025 0.002"/>
      <geom type="box" size="0.05 0.04 0.03" contype="0" conaffinity="0" mass="0.7"/>
    </body>
  </worldbody>
</mujoco>
"""


def build_pendulum_spec():
  ms = S.ModelSpec(name='pend')
  ms.option.timestep = 0.002
  b1 = ms.worldbody.add_body('link1', pos=np.array([0.0, 0.1, 0.5]),
                             quat=np.array([0.9689124, 0.2474040, 0, 0]))
  b1.add_joint('j1', type=T.JointType.HINGE, axis=np.array([0.0, 1.0, 0.0]),
               pos=np.array([0.0, 0.0, 0.1]), damping=0.1, armature=0.01)
  b1.inertial = S.InertialSpec(
      pos=np.array([0.02, 0.0, -0.15]),
      quat=np.array([0.9689124, 0.2474040, 0.0, 0.0]),
      mass=1.2, diaginertia=np.array([0.02, 0.015, 0.012]))
  b2 = b1.add_body('link2', pos=np.array([0.0, 0.0, -0.3]))
  b2.add_joint('j2', type=T.JointType.HINGE, axis=np.array([1.0, 0.0, 0.3]),
               pos=np.array([0.01, 0.0, 0.0]), damping=0.05, armature=0.002)
  b2.inertial = S.InertialSpec(
      pos=np.array([0.0, 0.01, -0.1]), quat=np.array([1.0, 0.0, 0.0, 0.0]),
      mass=0.4, diaginertia=np.array([0.004, 0.003, 0.002]))
  b2.add_site('tip', pos=np.array([0.0, 0.0, -0.2]))
  ms.actuators.append(S.ActuatorSpec.position('a1', 'j1', kp=5.0, kv=0.1,
                                              ctrlrange=(-1.0, 1.0)))
  ms.actuators.append(S.ActuatorSpec(
      name='a2', target='j2', gainprm=(2.0, 0, 0), biastype=T.BiasType.AFFINE,
      biasprm=(0.0, -2.0, -0.05), ctrlrange=(-0.5, 0.5),
      forcerange=(-3.0, 3.0)))
  return ms


def build_free_spec():
  ms = S.ModelSpec(name='free')
  ms.option.timestep = 0.002
  b = ms.worldbody.add_body('box', pos=np.array([0.1, 0.2, 1.0]),
                            quat=np.array([0.9689124, 0.2474040, 0.0, 0.0]))
  b.add_joint('free', type=T.JointType.FREE)
  b.inertial = S.InertialSpec(
      pos=np.array([0.01, 0.02, 0.03]),
      quat=np.array([0.9689124, 0.0, 0.2474040, 0.0]),
      mass=0.7, diaginertia=np.array([0.003, 0.0025, 0.002]))
  b.add_geom('g', type=T.GeomType.BOX, size=np.array([0.05, 0.04, 0.03]),
             contype=0, conaffinity=0, mass=0.7)
  return ms


_CACHE = {}


def _run_both(case, xml, spec, qpos, qvel, ctrl):
  """Runs MuJoCo + dexterity_tpu forward once per case (jitted; eager
  dispatch is prohibitively slow in this environment)."""
  if case in _CACHE:
    return _CACHE[case]
  mm = mujoco.MjModel.from_xml_string(xml)
  md = mujoco.MjData(mm)
  md.qpos[:] = qpos
  md.qvel[:] = qvel
  if mm.nu:
    md.ctrl[:] = ctrl
  mujoco.mj_forward(mm, md)

  model = spec.compile()
  data = T.make_data(model, dtype=jnp.float64)
  data = data.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
  if model.nu:
    data = data.replace(ctrl=jnp.asarray(ctrl))
  data = jax.jit(lambda d: tstep.forward(model, d))(data)
  _CACHE[case] = (mm, md, model, data)
  return _CACHE[case]


CASES = {
    'pendulum': (PEND_XML, build_pendulum_spec, np.array([0.3, -0.5]),
                 np.array([0.7, -1.1]), np.array([0.4, -0.2])),
    'free': (FREE_XML, build_free_spec,
             np.array([0.1, 0.2, 1.0, 0.9689124, 0.2474040, 0, 0]),
             np.random.RandomState(0).uniform(-1, 1, 6), np.zeros(0)),
}


@pytest.mark.parametrize('case', sorted(CASES))
def test_forward_matches_mujoco(case):
  xml, build, qpos, qvel, ctrl = CASES[case]
  mm, md, model, data = _run_both(case, xml, build(), qpos, qvel, ctrl)

  np.testing.assert_allclose(np.asarray(data.xpos), md.xpos, atol=1e-12)
  np.testing.assert_allclose(np.abs(np.asarray(data.xquat)),
                             np.abs(md.xquat), atol=1e-12)
  np.testing.assert_allclose(np.asarray(data.xipos), md.xipos, atol=1e-12)
  if model.nsite:
    np.testing.assert_allclose(np.asarray(data.site_xpos), md.site_xpos,
                               atol=1e-12)
  qm_mj = np.zeros((mm.nv, mm.nv))
  mujoco.mj_fullM(mm, md, qm_mj)
  np.testing.assert_allclose(np.asarray(data.qM), qm_mj, atol=1e-12)
  np.testing.assert_allclose(np.asarray(data.qfrc_bias), md.qfrc_bias,
                             atol=1e-12)
  if model.nu:
    np.testing.assert_allclose(np.asarray(data.actuator_force),
                               md.actuator_force, atol=1e-12)
    np.testing.assert_allclose(np.asarray(data.qfrc_actuator),
                               md.qfrc_actuator, atol=1e-12)
  np.testing.assert_allclose(np.asarray(data.qacc), md.qacc, atol=1e-10)


@pytest.mark.parametrize('case', sorted(CASES))
def test_trajectory_matches_mujoco(case):
  xml, build, qpos, qvel, ctrl = CASES[case]
  nsteps = 200
  mm, md, model, data = _run_both(case, xml, build(), qpos, qvel, ctrl)
  for _ in range(nsteps):
    mujoco.mj_step(mm, md)
  data = jax.jit(lambda d: tstep.step_n(model, d, nsteps))(data)
  np.testing.assert_allclose(np.asarray(data.qpos), md.qpos, atol=1e-9)
  np.testing.assert_allclose(np.asarray(data.qvel), md.qvel, atol=1e-9)
