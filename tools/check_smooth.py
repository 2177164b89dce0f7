"""Scratch conformance check of smooth dynamics vs MuJoCo.

Builds equivalent models in MuJoCo (XML) and dexterity_tpu (ModelSpec) and
compares FK, cdof, mass matrix, bias forces and multi-step trajectories.
"""

import os

pass

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp
import mujoco
import numpy as np

from dexterity_tpu.core import spec as S
from dexterity_tpu.core import types as T
from dexterity_tpu.physics import step as tstep
from dexterity_tpu.physics import smooth, kinematics


def build_pendulum_spec():
  ms = S.ModelSpec(name='pend')
  ms.option.timestep = 0.002
  b1 = ms.worldbody.add_body('link1', pos=np.array([0.0, 0.1, 0.5]),
                             quat=np.array([0.9689124, 0.2474040, 0, 0]))
  b1.add_joint('j1', type=T.JointType.HINGE, axis=np.array([0.0, 1.0, 0.0]),
               pos=np.array([0.0, 0.0, 0.1]), damping=0.1, armature=0.01)
  b1.inertial = S.InertialSpec(pos=np.array([0.02, 0.0, -0.15]),
                               quat=np.array([0.9689124, 0.2474040, 0.0, 0.0]),
                               mass=1.2, diaginertia=np.array([0.02, 0.015, 0.012]))
  b2 = b1.add_body('link2', pos=np.array([0.0, 0.0, -0.3]),
                   quat=np.array([1.0, 0.0, 0.0, 0.0]))
  b2.add_joint('j2', type=T.JointType.HINGE, axis=np.array([1.0, 0.0, 0.3]),
               pos=np.array([0.01, 0.0, 0.0]), damping=0.05, armature=0.002)
  b2.inertial = S.InertialSpec(pos=np.array([0.0, 0.01, -0.1]),
                               quat=np.array([1.0, 0.0, 0.0, 0.0]),
                               mass=0.4, diaginertia=np.array([0.004, 0.003, 0.002]))
  b2.add_site('tip', pos=np.array([0.0, 0.0, -0.2]))
  # position actuator on j1, general affine on j2
  ms.actuators.append(S.ActuatorSpec.position('a1', 'j1', kp=5.0, kv=0.1,
                                              ctrlrange=(-1.0, 1.0)))
  ms.actuators.append(S.ActuatorSpec(
      name='a2', target='j2', gainprm=(2.0, 0, 0), biastype=T.BiasType.AFFINE,
      biasprm=(0.0, -2.0, -0.05), ctrlrange=(-0.5, 0.5),
      forcerange=(-3.0, 3.0)))
  return ms


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


def build_free_spec():
  ms = S.ModelSpec(name='free')
  ms.option.timestep = 0.002
  b = ms.worldbody.add_body('box', pos=np.array([0.1, 0.2, 1.0]),
                            quat=np.array([0.9689124, 0.2474040, 0.0, 0.0]))
  b.add_joint('free', type=T.JointType.FREE)
  b.inertial = S.InertialSpec(pos=np.array([0.01, 0.02, 0.03]),
                              quat=np.array([0.9689124, 0.0, 0.2474040, 0.0]),
                              mass=0.7, diaginertia=np.array([0.003, 0.0025, 0.002]))
  b.add_geom('g', type=T.GeomType.BOX, size=np.array([0.05, 0.04, 0.03]),
             contype=0, conaffinity=0, mass=0.7)
  return ms


def compare(name, mine, theirs, tol=1e-9):
  mine = np.asarray(mine)
  theirs = np.asarray(theirs)
  err = np.max(np.abs(mine - theirs)) if mine.size else 0.0
  status = 'OK ' if err < tol else 'FAIL'
  print(f'  [{status}] {name:24s} maxerr={err:.3e}')
  return err < tol


def run_case(tag, xml, spec, qpos, qvel, ctrl, nsteps=200):
  print(f'== {tag} ==')
  mm = mujoco.MjModel.from_xml_string(xml)
  md = mujoco.MjData(mm)
  md.qpos[:] = qpos
  md.qvel[:] = qvel
  if mm.nu:
    md.ctrl[:] = ctrl
  mujoco.mj_forward(mm, md)

  model = spec.compile()
  data = T.make_data(model, dtype=jnp.float64)
  data = data.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
                      ctrl=jnp.asarray(ctrl) if model.nu else data.ctrl)
  data = tstep.forward(model, data)

  compare('xpos', data.xpos, md.xpos)
  compare('xquat', np.abs(np.asarray(data.xquat)), np.abs(md.xquat))
  compare('xipos', data.xipos, md.xipos)
  if model.nsite:
    compare('site_xpos', data.site_xpos, md.site_xpos)
  compare('cdof', data.cdof, md.cdof.reshape(model.nv, 6)[:, [0, 1, 2, 3, 4, 5]])
  qm_mj = np.zeros((mm.nv, mm.nv))
  mujoco.mj_fullM(mm, md, qm_mj)
  compare('qM', data.qM, qm_mj)
  compare('qfrc_bias', data.qfrc_bias, md.qfrc_bias)
  compare('cvel', data.cvel, md.cvel)
  if model.nu:
    compare('actuator_force', data.actuator_force, md.actuator_force)
    compare('qfrc_actuator', data.qfrc_actuator, md.qfrc_actuator)
  compare('qacc', data.qacc, md.qacc, tol=1e-8)

  # Trajectory rollout.
  for _ in range(nsteps):
    mujoco.mj_step(mm, md)
  stepj = jax.jit(lambda d: tstep.step_n(model, d, nsteps))
  dataj = stepj(data)
  compare(f'qpos after {nsteps}', dataj.qpos, md.qpos, tol=1e-6)
  compare(f'qvel after {nsteps}', dataj.qvel, md.qvel, tol=1e-6)


if __name__ == '__main__':
  rng = np.random.RandomState(0)
  run_case('double pendulum', PEND_XML, build_pendulum_spec(),
           qpos=np.array([0.3, -0.5]), qvel=np.array([0.7, -1.1]),
           ctrl=np.array([0.4, -0.2]))
  qv = rng.uniform(-1, 1, 6)
  run_case('free body', FREE_XML, build_free_spec(),
           qpos=np.array([0.1, 0.2, 1.0, 0.9689124, 0.2474040, 0, 0]),
           qvel=qv, ctrl=np.zeros(0))

  # cdof convention probe for free joints:
  mm = mujoco.MjModel.from_xml_string(FREE_XML)
  md = mujoco.MjData(mm)
  md.qpos[3:7] = [0.9689124, 0.2474040, 0, 0]
  mujoco.mj_forward(mm, md)
  print('mujoco free cdof:\n', md.cdof.reshape(6, 6))
