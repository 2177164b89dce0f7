"""Conformance of the constraint solver vs MuJoCo.

Scenes: bouncing/sliding/rolling ball on a plane, hinge with limits +
frictionloss, capsule pair.  Compares forward qacc and multi-step
trajectories.
"""

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp
import mujoco
import numpy as np

from dexterity_tpu.core import spec as S
from dexterity_tpu.core import types as T
from dexterity_tpu.physics import step as tstep

BALL_XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="1 1 0.1" friction="0.6 0.008 0.001"/>
    <body name="ball" pos="0 0 0.1">
      <freejoint/>
      <geom name="b" type="sphere" size="0.05" mass="0.1"
            friction="0.6 0.008 0.001" condim="6"/>
    </body>
  </worldbody>
</mujoco>
"""


def ball_spec():
  ms = S.ModelSpec(name='ball')
  ms.option.timestep = 0.002
  ms.worldbody.add_geom('floor', type=T.GeomType.PLANE,
                        size=np.array([1.0, 1.0, 0.1]),
                        friction=(0.6, 0.008, 0.001))
  b = ms.worldbody.add_body('ball', pos=np.array([0.0, 0.0, 0.1]))
  b.add_joint('f', type=T.JointType.FREE)
  b.add_geom('b', type=T.GeomType.SPHERE, size=np.array([0.05, 0, 0]),
             mass=0.1, friction=(0.6, 0.008, 0.001), condim=6)
  return ms


HINGE_XML = """
<mujoco>
  <option timestep="0.002"/>
  <compiler angle="radian"/>
  <worldbody>
    <body name="l" pos="0 0 1">
      <inertial pos="0.1 0 0" mass="0.5" diaginertia="0.01 0.01 0.004"/>
      <joint name="h" axis="0 1 0" range="-1.0 1.0" limited="true"
             frictionloss="0.15" margin="0.01" damping="0.03" armature="0.002"/>
      <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.02" contype="0"
            conaffinity="0" mass="0"/>
    </body>
  </worldbody>
  <actuator>
    <position name="a" joint="h" kp="3" ctrlrange="-1.2 1.2" ctrllimited="true"/>
  </actuator>
</mujoco>
"""


def hinge_spec():
  ms = S.ModelSpec(name='hinge')
  ms.option.timestep = 0.002
  b = ms.worldbody.add_body('l', pos=np.array([0.0, 0.0, 1.0]))
  b.inertial = S.InertialSpec(pos=np.array([0.1, 0.0, 0.0]),
                              quat=np.array([1.0, 0, 0, 0]), mass=0.5,
                              diaginertia=np.array([0.01, 0.01, 0.004]))
  b.add_joint('h', type=T.JointType.HINGE, axis=np.array([0.0, 1.0, 0.0]),
              range=(-1.0, 1.0), limited=True, frictionloss=0.15,
              margin=0.01, damping=0.03, armature=0.002)
  ms.actuators.append(S.ActuatorSpec.position('a', 'h', kp=3.0,
                                              ctrlrange=(-1.2, 1.2)))
  return ms


def run(tag, xml, spec, qpos, qvel, ctrl, nsteps=400):
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
  data = data.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
  if model.nu:
    data = data.replace(ctrl=jnp.asarray(ctrl))
  fdata = jax.jit(lambda d: tstep.forward(model, d))(data)

  def cmp(label, mine, theirs, tol):
    mine, theirs = np.asarray(mine), np.asarray(theirs)
    err = np.max(np.abs(mine - theirs)) if mine.size else 0.0
    print(f'  [{"OK " if err < tol else "FAIL"}] {label:22s} {err:.3e}')

  cmp('qacc t=0', fdata.qacc, md.qacc, 1e-6)
  cmp('qfrc_constraint t=0', fdata.qfrc_constraint, md.qfrc_constraint, 1e-6)

  traj_mj = []
  for _ in range(nsteps):
    mujoco.mj_step(mm, md)
    traj_mj.append(md.qpos.copy())
  stepj = jax.jit(lambda d: tstep.step(model, d))
  d = data
  errs = []
  for t in range(nsteps):
    d = stepj(d)
    errs.append(np.max(np.abs(np.asarray(d.qpos) - traj_mj[t])))
  errs = np.asarray(errs)
  print(f'  traj qpos err: t100={errs[min(99,nsteps-1)]:.3e} '
        f'tend={errs[-1]:.3e} max={errs.max():.3e}')
  return errs


if __name__ == '__main__':
  # ball dropped with spin + slide
  run('ball drop/slide/roll', BALL_XML, ball_spec(),
      qpos=np.array([0, 0, 0.1, 1, 0, 0, 0]),
      qvel=np.array([0.5, 0.1, 0.0, 0.0, 3.0, 1.0]),
      ctrl=np.zeros(0))
  # hinge swinging into the limit
  run('hinge limit+friction', HINGE_XML, hinge_spec(),
      qpos=np.array([0.0]), qvel=np.array([3.0]), ctrl=np.array([1.2]))
