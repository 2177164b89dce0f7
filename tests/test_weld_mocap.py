"""Mocap-weld conformance (the juggle task's control mechanism):
a welded free body must track a driven mocap target like MuJoCo does.

Known delta: the weld residual uses the body-frame quaternion log and the
body1 origin as anchor (MuJoCo's anchor/relpose generalization is a
round-2 refinement, ROADMAP.md) — tolerance here is 1e-2, well inside the
BASELINE control-error budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

mujoco = pytest.importorskip('mujoco')

from dexterity_tpu.core import spec as S
from dexterity_tpu.core import types as T
from dexterity_tpu.physics import step as tstep

XML = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body name="target" mocap="true" pos="0 0 0.5"/>
    <body name="box" pos="0 0 0.5">
      <freejoint/>
      <geom type="box" size="0.03 0.025 0.02" mass="0.08" contype="0"
            conaffinity="0"/>
    </body>
  </worldbody>
  <equality>
    <weld body1="target" body2="box" solref="0.02 1"/>
  </equality>
</mujoco>
"""


def _spec():
  ms = S.ModelSpec(name='weld')
  ms.option.timestep = 0.002
  t = ms.worldbody.add_body('target', pos=np.array([0.0, 0.0, 0.5]),
                            mocap=True)
  t.inertial = S.InertialSpec(pos=np.zeros(3), quat=np.array([1.0, 0, 0, 0]),
                              mass=0.0, diaginertia=np.zeros(3))
  b = ms.worldbody.add_body('box', pos=np.array([0.0, 0.0, 0.5]))
  b.add_joint('f', type=T.JointType.FREE)
  b.add_geom('g', type=T.GeomType.BOX, size=np.array([0.03, 0.025, 0.02]),
             mass=0.08, contype=0, conaffinity=0)
  ms.equalities.append(S.EqualitySpec(
      name='w', type=T.EqType.WELD, obj1='target', obj2='box',
      solref=(0.02, 1.0)))
  return ms


def test_weld_tracks_mocap():
  mm = mujoco.MjModel.from_xml_string(XML)
  md = mujoco.MjData(mm)
  model = _spec().compile()
  data = T.make_data(model, dtype=jnp.float64)
  mujoco.mj_forward(mm, md)
  stepj = jax.jit(lambda d: tstep.step(model, d))
  errs = []
  for t in range(300):
    ang = 0.004 * t
    pos = np.array([0.1 * np.sin(ang), 0.05 * np.cos(ang),
                    0.5 + 0.02 * np.sin(2 * ang)])
    quat = np.array([np.cos(ang / 4), 0, 0, np.sin(ang / 4)])
    md.mocap_pos[0] = pos
    md.mocap_quat[0] = quat
    data = data.replace(mocap_pos=jnp.asarray(pos)[None],
                        mocap_quat=jnp.asarray(quat)[None])
    mujoco.mj_step(mm, md)
    data = stepj(data)
    errs.append(np.max(np.abs(np.asarray(data.qpos) - md.qpos)))
  assert max(errs) < 1e-2, max(errs)
  # The box must actually track the target (not just agree with mujoco).
  assert np.linalg.norm(np.asarray(data.qpos[:3]) - md.mocap_pos[0]) < 0.02
