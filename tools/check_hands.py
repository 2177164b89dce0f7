"""Conformance of the imported hand models vs MuJoCo on the same XMLs.

Compares FK, tendon lengths, mass matrix, bias forces, actuation and smooth
qacc (MuJoCo constraints disabled) at random in-range configurations.
"""

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp
import mujoco
import numpy as np

from dexterity_tpu.core import types as T
from dexterity_tpu.mjcf.parser import load_mjcf
from dexterity_tpu.physics import step as tstep

HANDS = {
    'adroit': '/root/reference/dexterity/models/vendor/adroit/adroit_hand_description/mjcf/adroit_hand.xml',
    'shadow': '/root/reference/dexterity/models/vendor/shadow_robot/shadow_hand_description/mjcf/shadow_hand_series_e.xml',
    'mpl_right': '/root/reference/dexterity/models/vendor/mpl/mpl_hand_description/mjcf/mpl_right.xml',
}


def load_mj(path):
  """Loads a vendor XML into MuJoCo 3.x (patching removed attributes)."""
  import os
  import shutil
  import tempfile
  src_dir = os.path.dirname(path)
  tmp = tempfile.mkdtemp()
  mjcf_dir = os.path.join(tmp, 'mjcf')
  os.makedirs(mjcf_dir)
  parent = os.path.dirname(src_dir)
  for entry in os.listdir(parent):
    if entry != 'mjcf':
      os.symlink(os.path.join(parent, entry), os.path.join(tmp, entry))
  for entry in os.listdir(src_dir):
    text = open(os.path.join(src_dir, entry)).read()
    text = __import__("re").sub(r"apirate=\"[^\"]*\"\s*", "", text)
    with open(os.path.join(mjcf_dir, entry), 'w') as f:
      f.write(text)
  return mujoco.MjModel.from_xml_path(
      os.path.join(mjcf_dir, os.path.basename(path)))


def check(name, path, seed=0):
  print(f'== {name} ==')
  mm = load_mj(path)
  mm.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONSTRAINT
  md = mujoco.MjData(mm)

  spec = load_mjcf(path)
  model = spec.compile()
  model = model.replace(opt=model.opt.replace(disable_constraint=True))
  assert model.nq == mm.nq and model.nv == mm.nv and model.nu == mm.nu, (
      model.nq, mm.nq, model.nv, mm.nv, model.nu, mm.nu)

  rng = np.random.RandomState(seed)
  lo, hi = mm.jnt_range[:, 0], mm.jnt_range[:, 1]
  qpos = lo + rng.uniform(0.15, 0.85, mm.nq) * (hi - lo)
  qvel = rng.uniform(-0.5, 0.5, mm.nv)
  ctrl = mm.actuator_ctrlrange[:, 0] + rng.uniform(0, 1, mm.nu) * (
      mm.actuator_ctrlrange[:, 1] - mm.actuator_ctrlrange[:, 0])

  md.qpos[:] = qpos
  md.qvel[:] = qvel
  md.ctrl[:] = ctrl
  mujoco.mj_forward(mm, md)

  data = T.make_data(model, dtype=jnp.float64)
  data = data.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
                      ctrl=jnp.asarray(ctrl))
  data = jax.jit(lambda d: tstep.forward(model, d))(data)

  def cmp(label, mine, theirs, tol):
    mine, theirs = np.asarray(mine), np.asarray(theirs)
    err = np.max(np.abs(mine - theirs)) if mine.size else 0.0
    print(f'  [{"OK " if err < tol else "FAIL"}] {label:20s} {err:.3e}')

  # Body name alignment sanity.
  mj_names = [mm.body(i).name for i in range(mm.nbody)]
  assert list(model.body_names) == mj_names, (model.body_names[:5], mj_names[:5])

  cmp('xpos', data.xpos, md.xpos, 1e-10)
  cmp('xipos', data.xipos, md.xipos, 1e-10)
  if model.nsite:
    cmp('site_xpos', data.site_xpos, md.site_xpos, 1e-10)
  cmp('ten_length', data.ten_length, md.ten_length, 1e-10)
  qm = np.zeros((mm.nv, mm.nv))
  mujoco.mj_fullM(mm, md, qm)
  cmp('qM', data.qM, qm, 1e-10)
  cmp('qfrc_bias', data.qfrc_bias, md.qfrc_bias, 1e-9)
  cmp('actuator_force', data.actuator_force, md.actuator_force, 1e-9)
  cmp('qfrc_actuator', data.qfrc_actuator, md.qfrc_actuator, 1e-9)
  cmp('qfrc_passive', data.qfrc_passive, md.qfrc_passive, 1e-9)
  cmp('qacc (smooth)', data.qacc, md.qacc, 1e-7)

  # Short trajectory with constraints disabled.
  nsteps = 50
  for _ in range(nsteps):
    mujoco.mj_step(mm, md)
  data2 = jax.jit(lambda d: tstep.step_n(model, d, nsteps))(data)
  cmp(f'qpos after {nsteps}', data2.qpos, md.qpos, 1e-8)
  cmp(f'qvel after {nsteps}', data2.qvel, md.qvel, 1e-7)


if __name__ == '__main__':
  for name, path in HANDS.items():
    check(name, path)
