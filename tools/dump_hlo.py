"""Dump optimized HLO for the planner-fidelity substep scan; print the
ops named on the trace hot list with their shapes."""
import os, re, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, jax.tree_util as jtu
os.makedirs('/tmp/dexterity_tpu_jax_cache', exist_ok=True)
jax.config.update('jax_compilation_cache_dir', '/tmp/dexterity_tpu_jax_cache')

def main():
  from dexterity_tpu import manipulation
  from dexterity_tpu.core.types import make_data
  from dexterity_tpu.physics import step as phys_step
  B = int(os.environ.get('BENCH_SAMPLES', '512'))
  K = int(os.environ.get('SCAN_STEPS', '20'))
  task = manipulation.build_task('reorient', 'state_dense')
  env = manipulation._environment.GoalEnvironment(task)
  model = task.compile()
  opt = model.opt
  opt = opt.replace(solver_iterations=int(os.environ.get('SOLVER_ITS', '2')),
                    ls_iterations=int(os.environ.get('LS_ITS', '3')))
  model = model.replace(opt=opt)
  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
  src = state.data
  d = make_data(model, dtype=src.qpos.dtype)
  d = d.replace(qpos=src.qpos, qvel=src.qvel, ctrl=src.ctrl,
                mocap_pos=src.mocap_pos, mocap_quat=src.mocap_quat)
  d = phys_step.forward(model, d)
  bdata = jtu.tree_map(
      lambda x: jnp.broadcast_to(x[None], (B,) + x.shape).copy(), d)

  def rollout(data):
    def body(dd, _):
      dd = phys_step.step_hot(model, dd)
      return dd.replace(qpos=dd.qpos + 1e-30 * dd.qacc[0]), ()
    out, _ = jax.lax.scan(body, data, (), length=K)
    return out

  lowered = jax.jit(jax.vmap(rollout)).lower(bdata)
  compiled = lowered.compile()
  txt = compiled.as_text()
  open('/tmp/substep_hlo.txt', 'w').write(txt)
  names = os.environ.get('OPS', '').split(',')
  for nm in names:
    if not nm: continue
    for line in txt.splitlines():
      if f'%{nm} ' in line or f'{nm} =' in line:
        print(line.strip()[:450]); print()
        break

if __name__ == '__main__':
  main()
