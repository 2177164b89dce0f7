"""CI smoke for the batched full-suite benchmark (BASELINE configs[4]):
a small BatchedEnvironment sweep over every registered task with in-graph
metrics must run end-to-end and produce sane numbers."""

import importlib.util
import os

import pytest


def _load_bench_suite():
  path = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), 'scripts', 'bench_suite.py')
  spec = importlib.util.spec_from_file_location('bench_suite', path)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod


@pytest.mark.slow
def test_suite_bench_smoke():
  bench_suite = _load_bench_suite()

  from dexterity_tpu import manipulation

  for name in manipulation.ALL_NAMES:
    r = bench_suite.bench_task(name, batch=4, steps=5, seed=0, shard=False)
    assert r['env_steps_per_s'] > 0
    assert r['metrics']['env_steps'] == 4 * 5 * 2  # warmup + timed run
