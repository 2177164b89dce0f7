"""Profiling / tracing helpers (SURVEY.md §5: jax.profiler annotations +
steps-per-second counters required by the BASELINE metric)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
  """Named region in jax profiler traces (TensorBoard-compatible)."""
  with jax.profiler.TraceAnnotation(name):
    yield


@contextlib.contextmanager
def device_trace(logdir: str):
  """Captures a device trace to `logdir` (open with TensorBoard)."""
  jax.profiler.start_trace(logdir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class Throughput:
  """Steps/solves-per-second counter with warmup exclusion."""

  def __init__(self, warmup: int = 1):
    self._warmup = warmup
    self._count = 0
    self._t0 = None

  def tick(self, n: int = 1) -> None:
    self._count += n
    if self._count >= self._warmup and self._t0 is None:
      self._t0 = time.time()
      self._base = self._count

  @property
  def per_second(self) -> Optional[float]:
    if self._t0 is None or self._count <= self._base:
      return None
    return (self._count - self._base) / (time.time() - self._t0)


def assert_finite(tree, name: str = 'state'):
  """Host-side NaN/Inf check for debugging (pair with
  jax.config.update('jax_debug_nans', True) for in-graph detection)."""
  import numpy as np
  for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
    arr = np.asarray(leaf)
    if arr.dtype.kind == 'f' and not np.all(np.isfinite(arr)):
      raise FloatingPointError(f'non-finite values in {name}{path}')
