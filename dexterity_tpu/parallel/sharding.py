"""Device-mesh sharding helpers (SURVEY.md §2.8).

The dexterity domain's parallelism is data-parallel batching: environment
batches and MPC rollout populations shard over the mesh's 'batch' axis; XLA
inserts the collectives (all-gathers for global argmax/reductions) over ICI.
Sequence/tensor/pipeline/expert parallelism have no counterpart here — time
is sequential in dynamics (lax.scan within a chip) and the models are small
(SURVEY.md §5 long-context note).

Multi-host: under jax.distributed initialization the same helpers produce a
global mesh; collectives ride ICI within a slice and DCN across hosts.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = 'batch'


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
  """Initializes jax.distributed for multi-host meshes.

  Arguments default to the standard environment variables
  (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
  cluster auto-detection jax.distributed supports on TPU pods).  Safe to
  call in single-process runs: returns False without initializing when no
  coordinator is configured, True once the cluster is up (idempotent).

  Reference parity note: the reference is single-process (SURVEY.md §2.8);
  this is the TPU-native multi-host entry point the sharded planners
  (planners/distributed.py) ride on — after initialization,
  `make_mesh()` sees every chip in the slice and the same shard_map code
  runs collectives over ICI/DCN.
  """
  import os
  coordinator = coordinator_address or os.environ.get(
      'JAX_COORDINATOR_ADDRESS')
  n_proc = num_processes if num_processes is not None else os.environ.get(
      'JAX_NUM_PROCESSES')
  pid = process_id if process_id is not None else os.environ.get(
      'JAX_PROCESS_ID')
  already = getattr(jax._src.distributed.global_state, 'client', None)
  if already is not None:  # pragma: no cover - idempotence guard
    return True
  # Decide from the environment only: jax.distributed.initialize() must
  # run before anything (even jax.default_backend()) initializes the XLA
  # backend, so backend introspection here would break single-chip runs.
  hostnames = os.environ.get('TPU_WORKER_HOSTNAMES', '')
  on_tpu_pod = len([h for h in hostnames.split(',') if h.strip()]) > 1
  if coordinator is None and not on_tpu_pod:
    return False
  kwargs = {}
  if coordinator is not None:
    kwargs = dict(coordinator_address=coordinator,
                  num_processes=int(n_proc), process_id=int(pid))
  try:
    jax.distributed.initialize(**kwargs)
  except RuntimeError as e:  # pragma: no cover - backend already up
    import warnings
    warnings.warn(f'jax.distributed.initialize skipped: {e}')
    return False
  return True


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = BATCH_AXIS) -> Mesh:
  devices = jax.devices()
  n = n_devices or len(devices)
  return Mesh(np.asarray(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
  """Sharding that splits the leading (batch) axis across the mesh."""
  return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = BATCH_AXIS):
  """Device_puts a pytree with its leading axis sharded over the mesh."""
  sharding = batch_sharding(mesh, axis_name)
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
  sharding = replicated(mesh)
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, sharding), tree)
