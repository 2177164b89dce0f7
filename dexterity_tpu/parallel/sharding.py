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
