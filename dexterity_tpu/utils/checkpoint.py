"""Checkpoint / resume (SURVEY.md §5).

Environment, planner and physics state are pytrees of arrays, so
checkpointing is an array dump: `save`/`load` write a flat .npz with the
tree structure stored alongside.  Orbax is available in the image for
multi-host async checkpointing; this light-weight path has no extra
dependencies and is enough for the suite's state (the reference has no
checkpointing at all — its nearest artifact is the MJCF export,
scripts/export_task.py).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def save(path: str, tree: Any) -> None:
  """Saves a pytree of arrays to `<path>.npz` (+ treedef json)."""
  leaves, treedef = jax.tree_util.tree_flatten(tree)
  arrays = {f'leaf_{i}': np.asarray(leaf) for i, leaf in enumerate(leaves)}
  np.savez_compressed(path if path.endswith('.npz') else path + '.npz',
                      **arrays)
  with open(_treedef_path(path), 'w') as f:
    json.dump({'treedef': str(treedef), 'num_leaves': len(leaves)}, f)


def load(path: str, like: Any) -> Any:
  """Loads a pytree saved by `save`, using `like` for the tree structure."""
  npz = np.load(path if path.endswith('.npz') else path + '.npz')
  leaves_like, treedef = jax.tree_util.tree_flatten(like)
  n = len(leaves_like)
  loaded = [npz[f'leaf_{i}'] for i in range(n)]
  import jax.numpy as jnp
  loaded = [jnp.asarray(a) for a in loaded]
  return jax.tree_util.tree_unflatten(treedef, loaded)


def _treedef_path(path: str) -> str:
  base = path[:-4] if path.endswith('.npz') else path
  return base + '.treedef.json'
