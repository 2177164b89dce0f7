"""Pytree dataclass helper.

`@pytree_dataclass` registers a frozen dataclass with JAX so array fields are
traced leaves while fields declared with `static_field()` are hashable
aux-data (compile-time constants: counts, index tuples, names).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


def static_field(**kwargs) -> Any:
  """Marks a dataclass field as static (hashable aux data, not a leaf)."""
  metadata = dict(kwargs.pop('metadata', {}) or {})
  metadata['static'] = True
  return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls):
  """Decorator: frozen dataclass registered as a JAX pytree."""
  cls = dataclasses.dataclass(frozen=True)(cls)
  data_fields = []
  meta_fields = []
  for f in dataclasses.fields(cls):
    if f.metadata.get('static', False):
      meta_fields.append(f.name)
    else:
      data_fields.append(f.name)
  jax.tree_util.register_dataclass(
      cls, data_fields=data_fields, meta_fields=meta_fields)

  def replace(self, **updates):
    return dataclasses.replace(self, **updates)

  cls.replace = replace
  return cls
