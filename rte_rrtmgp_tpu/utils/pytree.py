"""Dataclass-as-pytree helper.

``@pytree_dataclass`` registers a frozen dataclass with JAX so that array
fields are traced leaves while fields annotated in ``meta_fields`` are static
auxiliary data (hashable; participate in jit cache keys).  This is how the
reference's C++ classes (tables + metadata) become functional JAX values.
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields: tuple = ()):
    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta_fields)
        )
        return c

    return wrap(cls) if cls is not None else wrap


def static_tuple(arr) -> tuple:
    """Convert a small integer array to nested tuples (hashable static meta)."""
    import numpy as np

    a = np.asarray(arr)
    if a.ndim == 0:
        return a.item()
    if a.ndim == 1:
        return tuple(a.tolist())
    return tuple(static_tuple(x) for x in a)
