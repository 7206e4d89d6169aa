"""Device-mesh sharding for the radiation pipeline.

The reference has **no** multi-device backend (SURVEY.md par.2.9: column
blocking + CUDA kernels only; `USEMPI` selects compilers, never calls MPI).
The TPU-native scaling design instead annotates shardings and lets XLA's
SPMD partitioner insert collectives:

* **columns** ("cols" axis) are embarrassingly parallel — every field with a
  leading ncol axis shards there with zero communication in the solve;
* **g-points** ("gpt" axis) shard the spectral tables (`kmajor` et al. have
  ngpt leading) and all (ncol, nlay, ngpt) intermediates; the broadband
  reductions then lower to an all-reduce over the gpt axis, which XLA
  derives from the sharding annotations — no hand-written collectives.

Use `make_mesh((ncols_shards, ngpt_shards))` and the helpers below to place
`KDist` tables and atmosphere fields; then call the normal jitted solvers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("cols", "gpt"),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    shape=None -> all devices on the "cols" axis (the zero-communication
    axis).  shape=(a, b) -> a*b devices over ("cols", "gpt").
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
        axis_names = (axis_names[0],)
    arr = np.array(devices[: int(np.prod(shape))]).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def column_spec(mesh: Mesh, ndim: int) -> NamedSharding:
    """Sharding for an array with columns leading: (ncol, ...)."""
    return NamedSharding(mesh, P("cols", *([None] * (ndim - 1))))


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def shard_atmosphere(mesh: Mesh, tree):
    """Place every array in a pytree with its leading axis on "cols"."""
    def put(a):
        return jax.device_put(a, column_spec(mesh, np.ndim(a)))
    return jax.tree.map(put, tree)


def shard_kdist(kd, mesh: Mesh):
    """Place k-distribution tables: spectral (ngpt-leading) tables shard on
    the "gpt" mesh axis when present; everything else replicates.

    With a gpt axis of size 1 (or absent) this is pure replication.
    """
    has_gpt = "gpt" in mesh.axis_names and mesh.shape["gpt"] > 1
    ngpt = kd.ngpt

    def place(a):
        if a is None:
            return None
        if has_gpt and a.ndim >= 1 and a.shape[0] == ngpt:
            spec = P("gpt", *([None] * (a.ndim - 1)))
        elif has_gpt and a.ndim >= 2 and a.shape[1] == ngpt:  # krayl (2, ngpt, ...)
            spec = P(None, "gpt", *([None] * (a.ndim - 2)))
        else:
            spec = P()
        return jax.device_put(a, NamedSharding(mesh, spec))

    # Only data fields are arrays; meta fields pass through untouched.
    data = {}
    for f in dataclasses.fields(kd):
        v = getattr(kd, f.name)
        data[f.name] = place(v) if hasattr(v, "ndim") else v
    return dataclasses.replace(kd, **data)
