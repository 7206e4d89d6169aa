"""Multi-host (multi-process) bootstrap for the radiation pipeline.

The reference is strictly single-node (SURVEY.md par.2.9.5: ``USEMPI``
selects compilers, never calls MPI).  The TPU-native scaling story is
JAX multi-controller SPMD: every process calls
:func:`initialize`, builds ONE global mesh over all devices
(:func:`make_global_mesh`), feeds its process-local column slab through
:func:`host_shard_columns`, and runs the SAME jitted solver — XLA routes
any cross-host collectives (broadband reductions when the spectral axis is
sharded) over ICI within a slice and DCN across slices.

Columns are the zero-communication axis, so the canonical multi-host
layout is columns over hosts ("cols" spans processes) with g-points inside
each host — all solve-time traffic stays on-chip.

Run each process with the same program::

    python tools/multihost_smoke.py --coordinator HOST:PORT \
        --num-processes N --process-id I

(On Cloud TPU pods the three arguments are auto-detected and may be
omitted.)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bootstrap the JAX distributed runtime.

    Arguments default to the RTE_RRTMGP_COORDINATOR / _NUM_PROCESSES /
    _PROCESS_ID environment variables; with everything absent on a
    platform that auto-detects (Cloud TPU), plain
    ``jax.distributed.initialize()`` is used.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "RTE_RRTMGP_COORDINATOR")
    if num_processes is None and "RTE_RRTMGP_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["RTE_RRTMGP_NUM_PROCESSES"])
    if process_id is None and "RTE_RRTMGP_PROCESS_ID" in os.environ:
        process_id = int(os.environ["RTE_RRTMGP_PROCESS_ID"])
    if coordinator_address is None:
        try:
            jax.distributed.initialize()
        except ValueError:
            # No coordinator given and the platform cannot auto-detect one
            # (plain CPU/GPU hosts): run single-process.
            pass
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_global_mesh(shape: Optional[Sequence[int]] = None,
                     axis_names: Sequence[str] = ("cols", "gpt")):
    """Mesh over ALL devices of all processes.

    Default (shape=None): 1-D "cols" mesh — the zero-communication layout.
    Device order follows ``jax.devices()`` (process-major), so a "cols"
    leading axis keeps each host's columns on its own devices.
    """
    from .mesh import make_mesh

    return make_mesh(shape, axis_names, devices=jax.devices())


def host_shard_columns(mesh, tree):
    """Build global column-sharded arrays from process-LOCAL slabs.

    Each process passes the (ncol_local, ...) slab it loaded; the result is
    a global jax.Array of shape (ncol_local * nprocesses_on_cols, ...)
    sharded over the "cols" mesh axis.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(a):
        a = np.asarray(a)
        spec = P("cols", *([None] * (a.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), a)

    return jax.tree.map(put, tree)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()
