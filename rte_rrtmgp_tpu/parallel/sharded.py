"""shard_map execution of the radiation solve.

Columns are embarrassingly parallel (SURVEY §2.9.1: the reference's
column-blocking axis), so each device runs the FULL single-chip pipeline —
including the fused Pallas kernels, which XLA's SPMD partitioner cannot
split across a sharded mesh — on its own column shard.  This is the
TPU-native analog of the reference's per-block host loop
(``src_test/Radiation_solver.cu:716-720``), lifted to the chip level: no
communication happens inside the solve, and outputs concatenate back on
the column axis.

Compare with the annotation path (parallel/mesh.py): that one lets the
partitioner insert collectives (needed when the GPT axis is sharded) but
drops to the pure-XLA kernels.  Use this path for cols-only meshes — it is
the fast one; use the annotation path when sharding the spectrum.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from .. import config

try:  # moved in newer jax
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.shard_map import shard_map

_CACHE: dict = {}


def cols_only(mesh: Mesh) -> bool:
    """True when the mesh shards nothing but the column axis."""
    return all(ax == "cols" or mesh.shape[ax] == 1 for ax in mesh.axis_names)


def sharded_columns_call(mesh: Mesh, jitted_impl, n_replicated: int,
                         args, static_kw: dict):
    """Run ``jitted_impl(*args, **static_kw)`` under shard_map on ``mesh``.

    The first ``n_replicated`` positional args (tables/LUT pytrees)
    replicate; every later arg shards on its leading (column) axis.
    Outputs are column-leading and shard the same way.  Compiled programs
    cache on (impl, mesh, statics, n_args).
    """
    assert cols_only(mesh), \
        "sharded_columns_call needs a cols-only mesh; shard the gpt axis " \
        "via the annotation path (parallel/mesh.py) instead"
    nsh = mesh.shape["cols"]
    ncol = args[n_replicated].shape[0]
    if ncol % nsh:
        raise ValueError(
            f"ncol={ncol} must divide over the {nsh}-way cols mesh axis "
            f"(pad the columns or choose a different mesh)")

    key = (id(jitted_impl), mesh, n_replicated, len(args),
           tuple(sorted(static_kw.items())))
    fn = _CACHE.get(key)
    if fn is None:
        raw = getattr(jitted_impl, "__wrapped__", jitted_impl)

        def body(*a):
            return raw(*a, **static_kw)

        in_specs = tuple([P()] * n_replicated
                         + [P("cols")] * (len(args) - n_replicated))
        fn = jax.jit(shard_map(body, mesh=mesh, in_specs=in_specs,
                               out_specs=P("cols"), check_rep=False))
        _CACHE[key] = fn

    # The per-shard trace happens on the first call: pin the Pallas
    # decision to the single-chip rule (inside a shard the kernels are
    # legal again even though the global device count is > 1).
    with config.pallas_override(config.use_pallas_single_device()):
        return fn(*args)
