"""Global precision / numerics configuration.

The reference (rte-rrtmgp-cpp) compiles either FP64 (default) or FP32
(``USESP``, ``include/types.h:13-28``). On TPU the production path is FP32;
FP64 is available for validation against the NumPy oracle (tests enable
``jax.config.update("jax_enable_x64", True)`` on CPU).

All precision-dependent guard constants of the reference are reproduced here
as functions of dtype:

* ``k_min`` — floor on the two-stream diffusion eigenvalue k**2
  (``src_kernels_cuda/rte_solver_kernels.cu:11-13``: 1e-12 FP64 / 1e-4 FP32).
* ``eps`` / ``tiny`` — machine epsilon / smallest normal, used for
  singularity guards (tau thresholds, ssa division guards).
"""

from __future__ import annotations

import os

import numpy as np

# Default compute dtype for the framework.  Overridable via env for A/B runs.
_DTYPE_NAMES = {"float32": np.float32, "float64": np.float64}
FLOAT = _DTYPE_NAMES[os.environ.get("RTE_RRTMGP_TPU_FLOAT", "float32")]


def eps(dtype=None) -> float:
    return float(np.finfo(np.dtype(dtype or FLOAT)).eps)


def tiny(dtype=None) -> float:
    return float(np.finfo(np.dtype(dtype or FLOAT)).tiny)


def k_min(dtype=None) -> float:
    """Floor for (gamma1-gamma2)*(gamma1+gamma2) in the SW two-stream solver."""
    return 1.0e-12 if np.dtype(dtype or FLOAT) == np.float64 else 1.0e-4


def tau_thres(dtype=None) -> float:
    """Small-tau switch point of the LW linear-in-tau source: eps**(1/4)."""
    return float(np.sqrt(np.sqrt(eps(dtype))))


# Physical constants (match the reference, src/Gas_optics_rrtmgp.cpp:764-792).
GRAV = 9.80665          # m s-2
AVOGADRO = 6.02214076e23
M_DRY = 0.028964        # kg mol-1
M_H2O = 0.018016        # kg mol-1

# Solar variability composition offsets (src/Gas_optics_rrtmgp.cpp:748-749).
SOLAR_A_OFFSET = 0.1495954
SOLAR_B_OFFSET = 0.00066696

# Surface Planck-source Jacobian temperature perturbation
# (src_kernels_cuda/gas_optics_rrtmgp_kernels_launchers.cu:474).
DELTA_TSURF = 1.0


def respect_platform_env(force_cpu: bool = False) -> None:
    """Make ``JAX_PLATFORMS=cpu`` actually stick: site plugins may force a
    remote platform into ``jax_platforms`` regardless of the env var, and a
    remote platform whose endpoint is unreachable blocks the first
    ``jax.devices()`` forever.  Called by the CLIs/bench/tools before any
    backend init; no-op when the env var is unset unless ``force_cpu``
    (used by callers that know they target host devices, e.g. the
    virtual-device multichip dryrun)."""
    env = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if force_cpu or env == "cpu":
        try:
            import jax

            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass


def enable_compilation_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at ``path`` (default
    ``/tmp/jaxcache``, override via ``JAX_COMPILATION_CACHE_DIR``).

    On the tunneled TPU runtime a cold full-step compile takes 5-7 min;
    the cache (keyed client-side on HLO) brings same-program re-runs to
    ~1 s.  Called by the CLIs, bench, and tuning entry points; safe to
    call repeatedly and harmless on CPU (JAX only persists compilations
    above its min-compile-time threshold).  The default is per-user (a
    fixed world-shared /tmp name would let another local user pre-own the
    directory and serve poisoned executables, or silently break writes)."""
    import jax

    cache_dir = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "rte_rrtmgp_tpu", "jaxcache"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception as e:  # surface, don't hide, a dead cache
        import sys

        print(f"rte_rrtmgp_tpu: compilation cache at {cache_dir} "
              f"unavailable ({e}); compiles will not persist",
              file=sys.stderr)


_PALLAS_OVERRIDE = None


def pallas_override(value):
    """Context manager pinning :func:`use_pallas` during a trace.

    The shard_map execution path (parallel/sharded.py) traces the
    single-chip pipeline once per shard context; inside a shard the Pallas
    kernels are legal again even though the GLOBAL device count is > 1, so
    the wrapper re-enables them for the trace."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        global _PALLAS_OVERRIDE
        old = _PALLAS_OVERRIDE
        _PALLAS_OVERRIDE = value
        try:
            yield
        finally:
            _PALLAS_OVERRIDE = old

    return _ctx()


def use_pallas_single_device() -> bool:
    """The single-chip Pallas decision (env > backend), ignoring the
    device count — what a per-shard program should use."""
    env = os.environ.get("RTE_RRTMGP_PALLAS")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def use_pallas() -> bool:
    """Whether to dispatch hot gas-optics interpolation to the Pallas TPU
    kernels (ops/pallas/).  Default: on for single-chip TPU execution;
    force with RTE_RRTMGP_PALLAS=1/0.

    Multi-device runs default to the pure-XLA path: a pallas_call is a
    custom call the SPMD partitioner cannot split over a sharded mesh.
    The shard_map execution path (parallel/sharded.py) re-enables the
    kernels per shard via :func:`pallas_override`."""
    if _PALLAS_OVERRIDE is not None:
        return _PALLAS_OVERRIDE
    env = os.environ.get("RTE_RRTMGP_PALLAS")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        import jax

        return (jax.default_backend() == "tpu"
                and jax.device_count() == 1)
    except Exception:
        return False
