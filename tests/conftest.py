"""Test configuration: CPU backend with 8 virtual devices (for sharding
tests) and float64 enabled (oracle comparisons run in double precision)."""

import os

# Force CPU: the session environment presets JAX_PLATFORMS=axon (TPU tunnel),
# which is wrong for unit tests (slow, no float64).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# sitecustomize.py imports jax at interpreter startup with
# JAX_PLATFORMS=axon already in the environment, so the env var above comes
# too late for this process — override the config directly as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Disable the persistent compilation cache for the whole test process:
# once a CLI test calls config.enable_compilation_cache() in-process,
# later compiles write the cache, and serializing one of the suite's
# executables segfaults inside JAX's put_executable_and_time (reproduced
# with an isolated throwaway cache dir, so it is the serialization
# itself, not cross-process contention).  Tests recompile in ~seconds on
# CPU; nothing is lost.
jax.config.update("jax_enable_compilation_cache", False)

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The full suite compiles hundreds of programs; with them all held
    live, the CPU XLA compile of the largest Monte-Carlo while_loops
    (~150 tests in) segfaults inside backend_compile_and_load —
    reproducibly at the same suite position, never standalone.  Dropping
    the executable caches between modules keeps the process footprint
    flat; modules recompile their own programs in seconds on CPU."""
    yield
    jax.clear_caches()
