"""Test configuration: CPU backend with 8 virtual devices (for sharding
tests) and float64 enabled (oracle comparisons run in double precision)."""

import os

# Force CPU: the session environment presets JAX_PLATFORMS=axon (TPU tunnel),
# which is wrong for unit tests (slow, no float64).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import tempfile

# Isolate the persistent compilation cache per test run: CLI tests call
# config.enable_compilation_cache() in-process, and sharing the user-wide
# cache dir with concurrently running benches/tuners produced a segfault
# inside JAX's cache write (put_executable_and_time) during full-suite
# runs.  A throwaway dir keeps CLI behavior while removing cross-process
# writes to shared entries.
os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="rte_test_jaxcache_")

import jax  # noqa: E402

# sitecustomize.py imports jax at interpreter startup with
# JAX_PLATFORMS=axon already in the environment, so the env var above comes
# too late for this process — override the config directly as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
