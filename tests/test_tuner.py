"""Autotuner (utils/tuner.py) unit tests."""

import os

import numpy as np
import pytest

from rte_rrtmgp_tpu.utils import tuner


@pytest.fixture
def isolated_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("RTE_RRTMGP_TUNER_CACHE", str(tmp_path / "tune.json"))
    monkeypatch.delenv("RTE_RRTMGP_TUNER_DISABLE", raising=False)
    # reset module state
    tuner._memory_cache.clear()
    tuner._disk_loaded = False
    yield
    tuner._memory_cache.clear()
    tuner._disk_loaded = False


def test_picks_fastest_and_caches(isolated_cache):
    import time

    calls = []

    def build(cand):
        def fn(x):
            calls.append(cand["delay"])
            time.sleep(cand["delay"])
            return x

        return fn

    cands = [{"delay": 0.003}, {"delay": 0.0}, {"delay": 0.002}]
    best = tuner.autotune("k", cands, build, (np.zeros(2),), iters=2, )
    assert best == {"delay": 0.0}

    # Second call must hit the cache (no new measurements).
    n = len(calls)
    best2 = tuner.autotune("k", cands, build, (np.zeros(2),), iters=2)
    assert best2 == best
    assert len(calls) == n


def test_cache_persists_to_disk(isolated_cache):
    def build(cand):
        return lambda x: x * cand["m"]

    cands = [{"m": 1}, {"m": 2}]
    best = tuner.autotune("persist", cands, build, (np.ones(4),), iters=1)

    # Fresh in-memory state: must come back from disk.
    tuner._memory_cache.clear()
    tuner._disk_loaded = False
    again = tuner.autotune(
        "persist", cands, lambda c: (_ for _ in ()).throw(AssertionError),
        (np.ones(4),))
    assert again == best


def test_failing_candidates_skipped(isolated_cache):
    def build(cand):
        if cand["bad"]:
            raise ValueError("unbuildable")
        return lambda x: x

    best = tuner.autotune(
        "skip", [{"bad": True}, {"bad": False}], build, (np.zeros(1),), iters=1)
    assert best == {"bad": False}


def test_all_fail_raises(isolated_cache):
    with pytest.raises(RuntimeError):
        tuner.autotune("allfail", [{"a": 1}],
                       lambda c: (_ for _ in ()).throw(ValueError),
                       (np.zeros(1),))


def test_disable_env(isolated_cache, monkeypatch):
    monkeypatch.setenv("RTE_RRTMGP_TUNER_DISABLE", "1")
    best = tuner.autotune(
        "disabled", [{"first": True}, {"first": False}],
        lambda c: (_ for _ in ()).throw(AssertionError), (np.zeros(1),))
    assert best == {"first": True}


def test_checked_in_winners_resolve_per_workload(isolated_cache, monkeypatch):
    """The committed tuning/tuned_defaults.json winners must resolve
    through best_workload_opts for their device kind — this is the wiring
    that makes cold environments start at the tuned point (kernel_opts,
    raytracer respawn 'auto', bw_render 'auto')."""
    monkeypatch.setattr(tuner, "_device_kind", lambda: "tpu:TPU v5 lite")
    step = tuner.best_workload_opts("radiation_step")
    assert step is not None and step.get("pallas") == 1
    rt = tuner.best_workload_opts("rt_trace")
    assert rt is not None and rt.get("respawn_mode") in ("fifo", "arith",
                                                         "pool")
    bw = tuner.best_workload_opts("bw_render")
    assert bw is not None and bw.get("respawn_mode") in ("fifo", "pool")
    # Unknown workloads and foreign device kinds resolve to None (the
    # callers' fixed defaults then apply — CPU test determinism).
    assert tuner.best_workload_opts("nonexistent_workload") is None
    monkeypatch.setattr(tuner, "_device_kind", lambda: "cpu:host")
    assert tuner.best_workload_opts("rt_trace") is None


def test_respawn_auto_resolution(isolated_cache, monkeypatch):
    """trace_rays' 'auto' respawn: env > tuner winner > 'fifo'."""
    from rte_rrtmgp_tpu.models.raytracer import _resolve_respawn_mode

    assert _resolve_respawn_mode("arith") == "arith"   # explicit wins
    monkeypatch.setenv("RTE_RRTMGP_RT_RESPAWN", "pool")
    assert _resolve_respawn_mode("auto") == "pool"     # env beats tuner
    monkeypatch.delenv("RTE_RRTMGP_RT_RESPAWN")
    monkeypatch.setattr(tuner, "_device_kind", lambda: "tpu:TPU v5 lite")
    assert _resolve_respawn_mode("auto") == \
        tuner.best_workload_opts("rt_trace")["respawn_mode"]
    monkeypatch.setattr(tuner, "_device_kind", lambda: "cpu:host")
    assert _resolve_respawn_mode("auto") == "fifo"     # fixed default
