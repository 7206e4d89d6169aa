"""Autotune the radiation step's performance knobs on the live device.

The TPU-native counterpart of the reference's ``tuning_kernels_cuda/``
scripts (per-kernel block-size sweeps with the Python kernel_tuner,
``tuning_kernels_cuda/README.md``): sweeps the spectral chunk size and the
Pallas interpolation kernel's cell-block size on the flagship all-sky
LW+SW step, persists the winner to the tuner cache
(``utils/tuner.py`` -> ``~/.cache/rte_rrtmgp_tpu/tuning.json``), and prints
the table.

Each candidate runs in its OWN subprocess with RTE_RRTMGP_PALLAS /
RTE_RRTMGP_PALLAS_BLOCK set before import: those knobs are read at trace
time inside jitted impls whose caches key only on avals/static args, so
flipping env vars in-process would silently reuse the first-traced
executable and time identical programs.

Usage: python tuning/tune_radiation.py [ncol] [nlay]
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

NCOL = int(os.environ.get("TUNE_NCOL", "2048"))
NLAY = int(os.environ.get("TUNE_NLAY", "72"))
ITERS = 4


def measure(fn, args, t_lay0):
    """Fetch-synchronized timing with value-varying chained inputs."""
    args = list(args)
    out = fn(*args)
    warm = float(np.asarray(out["lw_flux_up"]).ravel()[0])
    assert np.isfinite(warm)
    t0 = time.perf_counter()
    for it in range(ITERS):
        out = fn(*args)
        args[2] = t_lay0 + (it + 1) * 1e-5 + 0.0 * out["lw_flux_up"][:, :NLAY]
    float(out["lw_flux_up"].sum())
    return (time.perf_counter() - t0) / ITERS


def run_candidate(cand):
    """Time one candidate in this process (env already applied by parent)."""
    import jax

    import __graft_entry__ as ge

    kd_lw, kd_sw, clut_lw, clut_sw = ge._build(gpt_per_band=16)
    arrs = ge._atmos_arrays(ncol=NCOL, nlay=NLAY)
    names = ("p_lay", "p_lev", "t_lay", "t_lev", "t_sfc", "vmr", "col_dry",
             "emis_sfc", "sfc_alb_dir", "sfc_alb_dif", "tsi_scaling", "mu0",
             "lwp", "iwp", "rel", "dei")
    args = [jax.device_put(arrs[k]) for k in names]
    t_lay0 = args[2]
    step = ge.make_step(kd_lw, kd_sw, clut_lw, clut_sw,
                        gpt_chunk=cand["gpt_chunk"])
    # Best of 2 measurement batches (tunnel stalls are uncorrelated).
    return min(measure(jax.jit(step), args, t_lay0) for _ in range(2))


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    _cfg.enable_compilation_cache()
    from rte_rrtmgp_tpu.utils import tuner

    if os.environ.get("TUNE_CANDS"):
        # Explicit candidate list (JSON) — targeted A/Bs without editing
        # the sweep, e.g. TUNE_CANDS='[{"gpt_chunk":128,"pallas":1,...}]'.
        return _run_and_persist(json.loads(os.environ["TUNE_CANDS"]), tuner)

    if os.environ.get("TUNE_QUICK"):
        # Reduced sweep for shapes whose per-candidate compile runs tens
        # of minutes (the 4096x256 RCEMIP shape): current default winner,
        # the wsel variant, and the layer-major interchange (whose
        # depth-blind solvers are designed for exactly these shapes).
        candidates = [
            {"gpt_chunk": 128, "pallas": 1, "block": 256, "unroll": 8,
             "cellw": 1},
            {"gpt_chunk": 128, "pallas": 1, "block": 256, "unroll": 8,
             "cellw": 1, "wsel": 1},
            {"gpt_chunk": 128, "pallas": 1, "block": 256, "unroll": 8,
             "cellw": 1, "wsel": 1, "pairc": 1},
            {"gpt_chunk": 128, "pallas": 1, "block": 256, "unroll": 8,
             "cellw": 1, "layermajor": 1},
        ]
        return _run_and_persist(candidates, tuner)

    candidates = [{"gpt_chunk": 128, "pallas": 0, "block": 0, "unroll": 0},
                  {"gpt_chunk": 64, "pallas": 1, "block": 256, "unroll": 4,
                   "cellw": 1}]
    for chunk in (128, 256):
        for unroll in (4, 8):
            for cellw in (0, 1):
                candidates.append({"gpt_chunk": chunk, "pallas": 1,
                                   "block": 256, "unroll": unroll,
                                   "cellw": cellw})
    # cellw with the minor pass split back out (merge A/B).
    candidates.append({"gpt_chunk": 128, "pallas": 1, "block": 256,
                       "unroll": 8, "cellw": 1, "merge_minor": 0})
    # Block/unroll extremes for the hoisted whole-block resolve (one
    # resolve matmul per block: larger blocks amortize it further).
    candidates += [
        {"gpt_chunk": 128, "pallas": 1, "block": 512, "unroll": 8,
         "cellw": 1},
        {"gpt_chunk": 128, "pallas": 1, "block": 128, "unroll": 8,
         "cellw": 1},
        {"gpt_chunk": 128, "pallas": 1, "block": 256, "unroll": 16,
         "cellw": 1},
    ]
    # Layer-major interchange + layer-grid solvers (round 5) and the
    # select-form eta weight build — winners persist per shape and are
    # consulted by gas_optics.layer_major_enabled() / kernel_opts().
    candidates += [
        {"gpt_chunk": 128, "pallas": 1, "block": 256, "unroll": 8,
         "cellw": 1, "layermajor": 1},
        {"gpt_chunk": 128, "pallas": 1, "block": 256, "unroll": 8,
         "cellw": 1, "layermajor": 1, "wsel": 1},
        {"gpt_chunk": 128, "pallas": 1, "block": 256, "unroll": 8,
         "cellw": 1, "wsel": 1},
        # Half-slab paired eta contraction (round 5, pairc_enabled()).
        {"gpt_chunk": 128, "pallas": 1, "block": 256, "unroll": 8,
         "cellw": 1, "wsel": 1, "pairc": 1},
        # + lane-merged kmajor|planck dup2 pair (dup2c_enabled()).
        {"gpt_chunk": 128, "pallas": 1, "block": 256, "unroll": 8,
         "cellw": 1, "wsel": 1, "pairc": 1, "dup2c": 1},
        # + in-kernel minor fold (mfold_enabled()).
        {"gpt_chunk": 128, "pallas": 1, "block": 256, "unroll": 8,
         "cellw": 1, "wsel": 1, "pairc": 1, "mfold": 1},
    ]

    return _run_and_persist(candidates, tuner)


def _run_and_persist(candidates, tuner):
    results = []
    for cand in candidates:
        env = dict(os.environ)
        env["RTE_RRTMGP_PALLAS"] = str(cand["pallas"])
        env["RTE_RRTMGP_PALLAS_BLOCK"] = str(cand["block"] or 256)
        env["RTE_RRTMGP_PALLAS_UNROLL"] = str(cand.get("unroll") or 4)
        env["RTE_RRTMGP_PALLAS_CELLW"] = str(cand.get("cellw", 1))
        env["RTE_RRTMGP_PALLAS_MERGE_MINOR"] = str(
            cand.get("merge_minor", 1))
        env["RTE_RRTMGP_LAYERMAJOR"] = str(cand.get("layermajor", 0))
        env["RTE_RRTMGP_PALLAS_WSEL"] = str(cand.get("wsel", 0))
        env["RTE_RRTMGP_PALLAS_PAIRC"] = str(cand.get("pairc", 0))
        env["RTE_RRTMGP_PALLAS_DUP2C"] = str(cand.get("dup2c", 0))
        env["RTE_RRTMGP_PALLAS_MFOLD"] = str(cand.get("mfold", 0))
        env["TUNE_NCOL"], env["TUNE_NLAY"] = str(NCOL), str(NLAY)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 json.dumps(cand)],
                env=env, capture_output=True, text=True,
                timeout=int(os.environ.get("TUNE_TIMEOUT", "1500")),
                cwd=_REPO)
        except subprocess.TimeoutExpired:
            print(f"{cand}: FAILED (timeout)", flush=True)
            continue
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("RESULT ")), None)
        if proc.returncode != 0 or line is None:
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
            print(f"{cand}: FAILED ({' | '.join(tail)})", flush=True)
            continue
        dt = float(line.split()[1])
        results.append((dt, cand))
        print(f"{cand}: {dt*1e3:8.2f} ms", flush=True)

    if not results:
        print("no candidate succeeded")
        sys.exit(1)
    results.sort(key=lambda r: r[0])
    best_dt, best = results[0]
    print(f"\nwinner: {best} ({best_dt*1e3:.2f} ms)")

    # Persist through the tuner cache (so other processes can consult it).
    entry = {
        "config": best, "ms": best_dt * 1e3,
        "all": [{"config": c, "ms": d * 1e3} for d, c in results],
    }
    key = tuner._key("radiation_step", {"ncol": NCOL, "nlay": NLAY})
    tuner._load_disk()
    with tuner._lock:
        tuner._memory_cache[key] = entry
        tuner._save_disk()
    print(f"persisted to {tuner._cache_path()}")

    # Also refresh the checked-in winners table (the analog of the
    # reference's persisted rte_rrtmgp_kernel_tuning.txt,
    # include/tuner.h:27-37) so cold environments start at the tuned point.
    import platform as _platform

    import jax
    defaults_path = tuner._repo_defaults_path()
    try:
        with open(defaults_path) as f:
            defaults = json.load(f)
    except (OSError, ValueError):
        defaults = {}
    defaults[key] = dict(entry, platform=jax.devices()[0].platform,
                         host=_platform.machine())
    with open(defaults_path, "w") as f:
        json.dump(defaults, f, indent=1, sort_keys=True)
    print(f"persisted to {defaults_path}")


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        print(f"RESULT {run_candidate(json.loads(sys.argv[2]))}")
    else:
        if len(sys.argv) > 1:
            NCOL = int(sys.argv[1])
        if len(sys.argv) > 2:
            NLAY = int(sys.argv[2])
        main()
