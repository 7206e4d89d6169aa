"""Autotune the radiation step's performance knobs on the live device.

The TPU-native counterpart of the reference's ``tuning_kernels_cuda/``
scripts (per-kernel block-size sweeps with the Python kernel_tuner,
``tuning_kernels_cuda/README.md``): sweeps the spectral chunk size and the
Pallas interpolation kernel's cell-block size on the flagship all-sky
LW+SW step, persists the winner to the tuner cache
(``utils/tuner.py`` -> ``~/.cache/rte_rrtmgp_tpu/tuning.json``), and prints
the table.

Usage: python tuning/tune_radiation.py [ncol] [nlay]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NCOL = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
NLAY = int(sys.argv[2]) if len(sys.argv) > 2 else 72
ITERS = 4


def measure(fn, args, t_lay0):
    """Fetch-synchronized timing with value-varying chained inputs."""
    import jax

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


def main():
    import jax

    import __graft_entry__ as ge
    from rte_rrtmgp_tpu.utils import tuner

    kd_lw, kd_sw, clut_lw, clut_sw = ge._build(gpt_per_band=16)
    arrs = ge._atmos_arrays(ncol=NCOL, nlay=NLAY)
    names = ("p_lay", "p_lev", "t_lay", "t_lev", "t_sfc", "vmr", "col_dry",
             "emis_sfc", "sfc_alb_dir", "sfc_alb_dif", "tsi_scaling", "mu0",
             "lwp", "iwp", "rel", "dei")
    args = [jax.device_put(arrs[k]) for k in names]
    t_lay0 = args[2]

    candidates = []
    for chunk in (64, 128):
        for pallas in (0, 1):
            blocks = (128, 256, 512) if pallas else (0,)
            for blk in blocks:
                candidates.append(
                    {"gpt_chunk": chunk, "pallas": pallas, "block": blk})

    results = []
    for cand in candidates:
        os.environ["RTE_RRTMGP_PALLAS"] = str(cand["pallas"])
        os.environ["RTE_RRTMGP_PALLAS_BLOCK"] = str(cand["block"] or 256)
        step = ge.make_step(kd_lw, kd_sw, clut_lw, clut_sw,
                            gpt_chunk=cand["gpt_chunk"])
        try:
            dt = measure(jax.jit(step), args, t_lay0)
        except Exception as e:
            print(f"{cand}: FAILED ({type(e).__name__})", flush=True)
            continue
        results.append((dt, cand))
        print(f"{cand}: {dt*1e3:8.2f} ms", flush=True)

    results.sort(key=lambda r: r[0])
    best_dt, best = results[0]
    print(f"\nwinner: {best} ({best_dt*1e3:.2f} ms)")

    # Persist through the tuner cache (so other processes can consult it).
    tuner._load_disk()
    with tuner._lock:
        tuner._memory_cache[tuner._key(
            "radiation_step", {"ncol": NCOL, "nlay": NLAY})] = {
            "config": best, "ms": best_dt * 1e3,
            "all": [{"config": c, "ms": d * 1e3} for d, c in results],
        }
        tuner._save_disk()
    print(f"persisted to {tuner._cache_path()}")


if __name__ == "__main__":
    main()
