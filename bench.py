"""Headline benchmark: columns x g-points / s per chip, all-sky LW+SW solve.

Workload: RCEMIP-like — 2048 columns x 72 layers, full spectral resolution
(256 LW + 224 SW g-points), float32, clouds on, one chip.  The metric
denominator follows BASELINE.md ("columns x g-points/s per chip for the
lw+sw two-stream solve").

Timing methodology (important on tunneled/async runtimes where
``block_until_ready`` can resolve without a device sync, and where identical
dispatches may be deduplicated): every iteration feeds a *value-varying*
input that data-depends on the previous iteration's output, and the clock
stops only after fetching a scalar from the final output to the host.

The reference repo publishes no numbers and its CPU build cannot run in this
image (empty Fortran/data submodules), so ``vs_baseline`` is reported
against our recorded first working round-1 result.

Prints exactly one JSON line.
"""

import json
import os
import time

import numpy as np

NCOL = int(os.environ.get("BENCH_NCOL", 2048))
NLAY = int(os.environ.get("BENCH_NLAY", 72))
ITERS = int(os.environ.get("BENCH_ITERS", 10))
GPT_CHUNK = os.environ.get("BENCH_GPT_CHUNK", "128")
GPT_CHUNK = int(GPT_CHUNK) if GPT_CHUNK not in ("", "none", "None") else None

# Throughput of the first round-1 build measured with *correct* (fetch-
# synchronized) timing on the single v5e chip (2026-08-16): the pure-XLA
# element-gather path ran the 2048x72 all-sky lw+sw step in 23.6 s
# = 4.17e4 col*gpt/s.  That is the fixed baseline for vs_baseline.
#
# The same build had earlier been recorded at 8.19e6 col*gpt/s (120 ms/step)
# using `block_until_ready`-based timing; on this tunneled runtime that call
# resolves WITHOUT a device sync and identical dispatches are deduplicated,
# so that number measured dispatch overhead, not the solve.  Both constants
# are kept and reported so the correction is auditable from the output.
R1_BASELINE_COLGPT_PER_S = 4.17e4            # fetch-synchronized (current)
R1_BASELINE_OLD_METHOD_COLGPT_PER_S = 8.19e6  # block_until_ready (invalid)


def main():
    import jax

    import __graft_entry__ as ge

    kd_lw, kd_sw, clut_lw, clut_sw = ge._build(gpt_per_band=16)
    arrs = ge._atmos_arrays(ncol=NCOL, nlay=NLAY)
    step = ge.make_step(kd_lw, kd_sw, clut_lw, clut_sw, gpt_chunk=GPT_CHUNK)
    names = ("p_lay", "p_lev", "t_lay", "t_lev", "t_sfc", "vmr", "col_dry",
             "emis_sfc", "sfc_alb_dir", "sfc_alb_dif", "tsi_scaling", "mu0",
             "lwp", "iwp", "rel", "dei")
    args = [jax.device_put(arrs[k]) for k in names]

    fn = jax.jit(step)
    out = fn(*args)
    warm = float(np.asarray(out["lw_flux_up"]).ravel()[0])  # compile+warmup
    assert np.isfinite(warm)

    # Chain iterations through a value-varying data dependency; sync by
    # fetching a scalar at the end (see module docstring).  Three batches,
    # best taken: the tunneled runtime occasionally injects multi-second
    # stalls unrelated to device time.
    t_lay0 = args[2]
    batch_dts = []
    for rep in range(3):
        t0 = time.perf_counter()
        for it in range(ITERS):
            out = fn(*args)
            args[2] = (t_lay0 + (rep * ITERS + it + 1) * 1e-5
                       + 0.0 * out["lw_flux_up"][:, :NLAY])
        final = float(out["lw_flux_up"].sum() + out["sw_flux_dn"].sum())
        assert np.isfinite(final), final
        batch_dts.append(time.perf_counter() - t0)
    dt = min(batch_dts)

    ngpt_total = kd_lw.ngpt + kd_sw.ngpt
    colgpt_per_s = NCOL * ngpt_total * ITERS / dt
    ms_per_step = dt / ITERS * 1e3

    baseline = R1_BASELINE_COLGPT_PER_S or colgpt_per_s
    print(json.dumps({
        "metric": "all-sky lw+sw two-stream columns*gpoints/s per chip "
                  f"({NCOL}x{NLAY}, {ngpt_total} gpt, f32)",
        "value": round(colgpt_per_s, 1),
        "unit": "col*gpt/s",
        "vs_baseline": round(colgpt_per_s / baseline, 3),
        "baselines": {
            "r1_fetch_synced_colgpt_per_s": R1_BASELINE_COLGPT_PER_S,
            "r1_block_until_ready_colgpt_per_s":
                R1_BASELINE_OLD_METHOD_COLGPT_PER_S,
            "note": "vs_baseline uses the fetch-synced value; the "
                    "block_until_ready number is a dedup artifact "
                    "(see module docstring)",
        },
        "ms_per_step": round(ms_per_step, 2),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
