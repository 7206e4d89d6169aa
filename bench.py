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

# Most recent on-hardware measurement, used VERBATIM (flagged "stale") when
# the device backend is unreachable at bench time — a zero headline on
# backend failure is a reporting bug, not a measurement (VERDICT r3 item 8).
# Update alongside PERF.md whenever the headline bench is re-measured.
LAST_MEASURED = {
    "colgpt_per_s": 2.921e7, "ms_per_step": 33.66, "vs_baseline": 700.4,
    "mc_photons_per_s": 159053, "date": "2026-08-20",
    "note": "round-5 measurements: headline step with wsel + paired "
            "half-slab eta contraction (pairc); MC single-scatter "
            "scoring + fifo respawn at the 64x64x256 flagship domain, "
            "knull (4,4,4) (see PERF.md round 5)",
}


def _probe_backend(timeout_s: int) -> str | None:
    """Initialize the JAX backend in a THROWAWAY subprocess first: a remote
    platform whose tunnel is down blocks ``jax.devices()`` forever and a
    same-process timeout cannot reliably interrupt it.  Returns an error
    string on failure, None when the backend is reachable."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import os, jax\n"
             "if os.environ.get('JAX_PLATFORMS', '').strip().lower() == "
             "'cpu':\n"
             "    jax.config.update('jax_platforms', 'cpu')\n"
             "print(jax.devices()[0].platform)"],
            timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return f"backend init did not complete within {timeout_s}s"
    if r.returncode != 0:
        return (r.stderr or "backend init failed").strip().splitlines()[-1]
    return None


def main():
    import jax

    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    _cfg.enable_compilation_cache()

    err = _probe_backend(int(os.environ.get("BENCH_PROBE_TIMEOUT", "600")))
    if err is not None:
        # Backend down: NEVER emit a zero headline (VERDICT r3 item 8) —
        # report the last on-hardware measurement, flagged stale, so the
        # recorded series stays monotone-meaningful and the failure is
        # still auditable from "error"/"stale".
        print(json.dumps({
            "metric": "all-sky lw+sw two-stream columns*gpoints/s per chip "
                      "(2048x72, 480 gpt, f32) [STALE: last measured]",
            "value": LAST_MEASURED["colgpt_per_s"],
            "unit": "col*gpt/s",
            "vs_baseline": round(LAST_MEASURED["colgpt_per_s"]
                                 / R1_BASELINE_COLGPT_PER_S, 3),
            "stale": True,
            "error": f"device backend unavailable: {err}",
            "last_measured": LAST_MEASURED}))
        raise SystemExit(1)

    import __graft_entry__ as ge

    kd_lw, kd_sw, clut_lw, clut_sw = ge._build(gpt_per_band=16)
    arrs = ge._atmos_arrays(ncol=NCOL, nlay=NLAY)
    tables_as_args = os.environ.get("BENCH_TABLES_ARGS", "0") != "0"
    step = ge.make_step(kd_lw, kd_sw, clut_lw, clut_sw, gpt_chunk=GPT_CHUNK,
                        tables_as_args=tables_as_args)
    names = ("p_lay", "p_lev", "t_lay", "t_lev", "t_sfc", "vmr", "col_dry",
             "emis_sfc", "sfc_alb_dir", "sfc_alb_dif", "tsi_scaling", "mu0",
             "lwp", "iwp", "rel", "dei")
    args = [jax.device_put(arrs[k]) for k in names]
    t_lay_i = names.index("t_lay")
    if tables_as_args:
        args = list(jax.device_put((kd_lw, kd_sw, clut_lw, clut_sw))) + args
        t_lay_i += 4

    fn = jax.jit(step)
    try:
        out = fn(*args)
        warm = float(np.asarray(out["lw_flux_up"]).ravel()[0])  # compile+warm
    except Exception as e:  # noqa: BLE001
        # Safety net for kernel-mode regressions that only surface in the
        # real Mosaic compiler (interpret-mode tests cannot catch them):
        # retry ONCE in a clean process with the newest kernel mode off.
        if os.environ.get("BENCH_CELLW_FALLBACK") is None \
                and os.environ.get("RTE_RRTMGP_PALLAS_CELLW", "1") != "0":
            import sys

            print(f"# cellw path failed ({type(e).__name__}); retrying with "
                  "RTE_RRTMGP_PALLAS_CELLW=0", file=sys.stderr)
            env = dict(os.environ, RTE_RRTMGP_PALLAS_CELLW="0",
                       BENCH_CELLW_FALLBACK="1")
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        raise
    assert np.isfinite(warm)

    # Chain iterations through a value-varying data dependency; sync by
    # fetching a scalar at the end (see module docstring).  Three batches,
    # best taken: the tunneled runtime occasionally injects multi-second
    # stalls unrelated to device time.
    t_lay0 = args[t_lay_i]
    batch_dts = []
    for rep in range(3):
        t0 = time.perf_counter()
        for it in range(ITERS):
            out = fn(*args)
            args[t_lay_i] = (t_lay0 + (rep * ITERS + it + 1) * 1e-5
                             + 0.0 * out["lw_flux_up"][:, :NLAY])
        final = float(out["lw_flux_up"].sum() + out["sw_flux_dn"].sum())
        assert np.isfinite(final), final
        batch_dts.append(time.perf_counter() - t0)
    dt = min(batch_dts)

    ngpt_total = kd_lw.ngpt + kd_sw.ngpt
    colgpt_per_s = NCOL * ngpt_total * ITERS / dt
    ms_per_step = dt / ITERS * 1e3

    rt = _bench_mc_tracer(jax) if os.environ.get("BENCH_RT", "1") != "0" \
        else {}

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
        **rt,
        "platform": jax.devices()[0].platform,
    }))


def _bench_mc_tracer(jax, nx=64, nz=256, ppp=32):
    """Second headline metric (VERDICT r1 item 2): forward Monte-Carlo
    tracer photons/s at the reference's RCEMIP flagship rt workload
    (64x64 columns x 256 layers, rcemip/test_rcemip_input.py; photon grid
    per src_cuda_rt/Raytracer.cu:344-374).  Measured at BOTH knull grids so
    the headline cannot be read as grid-shopping (VERDICT r4 item 4):
    the coarse (4,4,4) sweep winner AND the reference-parity (32,48,48)
    grid (the rcemip input's ngrid convention).  Workload + timing are
    tools/bench_rt.measure_mc — the same traces as the standalone bench,
    so the persistent compilation cache is shared."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from bench_rt import measure_mc

    coarse = measure_mc(nx=nx, nz=nz, ppp=ppp, kn=(4, 4, 4))
    out = {
        "mc_photons_per_s": coarse["value"],
        "mc_ms_per_gpt": coarse["ms_per_gpt"],
        "mc_workload": f"{nx}x{nx}x{nz}, {ppp} ppp, 1 gpt, "
                       "knull (4,4,4), fifo respawn",
    }
    if os.environ.get("BENCH_RT_PARITY", "1") != "0":
        parity = measure_mc(nx=nx, nz=nz, ppp=ppp, kn=(32, 48, 48),
                            iters=2, reps=2)
        out.update(
            mc_photons_per_s_parity_knull=parity["value"],
            mc_parity_workload=f"{nx}x{nx}x{nz}, {ppp} ppp, 1 gpt, "
                               "knull (32,48,48) = the reference rcemip "
                               "ngrid convention, fifo respawn")
    return out


if __name__ == "__main__":
    main()
