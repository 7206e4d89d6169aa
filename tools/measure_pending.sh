#!/bin/bash
# Round-3 measurement queue: every optimization implemented while the TPU
# tunnel was down, in priority order.  Run each block separately on the
# real chip; do NOT run concurrently with other device work (stray
# dispatches contaminate timings badly — see PERF.md).
#
# Probe first:  timeout 90 python -c "import jax; jax.devices()"  (143 = down)
set -x

# 1) Headline step: cellw (in-kernel weight-plane resolves, NEW default)
#    vs the legacy plane-fed kernels, plus the still-unmeasured r2 one-hot
#    LUT rewrites.  Expect cellw to cut the 15.5 ms fusion block + ~9 ms
#    exposed DMA (target < 25 ms/step, VERDICT r2 item 2).
BENCH_RT=0 timeout 1800 python -u bench.py
BENCH_RT=0 RTE_RRTMGP_PALLAS_CELLW=0 timeout 1800 python -u bench.py
BENCH_RT=0 RTE_RRTMGP_PALLAS_MERGE_MINOR=0 timeout 1800 python -u bench.py

# 2) Tables-as-jit-arguments A/B (r2 carry-over; also compare cold compile).
BENCH_RT=0 BENCH_TABLES_ARGS=1 timeout 1800 python -u bench.py

# 3) Reference flagship vertical extent: 64x64 cols x 256 layers through
#    the de-capped fused solvers (VERDICT r2 item 3).  Record ms/step at
#    the true RCEMIP shape.
BENCH_RT=0 BENCH_NCOL=4096 BENCH_NLAY=256 timeout 2400 python -u bench.py
BENCH_RT=0 BENCH_NCOL=4096 BENCH_NLAY=256 RTE_RRTMGP_PALLAS_CELLW=0 \
    timeout 2400 python -u bench.py

# 4) MC forward tracer: scan vs lanes at the reference 64x64x256 domain
#    (VERDICT r2 item 4 — target >= 1M photons/s, was 78k).  The new
#    photons_per_lane default already holds >= 32k lanes in flight (the
#    latency knee recorded in PERF.md).  Also A/B the RNG: threefry is a
#    large share of the step body (13 x n_lanes draws/iter); rbg is the
#    hardware generator.
BENCH_RT_MODE=scan  timeout 1800 python -u tools/bench_rt.py 64 256 32 2
BENCH_RT_MODE=lanes timeout 1800 python -u tools/bench_rt.py 64 256 32 2
BENCH_RT_MODE=lanes timeout 1800 python -u tools/bench_rt.py 64 256 32 8
BENCH_RT_MODE=lanes timeout 1800 python -u tools/bench_rt.py 64 64 32 8
BENCH_RT_MODE=lanes BENCH_RT_RNG=rbg timeout 1800 \
    python -u tools/bench_rt.py 64 256 32 8

# 5) bw renderer at 256x256 px (VERDICT r2 item 5 — target >= 10x the
#    6.6k rays/s measured at 64x64): scan vs lanes.
BENCH_BW_SPECTRAL=scan  timeout 2400 python -u tools/bench_bw.py 256 8
BENCH_BW_SPECTRAL=lanes timeout 2400 python -u tools/bench_bw.py 256 8

# 6) Fresh autotune sweep (now includes the cellw knob) + refresh
#    tuning/tuned_defaults.json (VERDICT r2 item 6).
timeout 5400 python -u tuning/tune_radiation.py

# 7) Cross-platform re-validation.
timeout 3600 python -u tools/crosscheck.py

# 8) Step HLO copy forensics + device-side stage decomposition after the
#    cellw switch (expect the weight-plane fusion block gone).
timeout 1800 python -u tools/dump_hlo.py /tmp/step_hlo_tpu.txt
grep -c "copy(" /tmp/step_hlo_tpu.txt
timeout 1800 python -u tools/profile_step.py

# 9) Multi-chip note: single real chip only — the shard_map execution path
#    (Pallas kernels per column shard) is validated on the virtual mesh:
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    timeout 1200 python -u tools/scaling_bench.py --platform cpu \
    --devices 1 2 4 8 --ncol-per-device 64 --nlay 24 --gpt-per-band 4 \
    --mode shardmap
