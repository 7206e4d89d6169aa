#!/bin/bash
# Measurement queue for the optimizations implemented while the TPU tunnel
# was unavailable (2026-08-17; see PERF.md "awaiting on-hardware numbers").
# Run each block separately on the real chip; do NOT run concurrently with
# other device work (stray dispatches contaminate timings badly).
#
# Probe first:  timeout 90 python -c "import jax; jax.devices()"  (143 = down)
set -x

# 1) Headline step after one-hot LUT rewrites (expect < 45.4 ms/step).
BENCH_RT=0 timeout 1800 python -u bench.py

# 2) Tables-as-jit-arguments A/B (also compare compile wall time cold).
BENCH_RT=0 BENCH_TABLES_ARGS=1 timeout 1800 python -u bench.py

# 3) bw renderer: spectral lanes vs scan (expect lanes to win while the
#    per-step loop is iteration-latency-bound at sub-32k rays).
BENCH_BW_SPECTRAL=scan  timeout 1800 python -u tools/bench_bw.py
BENCH_BW_SPECTRAL=lanes timeout 1800 python -u tools/bench_bw.py
BENCH_BW_SPECTRAL=lanes BENCH_BW_SPD=14 timeout 1800 python -u tools/bench_bw.py

# 4) Cross-platform re-validation (now includes the aerosky one-hot leg).
timeout 3600 python -u tools/crosscheck.py

# 5) Step HLO copy forensics (layout-change copies behind the ~9 ms
#    exposed-DMA row of the trace decomposition).
timeout 1800 python -u tools/dump_hlo.py /tmp/step_hlo_tpu.txt
grep -c "copy(" /tmp/step_hlo_tpu.txt
grep -o "copy([^)]*" /tmp/step_hlo_tpu.txt | sort | uniq -c | sort -rn | head

# 6) Device-side stage decomposition after the changes.
timeout 1800 python -u tools/profile_step.py
