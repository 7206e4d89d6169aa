"""Category-aggregated view of a jax.profiler trace: total self time per op
class (pallas custom-calls, XLA fusions, copies/slices/DMA, convolutions,
everything else), plus the capture's wall span — shows how much of the step
is kernel compute vs data movement at a glance.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python tools/xplane_categories.py /tmp/jaxprof [n_steps]

``n_steps`` (default 2) divides the totals so the numbers read as ms/step.
Async copy/slice durations overlap compute, so their sum is an upper bound
on exposed DMA, not serial time.
"""

import glob
import os
import sys
from collections import defaultdict


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def classify(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "interp" in n or "pallas" in n \
            or "sweep" in n or "2stream" in n:
        return "pallas custom-calls"
    if "copy-start" in n or "copy-done" in n or "copy." in n \
            or n.startswith("%copy"):
        return "copies"
    if "slice-start" in n or "slice-done" in n or "dynamic-slice" in n \
            or "dynamic-update-slice" in n:
        return "slices"
    if "fusion" in n:
        return "fusions"
    if "convolution" in n or "dot" in n:
        return "matmuls"
    return "other"


def main(outdir, n_steps=2):
    paths = sorted(glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane under", outdir)
        return
    xs = load_xspace(paths[-1])
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        cats = defaultdict(float)
        span_lo, span_hi = None, None
        for line in plane.lines:
            lname = line.name.lower()
            if "xla op" not in lname and "xla ops" not in lname:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                cats[classify(name)] += dur
                t0 = ev.offset_ps
                t1 = ev.offset_ps + ev.duration_ps
                span_lo = t0 if span_lo is None else min(span_lo, t0)
                span_hi = t1 if span_hi is None else max(span_hi, t1)
        if not cats:
            continue
        span_ms = (span_hi - span_lo) / 1e9 if span_lo is not None else 0.0
        print(f"=== {plane.name}: capture span {span_ms / n_steps:.2f} "
              f"ms/step over {n_steps} steps ===")
        for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"{ms / n_steps:9.2f} ms/step  {cat}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof",
         int(sys.argv[2]) if len(sys.argv) > 2 else 2)
