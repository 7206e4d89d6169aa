"""Standalone xplane.pb parser: per-op self-time summary of a jax.profiler
trace (no tensorboard plugin needed — walks the XSpace proto directly).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python tools/xplane_summary.py /tmp/jaxprof [topk]
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


def summarize(outdir, topk=40):
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
        totals = defaultdict(float)
        counts = defaultdict(int)
        plane_total = 0.0
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry the per-op breakdown; step lines duplicate.
            if "xla op" in lname or "xla ops" in lname:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e9  # ms
                    totals[name] += dur
                    counts[name] += 1
                    plane_total += dur
        if not totals:
            continue
        print(f"=== plane: {plane.name}  (sum of op time {plane_total:.1f} ms"
              f" over the capture) ===")
        rows = sorted(totals.items(), key=lambda kv: -kv[1])
        for name, ms in rows[:topk]:
            print(f"{ms:9.2f} ms  x{counts[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof"
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    summarize(outdir, topk)
