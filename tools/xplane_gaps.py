"""Device-timeline GAP analysis of a jax.profiler trace.

The category/top-k views (xplane_categories.py / xplane_summary.py) sum op
self-times; the headline step's missing milliseconds are the COMPLEMENT —
spans where no op executes on the compute core.  This tool merges all op
intervals on the TPU ops line into a coverage union and prints the largest
gaps, each labeled with the op that ENDS before it and the op that STARTS
after it — i.e. exactly which producer/consumer pair exposes the hole.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python tools/xplane_gaps.py /tmp/jaxprof [topk] [min_gap_us]
"""

import glob
import os
import sys


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main(outdir, topk=30, min_gap_us=20.0):
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
        for line in plane.lines:
            print(f"  line {line.name!r}: {len(line.events)} events, "
                  f"busy {sum(e.duration_ps for e in line.events)/1e9:.3f} ms")
        # Module windows: restrict the gap analysis to WITHIN the longest
        # module's executions (the step program) — everything between
        # dispatches is host/tunnel time, not a device hole.
        mod_line = next((l for l in plane.lines if l.name == "XLA Modules"),
                        None)
        windows = None
        if mod_line is not None:
            durs = {}
            for e in mod_line.events:
                name = ev_meta.get(e.metadata_id, "?")
                durs.setdefault(name, []).append(
                    (e.offset_ps, e.offset_ps + e.duration_ps))
            for name, spans in sorted(durs.items()):
                tot = sum(e - s for s, e in spans)
                print(f"  module {name.split('(')[0]:40s} x{len(spans)} "
                      f"total {tot/1e9:.3f} ms")
            name, windows = max(
                durs.items(),
                key=lambda kv: max(e - s for s, e in kv[1]))
            print(f"  -> analyzing within {len(windows)} executions of "
                  f"{name.split('(')[0]}")
        for line in plane.lines:
            if len(line.events) <= 10 or "async" in line.name.lower() \
                    or "module" in line.name.lower():
                continue
            _analyze(plane, line, ev_meta, topk, min_gap_us, windows)
        break


def _analyze(plane, line, ev_meta, topk, min_gap_us, windows=None):
    if True:
        all_evs = sorted(
            ((e.offset_ps, e.offset_ps + e.duration_ps,
              ev_meta.get(e.metadata_id, "?")) for e in line.events),
            key=lambda t: t[0])
        print(f"plane {plane.name!r} line {line.name!r}: "
              f"{len(all_evs)} ops")
        if windows is None:
            windows = [(all_evs[0][0], all_evs[-1][1])]
        gaps = []
        busy = span = 0.0
        for w0, w1 in windows:
            evs = [ev for ev in all_evs if ev[0] >= w0 and ev[1] <= w1]
            if not evs:
                continue
            span += evs[-1][1] - evs[0][0]
            cover_end = evs[0][0]
            prev_name = "(start)"
            for s, e, name in evs:
                if s > cover_end:
                    gaps.append((s - cover_end, cover_end, prev_name, name))
                if e > cover_end:
                    busy += e - max(s, cover_end)
                    cover_end = e
                    prev_name = name
        n_w = len(windows)
        print(f"  {n_w} windows: span {span/1e9:.3f} ms  "
              f"busy {busy/1e9:.3f} ms  gaps {(span-busy)/1e9:.3f} ms "
              f"({(span-busy)/max(span,1)*100:.1f}%)  "
              f"per-window span {span/1e9/n_w:.3f} busy {busy/1e9/n_w:.3f} "
              f"gap {(span-busy)/1e9/n_w:.3f} ms")
        # Per-op busy top-k ON THIS LINE within the windows (self times of
        # the synchronous schedule — async lines excluded by the caller).
        from collections import defaultdict
        per_op = defaultdict(float)
        per_n = defaultdict(int)
        for w0, w1 in windows:
            for s, e, name in all_evs:
                if s >= w0 and e <= w1:
                    per_op[name.split(" = ")[0][:70]] += e - s
                    per_n[name.split(" = ")[0][:70]] += 1
        print(f"\n  top ops by self time on this line (ms per window):")
        for name, tot in sorted(per_op.items(), key=lambda kv: -kv[1])[:topk]:
            print(f"   {tot/1e9/n_w:8.3f} ms x{per_n[name]//n_w:4d}  {name}")
        gaps.sort(reverse=True)
        shown = agg = 0
        from collections import defaultdict
        pair_tot = defaultdict(float)
        pair_n = defaultdict(int)
        for g, off, a, b in gaps:
            pair = (a.split(".")[0][:60], b.split(".")[0][:60])
            pair_tot[pair] += g
            pair_n[pair] += 1
        print(f"\n  top gap PAIRS (total ms, count): ")
        for pair, tot in sorted(pair_tot.items(), key=lambda kv: -kv[1])[:topk]:
            if tot / 1e9 < min_gap_us / 1e3:
                break
            print(f"   {tot/1e9:8.3f} ms x{pair_n[pair]:4d}  "
                  f"{pair[0]} -> {pair[1]}")
        print(f"\n  top single gaps:")
        for g, off, a, b in gaps[:topk]:
            if g / 1e6 < min_gap_us:
                break
            print(f"   {g/1e6:9.1f} us  after {a[:70]}")
            print(f"                 before {b[:70]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof",
         int(sys.argv[2]) if len(sys.argv) > 2 else 30,
         float(sys.argv[3]) if len(sys.argv) > 3 else 20.0)
