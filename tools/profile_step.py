"""Capture a jax.profiler trace of the full bench step on the TPU and print
the per-op time breakdown (top-k fusions/kernels by self time).

Usage: python tools/profile_step.py [outdir]
"""

import glob
import gzip
import os
import sys
import time
from collections import defaultdict

# The image's protobuf C extension predates the tensorboard profile
# plugin's generated code; the pure-Python parser handles it (same pin as
# profile_rt.py — without it the post-processing step raises
# "Descriptors cannot be created directly" after the trace is captured).
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import numpy as np

sys.path.insert(0, ".")
import __graft_entry__ as ge

OUTDIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxprof"
GPT_CHUNK = os.environ.get("BENCH_GPT_CHUNK", "128")
GPT_CHUNK = int(GPT_CHUNK) if GPT_CHUNK not in ("", "none") else None


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    kd_lw, kd_sw, clut_lw, clut_sw = ge._build(gpt_per_band=16)
    arrs = ge._atmos_arrays(ncol=2048, nlay=72)
    step = ge.make_step(kd_lw, kd_sw, clut_lw, clut_sw, gpt_chunk=GPT_CHUNK)
    names = ("p_lay", "p_lev", "t_lay", "t_lev", "t_sfc", "vmr", "col_dry",
             "emis_sfc", "sfc_alb_dir", "sfc_alb_dif", "tsi_scaling", "mu0",
             "lwp", "iwp", "rel", "dei")
    args = [jax.device_put(arrs[k]) for k in names]
    fn = jax.jit(step)
    out = fn(*args)
    print("warm:", float(np.asarray(out["lw_flux_up"]).ravel()[0]), flush=True)

    with jax.profiler.trace(OUTDIR):
        for it in range(2):
            out = fn(*args)
            args[2] = args[2] + 1e-5 + 0.0 * out["lw_flux_up"][:, :72]
        print("final:", float(out["lw_flux_up"].sum()), flush=True)

    # Parse the trace (trace_viewer json via tensorboard plugin converter).
    summarize(OUTDIR)


def summarize(outdir):
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xplanes = sorted(glob.glob(os.path.join(
        outdir, "**", "*.xplane.pb"), recursive=True), key=os.path.getmtime)
    if not xplanes:
        print("no xplane found under", outdir)
        return
    xp = xplanes[-1]
    params = {"graph_viewer_options": {}}
    try:
        data, _ = rtd.xspace_to_tool_data([xp], "op_profile", params)
    except Exception as e:
        print("op_profile failed:", e)
        data = None
    if data:
        import json

        prof = json.loads(data) if isinstance(data, (str, bytes)) else data
        # op_profile json: byProgram/byCategory tree with self times.
        def walk(node, depth, lines):
            m = node.get("metrics", {})
            t = m.get("time", 0.0)
            if t and depth <= 3:
                lines.append((t, "  " * depth + node.get("name", "?")))
            for ch in node.get("children", []):
                walk(ch, depth + 1, lines)

        root = prof.get("byCategory") or prof.get("byProgram")
        if root:
            lines = []
            walk(root, 0, lines)
            lines.sort(reverse=True)
            for t, name in lines[:40]:
                print(f"{t:8.3f}  {name}")
        else:
            print(list(prof.keys()))


if __name__ == "__main__":
    main()
