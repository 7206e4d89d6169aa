"""AOT-compile the bench step and dump the optimized HLO for DMA/copy
forensics (which ops force layout-change copies, which table slices are
step-invariant, ...).

Usage: python tools/dump_hlo.py [out.txt]
Grep targets: 'copy(' / 'copy-start' / transposed layouts like '{0,1:'.
"""

import os
import sys

import jax
import numpy as np

sys.path.insert(0, ".")
import __graft_entry__ as ge

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_hlo.txt"
GPT_CHUNK = os.environ.get("BENCH_GPT_CHUNK", "128")
GPT_CHUNK = int(GPT_CHUNK) if GPT_CHUNK not in ("", "none", "None") else None


def main():
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    _cfg.enable_compilation_cache()
    kd_lw, kd_sw, clut_lw, clut_sw = ge._build(gpt_per_band=16)
    arrs = ge._atmos_arrays(ncol=2048, nlay=72)
    step = ge.make_step(kd_lw, kd_sw, clut_lw, clut_sw, gpt_chunk=GPT_CHUNK)
    names = ("p_lay", "p_lev", "t_lay", "t_lev", "t_sfc", "vmr", "col_dry",
             "emis_sfc", "sfc_alb_dir", "sfc_alb_dif", "tsi_scaling", "mu0",
             "lwp", "iwp", "rel", "dei")
    args = [jax.device_put(arrs[k]) for k in names]
    compiled = jax.jit(step).lower(*args).compile()
    txt = compiled.as_text()
    with open(OUT, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {OUT}")


if __name__ == "__main__":
    main()
