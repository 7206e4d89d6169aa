"""One-time generator for the frozen golden flux fixtures.

Usage:  JAX_PLATFORMS=cpu python tests/make_goldens.py

Writes tests/goldens/fluxes_f64.nc via the native CDF-2 codec.  Run ONLY
when intentionally re-baselining (and say so in the commit message) —
CI never regenerates these; that is the whole point (see golden_case.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import golden_case  # noqa: E402
from rte_rrtmgp_tpu.utils.native import NativeNcWriter  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "goldens", "fluxes_f64.nc")


def main():
    out = golden_case.solve_case()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with NativeNcWriter(OUT) as w:
        for name, arr in sorted(out.items()):
            w.write(name, arr, ("col", "lev"),
                    attrs={"units": "W m-2"})
    print(f"wrote {OUT} ({len(out)} variables)")
    for name, arr in sorted(out.items()):
        print(f"  {name:24s} mean={arr.mean():10.4f} max={arr.max():10.4f}")


if __name__ == "__main__":
    main()
