"""Output comparison — equivalent of the reference's validation scripts
(``allsky/allsky_check.py:27-80`` and rrtmgp's compare-to-reference.py):
per-variable max-abs and percent differences with a failure threshold,
plus NaN checks."""

from __future__ import annotations

import sys

import numpy as np

from ..utils.ncio import NcReader

DEFAULT_VARS = ("lw_flux_up", "lw_flux_dn", "lw_flux_net",
                "sw_flux_up", "sw_flux_dn", "sw_flux_dn_dir", "sw_flux_net")


def compare(test_path: str, ref_path: str, variables=None,
            failure_threshold: float = 5.8e-2, verbose: bool = True) -> bool:
    """Return True when every shared variable matches within the threshold
    (max abs diff in W m-2 — the reference CI gate, rfmip/check_rfmip.sh:4-5)."""
    ok = True
    with NcReader(test_path) as t, NcReader(ref_path) as r:
        names = variables or [v for v in DEFAULT_VARS if t.has(v) and r.has(v)]
        for name in names:
            if not (t.has(name) and r.has(name)):
                if verbose:
                    print(f"{name}: MISSING in one file")
                ok = False
                continue
            a = np.asarray(t.read(name), dtype=np.float64)
            b = np.asarray(r.read(name), dtype=np.float64)
            if a.shape != b.shape:
                print(f"{name}: shape mismatch {a.shape} vs {b.shape}")
                ok = False
                continue
            if np.isnan(a).any() or np.isnan(b).any():
                print(f"{name}: contains NaN")
                ok = False
                continue
            diff = np.abs(a - b)
            maxdiff = diff.max()
            denom = np.maximum(np.abs(b), 1e-30)
            maxpct = (diff / denom).max() * 100.0
            status = "PASS" if maxdiff <= failure_threshold else "FAIL"
            if verbose:
                print(f"{name}: max abs diff {maxdiff:.3e} W m-2 "
                      f"(max {maxpct:.4f}%) [{status}]")
            ok &= maxdiff <= failure_threshold
    return ok


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="Compare radiation outputs")
    p.add_argument("test_file")
    p.add_argument("ref_file")
    p.add_argument("--failure-threshold", type=float, default=5.8e-2)
    p.add_argument("--variables", nargs="*", default=None)
    args = p.parse_args(argv)
    ok = compare(args.test_file, args.ref_file, args.variables,
                 args.failure_threshold)
    print("PASSED" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
