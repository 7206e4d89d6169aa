"""Cross-platform / cross-precision validation — the analog of the
reference's GPU-vs-CPU check (``rcemip/compare.py``).

Runs the allsky case three ways and compares fluxes:
  1. CPU float64 (oracle-grade XLA path)
  2. CPU float32 (XLA row-gather path)
  3. current default backend float32 (Pallas path on TPU)

History of the platform gate:
  * Round 2 (2026-08-17) measured TPU f32 vs CPU f32 bit-identical and
    gated at 1e-4.
  * Round 5 (2026-08-20) found a TPU-vs-CPU divergence of up to
    0.55 W m-2 that reproduces with EVERY repo knob disabled
    (RTE_RRTMGP_PALLAS=0, CELLW=0, WSEL=0 all give the same diffs) — so
    it is the XLA backends' transcendental codegen (exp/div rounding in
    fused loops differs between the CPU emitter and the TPU compiler,
    plausibly shifted by a toolchain update since round 2), not our
    kernels.  The gate is therefore physical, not bitwise: the platform
    difference must stay well inside the intrinsic f32-vs-f64 error
    (measured ~1.4 W m-2 on this case) — threshold 0.7 W m-2 absolute.
  * f32 vs true f64 (intrinsic single-precision error): LW <= 0.54 W m-2;
    SW <= 1.45 W m-2 — the quantified USESP-mode error the reference
    never measured.

Usage: python tools/crosscheck.py [workdir]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(workdir):
    from rte_rrtmgp_tpu import config as _cfg
    _cfg.respect_platform_env()
    from rte_rrtmgp_tpu.cases.check import compare

    os.makedirs(workdir, exist_ok=True)
    env_base = dict(os.environ)
    env_base["PYTHONPATH"] = REPO + os.pathsep + env_base.get("PYTHONPATH", "")

    def cli(args, platform=None):
        env = dict(env_base)
        if platform:
            env["JAX_PLATFORMS"] = platform
        subprocess.run(
            [sys.executable, "-m", "rte_rrtmgp_tpu.cli", *args],
            cwd=workdir, env=env, check=True, capture_output=True)

    subprocess.run(
        [sys.executable, "-m", "rte_rrtmgp_tpu.cases.inputs", "allsky",
         "--gpt-per-band", "8"],
        cwd=workdir, env=env_base, check=True, capture_output=True)

    common = ["--cloud-optics", "--delta-cloud", "--gpt-chunk", "64"]
    print("running CPU float64 ...", flush=True)
    cli(common + ["--precision", "float64", "--output", "cpu_f64.nc"],
        platform="cpu")
    print("running CPU float32 ...", flush=True)
    cli(common + ["--precision", "float32", "--output", "cpu_f32.nc"],
        platform="cpu")
    print("running default backend float32 ...", flush=True)
    cli(common + ["--precision", "float32", "--output", "dev_f32.nc"])

    p = lambda n: os.path.join(workdir, n)
    print("\n--- device f32 vs CPU f32 (platform/kernel divergence) ---")
    ok_dev = compare(p("dev_f32.nc"), p("cpu_f32.nc"),
                     failure_threshold=0.7)
    print("\n--- CPU f32 vs CPU f64 (intrinsic single-precision error, "
          "informational) ---")
    compare(p("cpu_f32.nc"), p("cpu_f64.nc"), failure_threshold=2.0)

    # Aerosol leg (aerosky case): exercises the rh-classed one-hot aerosol
    # lookup across platforms too.
    aero_dir = os.path.join(workdir, "aerosky")
    os.makedirs(aero_dir, exist_ok=True)
    subprocess.run(
        [sys.executable, "-m", "rte_rrtmgp_tpu.cases.inputs", "aerosky",
         "--gpt-per-band", "8"],
        cwd=aero_dir, env=env_base, check=True, capture_output=True)
    acommon = common + ["--aerosol-optics", "--delta-aerosol"]
    pa = lambda n: os.path.join(aero_dir, n)

    def cli_a(args, platform=None):
        env = dict(env_base)
        if platform:
            env["JAX_PLATFORMS"] = platform
        subprocess.run(
            [sys.executable, "-m", "rte_rrtmgp_tpu.cli", *args],
            cwd=aero_dir, env=env, check=True, capture_output=True)

    print("\nrunning aerosky CPU float32 ...", flush=True)
    cli_a(acommon + ["--precision", "float32", "--output", "cpu_f32.nc"],
          platform="cpu")
    print("running aerosky default backend float32 ...", flush=True)
    cli_a(acommon + ["--precision", "float32", "--output", "dev_f32.nc"])
    print("\n--- aerosky: device f32 vs CPU f32 ---")
    ok_aero = compare(pa("dev_f32.nc"), pa("cpu_f32.nc"),
                      failure_threshold=0.7)

    ok = ok_dev and ok_aero
    print("\nPLATFORM CHECK:", "PASSED" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(run(sys.argv[1] if len(sys.argv) > 1 else "/tmp/rte_crosscheck"))
