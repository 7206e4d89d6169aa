"""2-process multi-controller smoke test (SURVEY par.2.9.5 DCN story).

Spawns two OS processes that bootstrap jax.distributed over localhost,
build one global CPU mesh (4 virtual devices per process), column-shard
their local atmosphere slabs into global arrays, and run the flagship
LW+SW step.  Checks both processes agree and match a single-process run of
the same global problem.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE = os.path.join(REPO, "tools", "multihost_smoke.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_column_sharded_step():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_NUM_PROCESSES", None)
    # A preloaded TPU plugin (sitecustomize) initializes the PJRT backend
    # at interpreter startup, which makes a later
    # jax.distributed.initialize a silent no-op — drop its trigger.
    env.pop("PALLAS_AXON_POOL_IPS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, SMOKE, "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]
    results = {}
    for so, _ in outs:
        line = next(ln for ln in so.splitlines() if ln.startswith("RESULT"))
        _, pid, lw, sw = line.split()
        results[int(pid)] = (float(lw), float(sw))
    assert set(results) == {0, 1}
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)

    # Single-process ground truth of the same 64-column global problem.
    single = subprocess.run(
        [sys.executable, SMOKE, "--ncol-per-process", "64"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert single.returncode == 0, single.stderr[-2000:]
    line = next(ln for ln in single.stdout.splitlines()
                if ln.startswith("RESULT"))
    _, _, lw1, sw1 = line.split()
    np.testing.assert_allclose(results[0], (float(lw1), float(sw1)),
                               rtol=2e-5)
