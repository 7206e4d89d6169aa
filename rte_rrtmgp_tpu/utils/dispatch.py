"""Adaptive host-side dispatch windowing.

The TPU worker's execution watchdog kills single device dispatches much
over ~1 minute, so long Monte-Carlo renders are split into host-side
windows (``gpt_per_dispatch`` / ``steps_per_dispatch`` — the analog of the
reference driver's per-g-point kernel launches,
``src_test/Radiation_solver_rt.cu:760``).  Hand-set window sizes either
waste dispatch round-trips (too small) or trip the watchdog (too big);
this module sizes them from a measured window time instead.

Strategy (compile-cost aware: on the tunneled runtime every distinct
window width is a separate 5-7 min program compile, so at most TWO widths
are ever used):

1. run the first windows at a small safe width ``w0`` (the first one pays
   the compile; the second measures the steady-state window time),
2. after the second window, derive the width that fits the target
   dispatch duration and grow ONCE — preferring a width that divides the
   remaining count so no third program is needed,
3. run the rest at the grown width.

Known limitation (root-caused round 5, PERF.md): the drivers'
``--spectral-mode lanes`` vmap-merges a whole spectral window into ONE
photon loop per dispatch; at wide windows (8 g-points, 64x64x256) that
single program reproducibly crashes the TPU worker ("kernel fault"),
with or without windowing — the window bounds the NUMBER of merged steps
per dispatch but a lanes dispatch is itself one monolithic loop.  The
default per-g-point scan under these windows never builds such a
dispatch and is stable (measured through the full tuning sweeps); lanes
is perf-refuted anyway (PERF.md round 3) and remains available only for
narrow windows.
"""

from __future__ import annotations

import os
import time
from typing import Callable

DEFAULT_TARGET_S = 30.0   # half the ~60 s watchdog limit


def target_seconds() -> float:
    return float(os.environ.get("RTE_RRTMGP_DISPATCH_TARGET_S",
                                DEFAULT_TARGET_S))


def run_windowed(total: int,
                 run_window: Callable[[int, int], None],
                 *, w0: int = 2, target_s: float | None = None,
                 max_w: int | None = None) -> list:
    """Cover ``[0, total)`` with adaptive windows.

    ``run_window(start, width)`` must execute the window AND block until
    the device work is done (fetch a scalar — ``block_until_ready`` can
    resolve without a sync on tunneled runtimes).  Returns the list of
    (start, width, seconds) actually run, for logging/tests.
    """
    if target_s is None:
        target_s = target_seconds()
    total = int(total)
    w0 = max(1, min(w0, total))
    log = []
    s, w = 0, w0
    adapted = False
    while s < total:
        w = min(w, total - s)
        t0 = time.perf_counter()
        run_window(s, w)
        dt = time.perf_counter() - t0
        log.append((s, w, dt))
        s += w
        if not adapted and len(log) >= 2 and s < total:
            # Second window at w0 ran without the compile: adapt once.
            t_item = dt / max(w, 1)
            ideal = max(w0, int(target_s / max(t_item, 1e-9)))
            rem = total - s
            w_new = min(ideal, rem)
            if max_w is not None:
                w_new = min(w_new, max_w)
            # Prefer a width dividing the remainder (no third program).
            for cand in range(w_new, w0, -1):
                if rem % cand == 0:
                    w_new = cand
                    break
            else:
                w_new = w0 if rem % w_new else w_new
            if w_new > w0:
                w = w_new
            adapted = True
    return log
