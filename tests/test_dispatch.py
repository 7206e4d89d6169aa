"""Adaptive dispatch-window sizing (utils/dispatch.run_windowed)."""

import numpy as np

from rte_rrtmgp_tpu.utils.dispatch import run_windowed


def test_covers_total_exactly():
    seen = []
    log = run_windowed(17, lambda s, w: seen.append((s, w)), w0=2,
                       target_s=1e9)
    starts = [s for s, w in seen]
    widths = [w for s, w in seen]
    assert starts[0] == 0
    assert sum(widths) == 17
    for (s0, w0_), s1 in zip(seen, starts[1:]):
        assert s1 == s0 + w0_
    assert log == [(s, w, t) for (s, w), (_, _, t) in zip(seen, log)]


def test_grows_once_toward_target():
    """Fast windows grow the width after the second probe window; at most
    two distinct widths are used (each width = one program compile)."""
    import time

    def fake(s, w):
        time.sleep(0.01)

    log = run_windowed(40, fake, w0=2, target_s=0.2)
    widths = [w for _, w, _ in log]
    assert widths[0] == 2 and widths[1] == 2
    assert max(widths) > 2          # grew
    assert len(set(widths)) <= 2    # only two compiled programs
    assert sum(widths) == 40


def test_slow_windows_stay_small():
    import time

    def slow(s, w):
        time.sleep(0.02)

    log = run_windowed(8, slow, w0=2, target_s=0.01)
    assert all(w == 2 for _, w, _ in log)


def test_max_w_caps_growth():
    log = run_windowed(64, lambda s, w: None, w0=2, target_s=1e9, max_w=4)
    assert max(w for _, w, _ in log) <= 4
    assert sum(w for _, w, _ in log) == 64


def test_single_window_when_total_small():
    log = run_windowed(1, lambda s, w: None, w0=4)
    assert log[0][:2] == (0, 1) and len(log) == 1
