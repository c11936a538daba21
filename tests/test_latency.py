"""Frame-tail attribution (runtime/latency.py)."""

import numpy as np

from coslam_tpu.runtime.latency import attribute_tails


def _walls(dts):
    return np.concatenate([[0.0], np.cumsum(dts)])


def test_attributes_slow_frames_to_overlapping_events():
    # 20 fast frames (10 ms) + two slow ones (50 ms) with events inside.
    dts = [0.01] * 10 + [0.05] + [0.01] * 5 + [0.05] + [0.01] * 4
    walls = _walls(dts)
    ev = [(walls[10] + 0.001, walls[10] + 0.04, "ba"),
          (walls[16] + 0.001, walls[16] + 0.03, "checkpoint")]
    rep = attribute_tails(walls, ev)
    assert rep["n_slow"] == 2
    assert rep["slow_by_cause"] == {"ba": 1, "checkpoint": 1}
    assert rep["slow_untagged"] == 0
    assert rep["p50_ms"] == 10.0
    assert rep["p99_ms"] > rep["p50_ms"]


def test_lookback_catches_async_dispatch():
    """An event recorded in frame k (async dispatch) whose wall cost
    lands in frame k+1 is still attributed (one-p50 lookback)."""
    dts = [0.01] * 10 + [0.05] + [0.01] * 9
    walls = _walls(dts)
    # event entirely inside frame 9 (just before the slow frame 10)
    ev = [(walls[9] + 0.002, walls[9] + 0.008, "ba")]
    rep = attribute_tails(walls, ev)
    assert rep["slow_by_cause"] == {"ba": 1}
    assert rep["slow_untagged"] == 0


def test_untagged_and_degenerate():
    dts = [0.01] * 10 + [0.05]
    rep = attribute_tails(_walls(dts), [])
    assert rep["n_slow"] == 1 and rep["slow_untagged"] == 1
    assert attribute_tails([0.0, 1.0], [])["n_frames"] == 1
    assert attribute_tails([], [])["n_frames"] == 0
