"""Unit tests for the scaling-window cleanliness predicate — the part
of bench.py's measurement protocol that decides which windows count
toward the north-rule scaling record. Pins the three rejection rules
(symmetric raw physics bounds; BOTH sandwich controls must scale) and
the round-6 false-clean regression: a clean post-control cannot rescue
a window whose pre-control saw the load burst, and vice versa."""

import json
import os

from bench import HW_EFF_MIN, window_is_pathological

QUIET_PRE = 0.70   # quiet-box controls measure 0.62-0.78
QUIET_POST = 0.65


def test_clean_window_counts():
    assert not window_is_pathological(0.93, QUIET_PRE, QUIET_POST)
    # weakest clean raw ever observed is 0.34 above the lower bound
    assert not window_is_pathological(0.25, QUIET_PRE, QUIET_POST)
    assert not window_is_pathological(2.0, QUIET_PRE, QUIET_POST)


def test_raw_physics_bounds_symmetric():
    # burst on the hi trial: 4x cores <= 1x throughput
    assert window_is_pathological(0.24, QUIET_PRE, QUIET_POST)
    # burst on the LO trial: 4x cores "achieving" > 8x
    assert window_is_pathological(2.01, QUIET_PRE, QUIET_POST)


def test_either_failed_control_rejects():
    """Round-6 regression: the false-clean window had post 0.753 but
    the burst had poisoned the job pair — a pre-control would have
    caught it. Both brackets must scale."""
    assert window_is_pathological(0.384, 0.20, 0.753)   # the r6 window
    assert window_is_pathological(0.384, 0.753, 0.20)   # mirrored
    assert window_is_pathological(0.93, HW_EFF_MIN - 0.01, QUIET_POST)
    assert window_is_pathological(0.93, QUIET_PRE, HW_EFF_MIN - 0.01)
    assert not window_is_pathological(0.93, HW_EFF_MIN, HW_EFF_MIN)


def test_recorded_artifact_consistent_with_predicate():
    """Every window in the recorded round-6 artifact carries the flag
    the current predicate would assign (protocol and record agree)."""
    path = os.path.join(os.path.dirname(__file__), "..", "BENCH",
                        "scaling_r6_sandwich_window.json")
    windows = json.load(open(path))["scaling"]["windows"]
    assert windows
    for w in windows:
        assert w["pathological"] == window_is_pathological(
            w["raw"], w["hw_eff_pre"], w["hw_eff_post"])
