"""E2E loop closure on the closed circuit — the bench's gated quality
number (bench._loop_closure_numbers) exercised as a test: a full
360-degree orbit of mono drift must be cancelled by detection + Sim3
verification + essential-graph correction + GBA on the production
chunked engine (src/LoopClosing.cc:60-680 role)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_circuit_loop_closure_cancels_drift():
    import bench

    out = bench._loop_closure_numbers()   # gates internally (assert)
    assert out["loops_closed"] >= 1
    assert out["loop_kf_ate_m"] < 0.25 * out["no_loop_kf_ate_m"]
    # the corrected trajectory lands in the same accuracy class as the
    # non-loopy bench arc (measured 0.005 m)
    assert out["loop_kf_ate_m"] < 0.05
