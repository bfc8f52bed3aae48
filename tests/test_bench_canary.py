"""Canary-normalization contract (r12 verdict ask #3): the correction
is median-of-per-query-ratios, clamped to NORM_BAND — outside the band
the artifact carries raw + ratio + 'turbulent' and NO _norm fields, so
a noisy host window can never grant the headline a >1.4x discount."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _out(ends, value=10.0, a1=None):
    # a1's ratio is position-matched: it reads from queries (the
    # headline phase), not canary_end
    q = {"q": value}
    if a1 is not None:
        q["a1_pricing_summary"] = a1
    return {
        "value": value,
        "scale_safe_total": value,
        "queries": q,
        "canary_end": ends,
    }


def test_normal_window_emits_norm_and_per_canary_ratios():
    out = _out(
        {"w5_running_sums": 0.117, "a3_group_max": 0.133, "j4_semi_anti": 0.269},
        a1=0.43,
    )
    bench.canary_normalize(out, 0.1)
    assert out["canary_window"] == "normal"
    assert set(out["canary_ratios"]) == set(bench.CANARY) | set(
        bench.HEADLINE_CANARY
    )
    # true median: with four canaries, the mean of the middle two
    rs = sorted(out["canary_ratios"].values())
    assert out["canary_ratio"] == (rs[1] + rs[2]) / 2
    assert out["value_norm"] == round(10.0 * out["canary_ratio"], 3)
    assert bench.NORM_BAND[0] <= out["canary_ratio"] <= bench.NORM_BAND[1]
    # r15: the window-quality gate field the driver's PERF comparison
    # reads — always equal to the median ratio
    assert out["canary_median"] == out["canary_ratio"]


def test_turbulent_window_suppresses_norm():
    # the r12 builder-pass scenario: host ~2x slow -> ratio ~0.51
    out = _out(
        {"w5_running_sums": 0.19, "a3_group_max": 0.20, "j4_semi_anti": 0.40},
        a1=0.72,
    )
    bench.canary_normalize(out, 0.1)
    assert out["canary_window"] == "turbulent"
    assert "value_norm" not in out and "queries_norm" not in out
    # raw + ratio still present for the reader — and canary_median stays
    # present even on a turbulent window (it IS the quality signal)
    assert out["canary_ratio"] < bench.NORM_BAND[0]
    assert out["canary_median"] == out["canary_ratio"]
    assert set(out["canary_ratios"]) == set(bench.CANARY) | set(
        bench.HEADLINE_CANARY
    )


def test_single_noisy_canary_cannot_steer_the_median():
    # three canaries read clean (ratio ~1.0), one reads 5x fast — the
    # median stays at the clean majority's value
    out = _out(
        {"w5_running_sums": 0.098, "a3_group_max": 0.102, "j4_semi_anti": 1.02},
        a1=0.36,
    )
    bench.canary_normalize(out, 0.1)
    assert 0.9 <= out["canary_ratio"] <= 1.1
    assert out["canary_window"] == "normal"


def test_missing_or_zero_canary_emits_nothing():
    out = _out({"w5_running_sums": 0.0})
    bench.canary_normalize(out, 0.1)
    assert "canary_ratio" not in out and "value_norm" not in out
    # a1 present in canary_end is NOT enough: its position-matched
    # reading comes from the headline phase (queries)
    out = _out(
        {"w5_running_sums": 0.1, "a3_group_max": 0.1, "j4_semi_anti": 0.2}
    )
    bench.canary_normalize(out, 0.1)
    assert "canary_ratio" not in out and "value_norm" not in out
    out2 = _out(
        {"w5_running_sums": 0.1, "a3_group_max": 0.1, "j4_semi_anti": 0.2},
        a1=0.4,
    )
    bench.canary_normalize(out2, 0.05)  # unpinned sf
    assert "canary_ratio" not in out2 and "value_norm" not in out2
