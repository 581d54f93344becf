"""Synthetic-bar scenario vectors for the barrier simulator — mirrors the
reference's tests/test_barrier_sim.py strategy (FIXTURES.md §5).

Default config: entry=100.0, bar_range=0.01 (threshold 1000 dbps),
tp_mult=2.5 → TP 102.5, sl_mult=5.0 → wide SL 95, sl_tight_mult=1.0 →
tight SL 99, phase1_bars=5, max_bars=10.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rangebar_patterns_spark.config import BarrierConfig, grid_to_spark
from rangebar_patterns_spark.operators.barriers import (
    simulate_barriers,
    with_entry_and_forward,
)

CFG = BarrierConfig(tp_mult=2.5, sl_mult=5.0, sl_tight_mult=1.0, phase1_bars=5, max_bars=10)


def flat(n=1, px=100.0):
    return [(px, px, px, px)] * n


def run_case(spark, fwd_bars, cfg=CFG):
    """fwd_bars: list of (open, high, low, close) for forward bars 1..N.
    Bar layout: rn=1 signal bar, rn=2 entry bar (open=100), rn=3.. forward."""
    rows = [(1, 100.0, 100.0, 100.0, 100.0), (2, 100.0, 100.0, 100.0, 100.0)]
    rows += [(i + 3, o, h, lo, c) for i, (o, h, lo, c) in enumerate(fwd_bars)]
    df = spark.createDataFrame(
        [("T", rn, float(o), float(h), float(lo), float(c), 1000, rn * 1000) for rn, o, h, lo, c in rows],
        "symbol string, rn long, open double, high double, low double, "
        "close double, threshold_decimal_bps int, close_time_ms long",
    )
    feat = with_entry_and_forward(df, cap=cfg.max_bars)
    signals = feat.filter(F.col("rn") == 1)
    trades = simulate_barriers(signals, grid_to_spark(spark, [cfg]))
    return trades.collect()


def test_tp_hit(spark):
    fwd = flat(3) + [(100.0, 103.0, 100.0, 100.0)] + flat(6)
    (t,) = run_case(spark, fwd)
    assert (t.exit_type, t.exit_bar) == ("TP", 4)
    assert t.exit_price == pytest.approx(102.5)
    assert t.return_pct == pytest.approx(0.025)


def test_sl_gap_down_ap13(spark):
    fwd = flat(2) + [(94.0, 94.5, 93.0, 94.0)] + flat(7)
    (t,) = run_case(spark, fwd)
    # gap-down: fills at the open (94), not the SL price (95)
    assert (t.exit_type, t.exit_bar, t.exit_price) == ("SL", 3, 94.0)


def test_same_bar_tie_sl_wins_ap12(spark):
    fwd = flat(1) + [(100.0, 103.0, 94.0, 100.0)] + flat(8)
    (t,) = run_case(spark, fwd)
    assert (t.exit_type, t.exit_bar) == ("SL", 2)
    assert t.exit_price == pytest.approx(95.0)


def test_phase2_tight_sl(spark):
    # bar 4 (phase 1): low 98.6 breaches the TIGHT stop but not the wide one
    # -> must NOT exit; bar 7 (phase 2): low 98.5 breaches tight 99 -> SL@99
    fwd = flat(3) + [(100.0, 100.0, 98.6, 100.0)] + flat(2) + [
        (100.0, 100.0, 98.5, 100.0)
    ] + flat(3)
    (t,) = run_case(spark, fwd)
    assert (t.exit_type, t.exit_bar) == ("SL", 7)
    assert t.exit_price == pytest.approx(99.0)


def test_time_exit(spark):
    fwd = flat(9) + [(100.0, 100.6, 100.0, 100.5)]
    (t,) = run_case(spark, fwd)
    assert (t.exit_type, t.exit_bar, t.exit_price) == ("TIME", 10, 100.5)
    assert t.return_pct == pytest.approx(0.005)


def test_incomplete_dropped(spark):
    trades = run_case(spark, flat(9))  # only 9 of 10 forward bars exist
    assert trades == []


def test_tp_before_sl_by_bar_order(spark):
    # TP on bar 2, SL on bar 5 -> TP wins (earlier bar)
    fwd = flat(1) + [(100.0, 103.0, 100.0, 100.0)] + flat(2) + [
        (94.0, 94.0, 93.0, 94.0)
    ] + flat(5)
    (t,) = run_case(spark, fwd)
    assert (t.exit_type, t.exit_bar) == ("TP", 2)
