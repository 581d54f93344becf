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


def run_case_short(spark, fwd_bars, cfg=CFG):
    """SHORT twin of run_case: same bar layout, side='short'.
    With entry=100, bar_range=0.01: TP 97.5 (below), wide SL 105 (above),
    tight SL 101, phase1_bars=5, max_bars=10."""
    rows = [(1, 100.0, 100.0, 100.0, 100.0), (2, 100.0, 100.0, 100.0, 100.0)]
    rows += [(i + 3, o, h, lo, c) for i, (o, h, lo, c) in enumerate(fwd_bars)]
    df = spark.createDataFrame(
        [("T", rn, float(o), float(h), float(lo), float(c), 1000, rn * 1000) for rn, o, h, lo, c in rows],
        "symbol string, rn long, open double, high double, low double, "
        "close double, threshold_decimal_bps int, close_time_ms long",
    )
    feat = with_entry_and_forward(df, cap=cfg.max_bars)
    signals = feat.filter(F.col("rn") == 1).withColumn("side", F.lit("short"))
    trades = simulate_barriers(signals, grid_to_spark(spark, [cfg]))
    return trades.collect()


def test_short_tp_hit(spark):
    # low 97.0 <= TP 97.5 on forward bar 4 -> TP at exactly 97.5
    fwd = flat(3) + [(100.0, 100.0, 97.0, 100.0)] + flat(6)
    (t,) = run_case_short(spark, fwd)
    assert (t.exit_type, t.exit_bar) == ("TP", 4)
    assert t.exit_price == pytest.approx(97.5)
    assert t.return_pct == pytest.approx(0.025)


def test_short_sl_gap_up_ap13(spark):
    # gap-up against the short: opens at 106 above SL 105 -> fills at the
    # WORSE price (the open), mirror of the long gap-down rule
    fwd = flat(2) + [(106.0, 107.0, 105.5, 106.0)] + flat(7)
    (t,) = run_case_short(spark, fwd)
    assert (t.exit_type, t.exit_bar, t.exit_price) == ("SL", 3, 106.0)
    assert t.return_pct == pytest.approx(-0.06)


def test_short_same_bar_tie_sl_wins_ap12(spark):
    # bar 2 touches both TP (low 97) and SL (high 105) -> SL wins
    fwd = flat(1) + [(100.0, 105.0, 97.0, 100.0)] + flat(8)
    (t,) = run_case_short(spark, fwd)
    assert (t.exit_type, t.exit_bar) == ("SL", 2)
    assert t.exit_price == pytest.approx(105.0)


def test_short_phase2_tight_sl(spark):
    # phase 1 (bar 4): high 101.4 breaches tight 101 but not wide 105 ->
    # no exit; phase 2 (bar 7): high 101.5 breaches tight -> SL@101
    fwd = flat(3) + [(100.0, 101.4, 100.0, 100.0)] + flat(2) + [
        (100.0, 101.5, 100.0, 100.0)
    ] + flat(3)
    (t,) = run_case_short(spark, fwd)
    assert (t.exit_type, t.exit_bar) == ("SL", 7)
    assert t.exit_price == pytest.approx(101.0)


def test_short_time_exit_negative_return(spark):
    fwd = flat(9) + [(100.0, 100.6, 100.0, 100.5)]
    (t,) = run_case_short(spark, fwd)
    assert (t.exit_type, t.exit_bar, t.exit_price) == ("TIME", 10, 100.5)
    assert t.return_pct == pytest.approx(-0.005)


def test_mixed_sides_one_pass(spark):
    """LONG and SHORT signals flow through ONE simulate_barriers call with
    per-row geometry (the gen720 engine runs both sides in one sweep)."""
    rows = [(1, 100.0, 100.0, 100.0, 100.0), (2, 100.0, 100.0, 100.0, 100.0)]
    rows += [(i + 3, 100.0, 106.0, 94.0, 100.0) for i in range(CFG.max_bars)]
    df = spark.createDataFrame(
        [("T", rn, float(o), float(h), float(lo), float(c), 1000, rn * 1000) for rn, o, h, lo, c in rows],
        "symbol string, rn long, open double, high double, low double, "
        "close double, threshold_decimal_bps int, close_time_ms long",
    )
    feat = with_entry_and_forward(df, cap=CFG.max_bars)
    sig = feat.filter(F.col("rn") == 1)
    both = sig.withColumn("side", F.lit("long")).unionByName(
        sig.withColumn("side", F.lit("short"))
    )
    trades = simulate_barriers(both, grid_to_spark(spark, [CFG]), id_cols=("side",))
    by_side = {t.side: t for t in trades.collect()}
    # bar 1 touches TP and SL on both sides -> SL wins both, at each side's
    # own SL price
    assert by_side["long"].exit_price == pytest.approx(95.0)
    assert by_side["short"].exit_price == pytest.approx(105.0)


# --- gen201/gen202 trailing-stop scenarios -------------------------------

from rangebar_patterns_spark.config import TrailingConfig, trailing_grid_to_spark
from rangebar_patterns_spark.operators.barriers import simulate_trailing_barriers

# entry=100, bar_range=0.01 (1000 dbps): TP 110, trail_pct 5% — initial
# trailing SL 95, ratchets to running_max * 0.95
TCFG = TrailingConfig(tp_mult=10.0, trail_mult=5.0, max_bars=10)


def run_case_trailing(spark, fwd_bars, cfg=TCFG):
    rows = [(1, 100.0, 100.0, 100.0, 100.0), (2, 100.0, 100.0, 100.0, 100.0)]
    rows += [(i + 3, o, h, lo, c) for i, (o, h, lo, c) in enumerate(fwd_bars)]
    df = spark.createDataFrame(
        [("T", rn, float(o), float(h), float(lo), float(c), 1000, rn * 1000) for rn, o, h, lo, c in rows],
        "symbol string, rn long, open double, high double, low double, "
        "close double, threshold_decimal_bps int, close_time_ms long",
    )
    feat = with_entry_and_forward(df, cap=cfg.max_bars)
    signals = feat.filter(F.col("rn") == 1)
    return simulate_trailing_barriers(
        signals, trailing_grid_to_spark(spark, [cfg])
    ).collect()


def test_trailing_ratchet_up_then_stop(spark):
    # bar 1 runs to 106 -> trailing SL ratchets to 106*0.95 = 100.7 (the
    # ratchet uses the CURRENT bar's high; its own low 104.9 stays above);
    # bar 3 low 100.5 <= 100.7 -> TRAIL exit at 100.7 (a PROFITABLE stop,
    # impossible under a fixed SL)
    fwd = [(100.0, 106.0, 104.9, 105.0), (105.0, 106.0, 101.0, 105.0),
           (105.0, 105.0, 100.5, 101.0)] + flat(7)
    (t,) = run_case_trailing(spark, fwd)
    assert (t.exit_type, t.exit_bar) == ("TRAIL", 3)
    assert t.exit_price == pytest.approx(106.0 * 0.95)
    assert t.return_pct > 0


def test_trailing_same_bar_spike_stops_out(spark):
    # the ratchet includes bar i's own high BEFORE checking bar i's low
    # (gen201:150-152 arrayMap over arraySlice(1, i)): a single bar spiking
    # to 106 with a 100 low sets the stop to 100.7 and breaches it same-bar;
    # the open (100) is below the stop -> gap-rule fill at the open
    fwd = [(100.0, 106.0, 100.0, 105.0)] + flat(9, 105.0)
    (t,) = run_case_trailing(spark, fwd)
    assert (t.exit_type, t.exit_bar, t.exit_price) == ("TRAIL", 1, 100.0)


def test_trailing_initial_stop_no_ratchet(spark):
    # no new high: running max stays entry=100, SL 95; bar 2 low 94.5 -> 95
    fwd = flat(1) + [(100.0, 100.0, 94.5, 95.0)] + flat(8)
    (t,) = run_case_trailing(spark, fwd)
    assert (t.exit_type, t.exit_bar, t.exit_price) == ("TRAIL", 2, 95.0)


def test_trailing_gap_down_fills_at_open(spark):
    # bar 2 opens at 93 below the 95 stop -> fills at the open
    fwd = flat(1) + [(93.0, 94.0, 92.0, 93.0)] + flat(8)
    (t,) = run_case_trailing(spark, fwd)
    assert (t.exit_type, t.exit_bar, t.exit_price) == ("TRAIL", 2, 93.0)


def test_trailing_same_bar_tie_trail_wins(spark):
    # bar 1 touches TP 110 AND (via its own high ratchet) the trailing
    # stop: high 112 -> SL ratchets to 106.4, low 106 <= 106.4 -> both
    # barriers in bar 1 -> TRAIL wins (gen201 tie rule); open 107 above
    # the stop -> fills at the stop price
    fwd = [(107.0, 112.0, 106.0, 107.0)] + flat(9, 107.0)
    (t,) = run_case_trailing(spark, fwd)
    assert (t.exit_type, t.exit_bar) == ("TRAIL", 1)
    assert t.exit_price == pytest.approx(112.0 * 0.95)


def test_trailing_tp_exact_fill(spark):
    # clean TP: bar 2 high 111 >= 110 with lows above even the ratcheted
    # stop (111*0.95 = 105.45 < low 110)
    fwd = [(100.0, 105.0, 104.0, 105.0), (105.0, 111.0, 110.0, 110.0)] + flat(8, 110.0)
    (t,) = run_case_trailing(spark, fwd)
    assert (t.exit_type, t.exit_bar) == ("TP", 2)
    # fills exactly at tp_price = 100*(1 + 10*0.01) (float product, 110+1ulp)
    assert t.exit_price == pytest.approx(110.0)


def test_trailing_time_exit(spark):
    fwd = [(100.0, 100.5, 99.9, 100.2)] * 10
    (t,) = run_case_trailing(spark, fwd)
    assert (t.exit_type, t.exit_bar) == ("TIME", 10)
    assert t.exit_price == pytest.approx(100.2)


# --- Strategy-B "rev" reverse time-decay (tight SL first, wide later) ---
# gen720_wf_2up_ng_s_rev_template.sql:167-189: phase 1 scans the TIGHT
# stop (cut losers fast), phase 2 the WIDE stop (give survivors room).
# Expressed as the same grid with the sl_mult/sl_tight_mult roles
# swapped: phase-1 stop 99 (1.0x), phase-2 stop 95 (5.0x).

REV_CFG = BarrierConfig(
    tp_mult=2.5, sl_mult=1.0, sl_tight_mult=5.0, phase1_bars=5, max_bars=10
)


def test_rev_phase1_tight_sl(spark):
    # bar 3 (phase 1): low 98.6 breaches the tight stop 99 -> SL@99
    fwd = flat(2) + [(100.0, 100.0, 98.6, 100.0)] + flat(7)
    (t,) = run_case(spark, fwd, cfg=REV_CFG)
    assert (t.exit_type, t.exit_bar) == ("SL", 3)
    assert t.exit_price == pytest.approx(99.0)


def test_rev_phase2_needs_wide_breach(spark):
    # bar 7 (phase 2): low 98.5 would hit the tight stop but phase 2 runs
    # the WIDE stop 95 -> no exit; TIME exit at bar 10
    fwd = flat(6) + [(100.0, 100.0, 98.5, 100.0)] + flat(3)
    (t,) = run_case(spark, fwd, cfg=REV_CFG)
    assert (t.exit_type, t.exit_bar) == ("TIME", 10)


def test_rev_phase2_wide_sl_fill(spark):
    # bar 8 (phase 2): low 94 breaches the wide stop 95 -> SL@95
    fwd = flat(7) + [(100.0, 100.0, 94.0, 100.0)] + flat(2)
    (t,) = run_case(spark, fwd, cfg=REV_CFG)
    assert (t.exit_type, t.exit_bar) == ("SL", 8)
    assert t.exit_price == pytest.approx(95.0)


def test_gen720_wf_grid_matches_reference_width():
    """The full walk-forward grid must be exactly the reference's
    constraint-filtered 8x7x9 matrix (gen720_wf_wl1d_template.sql:118-135)
    with its barrier_id concat format."""
    from rangebar_patterns_spark.config import gen720_wf_grid

    grid = gen720_wf_grid()
    assert len(grid) == 434
    ids = {c.barrier_id for c in grid}
    assert len(ids) == 434
    # spot-check the reference's lpad(tight*10, 3, '0') id format
    assert "p2_slt075_mb10" in ids
    assert "p30_slt000_mb200" in ids
    assert "p5_slt005_mb50" in ids  # tight 0.5 -> '005'
    for c in grid:
        assert c.phase1_bars < c.max_bars
        assert c.tp_mult == 2.5 and c.sl_mult == 5.0
    # breakeven stop (tight 0.0) present for every (phase1, max_bars) cell
    assert sum(1 for c in grid if c.sl_tight_mult == 0.0) == 62
