"""gen800 rolling RDD composite: the E28 calendar-range primitive pin
(formerly the ``rolling_calendar_window`` gate entry — subsumed by the
gen800 composite, kept certified here) plus window-stage invariants."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_DIR, compare_frames

_DAY_MS = 86_400_000


def test_calendar_rangebetween_primitive(spark, duck):
    """E28 bare primitive: rangeBetween on epoch-ms vs the DuckDB RANGE
    window twin (the old rolling_calendar_window oracle, verbatim)."""
    from pyspark.sql import Window

    from rangebar_patterns_spark.plans.catalog import _bars
    from rangebar_patterns_spark.sources.bars import BARS_DUCKDB_CTE

    bars = _bars(spark, SF_DIR)
    w = (
        Window.partitionBy("symbol")
        .orderBy("close_time_ms")
        .rangeBetween(-_DAY_MS, 0)
    )
    sp = bars.select(
        "symbol",
        "rn",
        "close_time_ms",
        F.count("*").over(w).alias("n_bars_1d"),
        F.sum(F.floor(F.col("trade_intensity") * 1000000).cast("long"))
        .over(w)
        .alias("ti_sum_scaled_1d"),
        F.round(F.min("low").over(w), 6).alias("min_low_1d"),
        F.round(F.max("high").over(w), 6).alias("max_high_1d"),
    )
    du = duck.execute(f"""
WITH {BARS_DUCKDB_CTE}
SELECT symbol, rn, close_time_ms,
    CAST(count(*) OVER w AS BIGINT) AS n_bars_1d,
    CAST(sum(CAST(floor(trade_intensity * 1000000) AS BIGINT)) OVER w AS BIGINT)
        AS ti_sum_scaled_1d,
    round(min(low) OVER w, 6) AS min_low_1d,
    round(max(high) OVER w, 6) AS max_high_1d
FROM bars
WINDOW w AS (PARTITION BY symbol ORDER BY close_time_ms
             RANGE BETWEEN {_DAY_MS} PRECEDING AND CURRENT ROW)
""").df()
    compare_frames(sp, du)


def test_gen800_window_invariants(spark):
    """Window-stage sanity at fixture scale: every trade lands in at most
    window_ms/step_ms + 1 windows; w_start <= exits <= w_end by
    construction; ratios capped."""
    from rangebar_patterns_spark.operators.rolling_rdd import (
        rolling_rdd_windows,
        with_exit_ts,
    )
    from rangebar_patterns_spark.plans.catalog import (
        _bars,
        _champion_trades,
    )

    xt = with_exit_ts(_champion_trades(spark, SF_DIR), _bars(spark, SF_DIR))
    win = rolling_rdd_windows(
        xt, window_days=7, step_days=1, min_trades=1
    ).toPandas()
    assert len(win) > 0
    assert (win.return_dd_ratio <= 50.0).all()
    assert (win.w_end_ms - win.w_start_ms <= 7 * _DAY_MS).all()
    assert (win.n_trades >= 1).all()


def test_distribution_argmin_argmax_first_occurrence_on_ties(spark):
    """np.argmin/argmax semantics: when several windows share the extreme
    ratio (common — the positive side is capped at 50.0), the FIRST
    window wins, i.e. the smallest w_start_ms.  Pins the lexicographic
    struct min/max formulation (min (r, ws) / max (r, -ws))."""
    from rangebar_patterns_spark.operators.rolling_rdd import (
        rdd_distribution_stats,
    )

    rows = [
        # (w_start, ratio): min ratio -2.0 at ws 300 and 100 -> worst=100
        #                   max ratio 50.0 at ws 400 and 200 -> best=200
        ("A", "b1", 100, -2.0),
        ("A", "b1", 200, 50.0),
        ("A", "b1", 300, -2.0),
        ("A", "b1", 400, 50.0),
        ("A", "b1", 500, 1.5),
    ]
    win = spark.createDataFrame(
        [(s, b, ws, r, 7) for s, b, ws, r in rows],
        "symbol string, barrier_id string, w_start_ms long,"
        " return_dd_ratio double, n_trades int",
    )
    got = rdd_distribution_stats(win, min_valid_windows=1).toPandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row.worst_window_start_ms == 100
    assert row.worst_window_ratio == -2.0
    assert row.best_window_start_ms == 200
    assert row.best_window_ratio == 50.0
    assert row.min_ratio == -2.0 and row.max_ratio == 50.0
