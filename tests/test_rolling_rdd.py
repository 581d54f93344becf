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
