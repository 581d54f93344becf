"""Bit-exactness of the events->bars adapter across Spark and DuckDB.

Everything downstream (every oracle_sql twin) assumes the two engines see
identical bars — this test is the foundation of the whole oracle strategy.
"""

from __future__ import annotations

from rangebar_patterns_spark.sources.bars import (
    BAR_COLUMNS,
    BARS_DUCKDB_CTE,
    bars_from_events,
)

from conftest import SF_DIR, compare_frames


def test_bars_bit_exact(spark, duck):
    sp = bars_from_events(spark, SF_DIR).select(*BAR_COLUMNS)
    du = duck.execute(
        f"WITH {BARS_DUCKDB_CTE} SELECT {', '.join(BAR_COLUMNS)} FROM bars"
    ).df()
    compare_frames(sp, du, rtol=0.0, atol=0.0)


def test_bars_coherence(spark):
    from pyspark.sql import functions as F

    bars = bars_from_events(spark, SF_DIR)
    bad = bars.filter(
        (F.col("high") < F.greatest("open", "close"))
        | (F.col("low") > F.least("open", "close"))
        | (F.col("low") <= 0)
        | (F.col("volume") <= 0)
        | (F.col("duration_us") <= 0)
    ).count()
    assert bad == 0

    # strictly increasing rn within symbol, 1-based
    agg = bars.groupBy("symbol").agg(
        F.min("rn").alias("mn"), F.max("rn").alias("mx"), F.count("*").alias("n")
    )
    for row in agg.collect():
        assert row.mn == 1 and row.mx == row.n

    # NULL bands present in intra features
    nulls = bars.filter(F.col("intra_hurst").isNull()).count()
    total = bars.count()
    assert 0.10 < nulls / total < 0.40
