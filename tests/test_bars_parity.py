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


def test_temporal_prior_year_gate_fires(spark, tmp_path):
    """gen109 prior-year-percentile semantics need >1 calendar year of
    data — the driver testdata spans one year, so its gate rows never
    exercise the lagged join.  Two synthetic years through BOTH engines:
    the Spark panel must match the DuckDB twin exactly AND produce a
    non-zero prior-year signal count in year 2 (proving the gate fires),
    zero in year 1 (no prior year exists)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rangebar_patterns_spark.plans.catalog import ORACLES, QUERIES
    from conftest import compare_frames
    import duckdb

    n = 3000
    rows = {
        "event_id": list(range(1, 2 * n + 1)),
        "ts": (
            list(pd.date_range("2023-01-05", periods=n, freq="90min"))
            + list(pd.date_range("2024-01-05", periods=n, freq="90min"))
        ),
        "user_id": [7] * (2 * n),
        "event_type": ["SYN"] * (2 * n),
        "value": [float((i * 37) % 100) for i in range(2 * n)],
        "props": ["{}"] * (2 * n),
    }
    d = tmp_path / "sf_syn"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows)), d / "events.parquet",
        coerce_timestamps="us",
    )

    sp = QUERIES["temporal_yearly"](spark, str(d))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'"
    )
    du = con.execute(ORACLES["temporal_yearly"]).df()
    compare_frames(sp, du)

    got = {r.yr: r.prioryr_signals for r in sp.collect()}
    assert got[2023] == 0, "no prior year for the first year"
    assert got[2024] > 0, "prior-year gate must fire in year 2"
