"""Local replica of the driver's correctness gate: run every catalog query
on Spark and its oracle twin on DuckDB at sf0.001, compare order-insensitively.
"""

from __future__ import annotations

import pytest

from rangebar_patterns_spark.plans.catalog import ORACLES, QUERIES

from conftest import SF_DIR, compare_frames


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    if name not in ORACLES:
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0  # rows-only check (driver's weaker gate)
        return
    sp = QUERIES[name](spark, SF_DIR)
    du = duck.execute(ORACLES[name]).df()
    compare_frames(sp, du)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"symbol", "signal_count", "hits", "hit_rate", "z_score"} <= set(
        df.columns
    )
    # signals must actually fire at sf0.001 for the flagship to be meaningful
    assert sum(r.signal_count for r in rows) > 0
