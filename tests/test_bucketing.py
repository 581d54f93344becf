"""Bucketed-table co-location: joins and aggregations keyed on the bucket
column must not shuffle (the one-time-layout-cost-vs-per-query-shuffle
trade that carries repeated (symbol,)-keyed work to cluster scale)."""

from __future__ import annotations

import pytest

from conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_bars(spark, tmp_path_factory):
    from rangebar_patterns_spark.sources.bars import bars_from_events
    from rangebar_patterns_spark.sources.sinks import read_bucketed, write_bucketed

    bars = bars_from_events(spark, SF_DIR)
    path = str(tmp_path_factory.mktemp("bucketed") / "bars_bucketed")
    write_bucketed(bars, "bars_bucketed_test", path, n_buckets=4)
    yield read_bucketed(spark, "bars_bucketed_test")
    spark.sql("DROP TABLE IF EXISTS bars_bucketed_test")


def _n_shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_bucketed_self_join_no_shuffle(spark, bucketed_bars):
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = bucketed_bars.groupBy("symbol").agg(F.max("close").alias("mx"))
        b = bucketed_bars.groupBy("symbol").agg(F.min("close").alias("mn"))
        joined = a.join(b, "symbol")
        assert _n_shuffles(joined) == 0, "bucketed join should not shuffle"
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_baseline_shuffles(spark):
    from pyspark.sql import functions as F

    from rangebar_patterns_spark.sources.bars import bars_from_events

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bars = bars_from_events(spark, SF_DIR)
        a = bars.groupBy("symbol").agg(F.max("close").alias("mx"))
        b = bars.groupBy("symbol").agg(F.min("close").alias("mn"))
        assert _n_shuffles(a.join(b, "symbol")) > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
