"""Skew-salting: identical results to the plain join, with the hot key
spread across n_salts reducers (join key = (key, salt) in the plan)."""

from __future__ import annotations


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from rangebar_patterns_spark.operators.joins import salted_join

    # one pathologically hot key (90% of rows) + a long tail
    large = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("key"),
        F.col("id").alias("rn"),
    )
    small = spark.createDataFrame(
        [("HOT", 1.5)] + [(f"k{i}", float(i)) for i in range(50)],
        "key string, weight double",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = large.join(small, "key").agg(
            F.count("*").alias("n"), F.sum("weight").alias("s")
        ).collect()[0]
        salted = salted_join(large, small, "key", salt_src="rn").agg(
            F.count("*").alias("n"), F.sum("weight").alias("s")
        ).collect()[0]
        assert (plain.n, plain.s) == (salted.n, salted.s)

        plan = (
            salted_join(large, small, "key", salt_src="rn")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "_salt" in plan, "join must run on the salted composite key"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_salted_join_rejects_outer(spark):
    """right/full outer would emit each unmatched small-side row once per
    salt replica — the API must refuse rather than silently duplicate."""
    import pytest

    from rangebar_patterns_spark.operators.joins import salted_join

    large = spark.createDataFrame([("a", 1)], "key string, rn long")
    small = spark.createDataFrame([("a", 1.0)], "key string, weight double")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(large, small, "key", salt_src="rn", how=how)
