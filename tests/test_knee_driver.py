"""The catalog's E17 knee step runs driver-side on the collected
config-grain matrix (like the reference, eval/ranking.py:390-470); the
distributed all-pairs self-join remains as the spill-over path.  Pin
bit-equality between the two, and pin the driver-side HALF_UP rounding
twin against Spark's own F.round."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from rangebar_patterns_spark.operators.synthesis import (
    _round6_half_up,
    knee_points,
    knee_points_distributed,
)

from conftest import compare_frames


def _matrix(spark, n, seed, nulls=False):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                f"s{i % 3}",
                f"b{i:04d}",
                rnd.uniform(-5, 5),
                None if (nulls and rnd.random() < 0.15) else rnd.uniform(0, 9),
                rnd.gauss(0, 1),
            )
        )
    return spark.createDataFrame(
        rows, "symbol string, barrier_id string, omega double, "
        "rachev double, cdar_inv double"
    )


@pytest.mark.parametrize("seed,n,nulls", [(1, 40, False), (2, 90, True), (3, 7, False)])
def test_driver_matches_distributed(spark, seed, n, nulls):
    df = _matrix(spark, n, seed, nulls)
    cols = ["omega", "rachev", "cdar_inv"]
    drv = knee_points(df, cols)
    dist = knee_points_distributed(df, cols).toPandas()
    compare_frames(drv, dist)


def test_single_candidate_emits_nothing(spark):
    df = _matrix(spark, 1, 9)
    assert knee_points(df, ["omega", "rachev", "cdar_inv"]).count() == 0
    assert (
        knee_points_distributed(df, ["omega", "rachev", "cdar_inv"]).count() == 0
    )


def test_round6_matches_spark_round(spark):
    rnd = random.Random(42)
    vals = [rnd.uniform(-10, 10) for _ in range(400)]
    # adversarial near-half-ulp cases around the 6th decimal
    vals += [i / 2_000_000 for i in range(-20, 21)]
    vals += [0.1234565, -0.1234565, 2.6749995, 1e-7, -1e-7]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r[0] for r in df.select(F.round("x", 6)).collect()]
    want = [_round6_half_up(v) for v in vals]
    assert got == want


def test_nan_metric_routes_to_distributed(spark):
    df = spark.createDataFrame(
        [("a", "b1", 1.0, 2.0, float("nan")), ("a", "b2", 2.0, 1.0, 3.0),
         ("a", "b3", 3.0, 3.0, 1.0)],
        "symbol string, barrier_id string, omega double, rachev double, "
        "cdar_inv double",
    )
    cols = ["omega", "rachev", "cdar_inv"]
    drv = knee_points(df, cols)
    dist = knee_points_distributed(df, cols).toPandas()
    compare_frames(drv, dist)  # identical because it IS the distributed plan
