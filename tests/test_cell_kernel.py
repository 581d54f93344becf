"""Round-13 packed-block cosine kernel (guide §4.2): cell_pair_cosines
must be BIT-identical to the pair-grain join + dot_col formulation it
replaced inside semantic_dedup_pairs / embedding_near_dup_pairs — same
pair set, same rounded cosines, at every sub-block split factor.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from rangebar_patterns_spark.operators.dedup import (
    COSINE_DUP_THRESHOLD,
    _cell_split_factor,
    cell_pair_cosines,
    dot_col,
)


def _fixture(spark, n=120, dim=16, n_buckets=5, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        base = [rng.uniform(-1, 1) for _ in range(dim)]
        if i % 11 == 0:  # near-duplicates: same direction, scaled
            base = [x * 2.0 for x in rows[-1][1]] if rows else base
        if i % 37 == 0:  # zero vector: NULL cosine path (nullif)
            base = [0.0] * dim
        rows.append((i, base, i % n_buckets))
    return spark.createDataFrame(
        rows, "vec_id bigint, v array<double>, bucket int"
    )


def _join_form(v, threshold):
    """The r12 pair-grain formulation, verbatim (norm hoist + join)."""
    vv = v.withColumn("norm", F.sqrt(dot_col(F.col("v"), F.col("v"))))
    a, b = vv.alias("a"), vv.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.bucket").alias("bucket"),
            F.round(
                dot_col(F.col("a.v"), F.col("b.v"))
                / F.nullif(F.col("a.norm") * F.col("b.norm"), F.lit(0.0)),
                6,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


@pytest.mark.parametrize("n_sub", [1, 3])
def test_kernel_matches_join_form_bit_exactly(spark, n_sub):
    v = _fixture(spark)
    got = sorted(
        cell_pair_cosines(v, "bucket", COSINE_DUP_THRESHOLD, n_sub=n_sub)
        .collect()
    )
    want = sorted(_join_form(v, COSINE_DUP_THRESHOLD).collect())
    assert len(want) > 10  # the fixture must actually exercise survivors
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_kernel_handles_empty_and_singleton_buckets(spark):
    v = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 1)],
        "vec_id bigint, v array<double>, bucket int",
    )
    assert cell_pair_cosines(v, "bucket", 0.0, n_sub=2).count() == 0


def test_split_factor_collapses_at_scale():
    # production regime: buckets alone saturate the session -> no split
    assert _cell_split_factor(100_000, 32) == 1
    # certified k=8 on a 32-way session -> split fans the cells out
    s = _cell_split_factor(8, 32)
    assert s > 1 and 8 * s * (s + 1) // 2 >= 2 * 32
    assert _cell_split_factor(1, 1) >= 1
    assert math.isfinite(s)
