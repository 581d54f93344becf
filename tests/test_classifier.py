"""Distributed logistic-regression trainer: oracle compare plus learning
and determinism invariants."""

from __future__ import annotations

from rangebar_patterns_spark.operators.classifier import (
    LOGREG_FEATURES,
    logreg_score,
    logreg_train,
)
from rangebar_patterns_spark.plans.textops_oracle import logreg_scores_sql
from rangebar_patterns_spark.sources.tables import load_table

from conftest import SF_DIR, compare_frames


def test_matches_oracle(spark, duck):
    sp = logreg_score(load_table(spark, SF_DIR, "documents"))
    du = duck.execute(logreg_scores_sql()).df()
    compare_frames(sp, du)


def test_training_beats_majority_class(spark):
    out = logreg_score(load_table(spark, SF_DIR, "documents")).toPandas()
    pos = (out.y == 1.0).mean()
    majority = max(pos, 1 - pos)
    acc = (out.predicted_repetitive == (out.y == 1.0)).mean()
    assert acc >= majority + 0.1, (acc, majority)
    assert ((out.score >= 0) & (out.score <= 1)).all()


def test_exact_fixed_point_early_stop(spark):
    """When a step leaves every round-6 weight unchanged the loop exits:
    remaining iterations are provably no-ops, so the returned weights are
    identical to the full-budget run (the only early-stop form that
    cannot perturb certified output).  A label-balanced, sign-symmetric
    design has zero gradient at w=0, so the very first step is already
    the fixed point."""
    rows = [
        (i, float(s), float(s), float(s), float(s), float(y))
        for i, (s, y) in enumerate([(1, 1), (1, 0), (-1, 1), (-1, 0)] * 3)
    ]
    raw = spark.createDataFrame(
        rows, f"doc_id long, {', '.join(f'{c} double' for c in LOGREG_FEATURES)}, y double"
    )
    stats: dict = {}
    w_short, mu, sd = logreg_train(raw, iters=50, raw=raw, stats_out=stats)
    assert stats["iters_run"] == 1
    w_full, mu2, sd2 = logreg_train(raw, iters=3, raw=raw)
    assert (w_short, mu, sd) == (w_full, mu2, sd2)
    assert w_short == [0.0] * (len(LOGREG_FEATURES) + 1)


def test_fixture_path_runs_full_budget(spark):
    """The gate fixture is deliberately non-converged (lr=4, 12 steps):
    the fixed-point break must never fire there, keeping the engine in
    lockstep with the unrolled 12-step DuckDB twin."""
    stats: dict = {}
    logreg_train(load_table(spark, SF_DIR, "documents"), stats_out=stats)
    assert stats["iters_run"] == 12


def test_training_is_partition_invariant(spark):
    docs = load_table(spark, SF_DIR, "documents")
    w1, mu1, sd1 = logreg_train(docs)
    w2, mu2, sd2 = logreg_train(docs.repartition(13, "lang"))
    assert (w1, mu1, sd1) == (w2, mu2, sd2)
    assert len(w1) == len(LOGREG_FEATURES) + 1


def test_moments_single_pass_matches_two_pass(spark):
    """standardize_moments (round-12: one fused aggregate job) must be
    bit-identical to the literal two-pass definition — a mean job, then a
    squared-deviation job seeded with the collected round-6 mean — which
    is what the unrolled DuckDB twin computes."""
    from pyspark.sql import functions as F

    from rangebar_patterns_spark.operators.classifier import (
        _sum1,
        _sum2,
        logreg_features,
        standardize_moments,
    )

    feats = logreg_features(load_table(spark, SF_DIR, "documents")).persist()
    try:
        n = F.count("*").cast("double")
        mu_row = feats.agg(
            *[F.round(_sum1(F.col(c)) / n, 6).alias(c) for c in LOGREG_FEATURES]
        ).collect()[0]
        mu_ref = [mu_row[c] for c in LOGREG_FEATURES]
        sd_row = feats.agg(
            *[
                F.round(
                    F.sqrt(_sum2(F.col(c) - F.lit(m), F.col(c) - F.lit(m)) / n),
                    6,
                ).alias(c)
                for c, m in zip(LOGREG_FEATURES, mu_ref)
            ]
        ).collect()[0]
        sd_ref = [sd_row[c] for c in LOGREG_FEATURES]
        mu, sd = standardize_moments(feats)
        assert mu == mu_ref
        assert sd == sd_ref
    finally:
        feats.unpersist()
