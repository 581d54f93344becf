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


def test_training_is_partition_invariant(spark):
    docs = load_table(spark, SF_DIR, "documents")
    w1, mu1, sd1 = logreg_train(docs)
    w2, mu2, sd2 = logreg_train(docs.repartition(13, "lang"))
    assert (w1, mu1, sd1) == (w2, mu2, sd2)
    assert len(w1) == len(LOGREG_FEATURES) + 1
