"""DSIR importance-resampling selection: oracle compare plus selection
semantics and determinism invariants."""

from __future__ import annotations

from rangebar_patterns_spark.operators.textops import (
    DSIR_TARGET_SOURCE,
    dsir_weights,
)
from rangebar_patterns_spark.plans.textops_oracle import dsir_sql
from rangebar_patterns_spark.sources.tables import load_table

from conftest import SF_DIR, compare_frames


def test_matches_oracle(spark, duck):
    sp = dsir_weights(load_table(spark, SF_DIR, "documents"))
    du = duck.execute(dsir_sql()).df()
    compare_frames(sp, du)


def test_target_source_is_upweighted(spark):
    """The whole point of the importance weight: documents drawn FROM the
    target distribution must score higher than the rest of the corpus,
    and the deterministic threshold rule must recover mostly-target
    documents."""
    out = dsir_weights(load_table(spark, SF_DIR, "documents")).toPandas()
    tgt = out[out.source == DSIR_TARGET_SOURCE]
    rest = out[out.source != DSIR_TARGET_SOURCE]
    assert tgt.logw.mean() > rest.logw.mean() + 1.0
    assert tgt.target_like.mean() > rest.target_like.mean()
    # the Bernoulli resample concentrates on high-weight docs: every
    # selected doc must out-weigh the corpus median
    med = out.logw.median()
    assert (out[out.selected].logw > med).all()
    assert ((out.sel_prob >= 0) & (out.sel_prob <= 1)).all()


def test_partition_invariant(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = (
        dsir_weights(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dsir_weights(docs.repartition(13, "lang"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b[a.columns])
