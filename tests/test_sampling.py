"""Deterministic sampling: membership is a pure function of (salt, key) —
invariant to partitioning; rate is honored approximately; salts are
independent."""

from __future__ import annotations

from conftest import SF_DIR


def test_sample_deterministic_and_partition_invariant(spark):
    from rangebar_patterns_spark.operators.textops import deterministic_sample
    from rangebar_patterns_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    a = {r.doc_id for r in deterministic_sample(docs, 0.3).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(13), 0.3)
        .select("doc_id")
        .collect()
    }
    assert a == b, "membership must not depend on partitioning"
    n = docs.count()
    assert 0.15 * n <= len(a) <= 0.45 * n  # loose band: 500-doc fixture

    # nested rates: a lower-rate sample with the same salt is a subset
    c = {r.doc_id for r in deterministic_sample(docs, 0.1).select("doc_id").collect()}
    assert c <= a

    # different salts decorrelate
    d = {
        r.doc_id
        for r in deterministic_sample(docs, 0.3, salt="other").select("doc_id").collect()
    }
    assert d != a
