"""Sequence packing invariants: every doc assigned exactly once; packs
respect the budget up to the one allowed boundary overflow; assignment is
partition-invariant (deterministic shard hash + doc order)."""

from __future__ import annotations

from conftest import SF_DIR

BUDGET = 200


def test_pack_documents_invariants(spark):
    from pyspark.sql import functions as F

    from rangebar_patterns_spark.operators.textops import pack_documents
    from rangebar_patterns_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    packed = pack_documents(docs, BUDGET)
    n_docs = docs.count()
    assert packed.count() == n_docs
    assert packed.select("doc_id").distinct().count() == n_docs

    sums = (
        packed.groupBy("shard", "pack_id")
        .agg(F.sum("n_tokens").alias("s"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    for r in sums:
        assert r.s <= BUDGET + r.mx, (r.shard, r.pack_id, r.s)

    a = {(r.doc_id, r.shard, r.pack_id) for r in packed.collect()}
    b = {
        (r.doc_id, r.shard, r.pack_id)
        for r in pack_documents(docs.repartition(17), BUDGET).collect()
    }
    assert a == b, "packing must be partition-invariant"


def test_packing_panel_gate_contract(spark):
    """The oracle-certified panel: same packing invariants on the md5
    shard, plus the sample column — membership is a pure function of
    doc_id (partition-invariant) and the realized rate is within a loose
    band of PACK_SAMPLE_RATE."""
    from pyspark.sql import functions as F

    from rangebar_patterns_spark.operators.textops import (
        PACK_BUDGET_TOKENS,
        PACK_SAMPLE_RATE,
        PACK_SHARDS,
        packing_panel,
    )
    from rangebar_patterns_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    panel = packing_panel(docs)
    n_docs = docs.count()
    assert panel.count() == n_docs
    assert panel.select("doc_id").distinct().count() == n_docs
    shards = panel.agg(F.min("shard"), F.max("shard")).collect()[0]
    assert shards[0] >= 0 and shards[1] < PACK_SHARDS

    sums = (
        panel.groupBy("shard", "pack_id")
        .agg(F.sum("n_tokens").alias("s"), F.max("n_tokens").alias("mx"))
        .collect()
    )
    for r in sums:
        assert r.s <= PACK_BUDGET_TOKENS + r.mx, (r.shard, r.pack_id, r.s)

    rate = panel.filter("sample_keep").count() / n_docs
    assert abs(rate - PACK_SAMPLE_RATE) < 0.1, rate

    b = packing_panel(docs.repartition(13))
    assert {tuple(r) for r in panel.collect()} == {tuple(r) for r in b.collect()}
