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
