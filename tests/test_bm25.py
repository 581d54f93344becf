"""BM25 retrieval scoring: oracle compare plus ranking invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from rangebar_patterns_spark.operators.textops import bm25_scores
from rangebar_patterns_spark.plans.textops_oracle import bm25_scores_sql
from rangebar_patterns_spark.sources.tables import load_table

from conftest import SF_DIR, compare_frames


def test_matches_oracle(spark, duck):
    sp = bm25_scores(load_table(spark, SF_DIR, "documents"))
    du = duck.execute(bm25_scores_sql()).df()
    compare_frames(sp, du)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_ranking_invariants(spark):
    """More query-term hits at equal length -> higher score; documents
    with zero query terms score exactly 0."""
    out = {
        r.doc_id: r
        for r in bm25_scores(
            _docs(
                spark,
                [
                    "table join window pad pad pad",   # all three terms
                    "table pad pad pad pad pad",       # one term
                    "pad pad pad pad pad pad",         # no terms
                ],
            )
        ).collect()
    }
    assert out[0].bm25 > out[1].bm25 > out[2].bm25
    assert out[2].bm25 == 0.0


def test_tf_saturation_and_length_normalization(spark):
    """BM25's two defining behaviors: repeating a term has diminishing
    returns (k1 saturation), and the same tf in a longer document scores
    lower (b length normalization)."""
    out = {
        r.doc_id: r
        for r in bm25_scores(
            _docs(
                spark,
                [
                    "table pad",
                    "table table pad",
                    "table table table pad",
                    "table pad pad pad pad pad pad pad pad pad",
                ],
            )
        ).collect()
    }
    gain1 = out[1].bm25 - out[0].bm25
    gain2 = out[2].bm25 - out[1].bm25
    assert gain1 > gain2 > 0  # concave in tf
    assert out[3].bm25 < out[0].bm25  # longer doc, same tf, lower score


def test_scores_are_partition_invariant(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = bm25_scores(docs).orderBy("doc_id").collect()
    b = bm25_scores(docs.repartition(17, "lang")).orderBy("doc_id").collect()
    assert a == b


def test_topk_matches_oracle(spark, duck):
    from rangebar_patterns_spark.operators.textops import bm25_topk
    from rangebar_patterns_spark.plans.textops_oracle import bm25_topk_sql

    sp = bm25_topk(load_table(spark, SF_DIR, "documents"))
    du = duck.execute(bm25_topk_sql()).df()
    compare_frames(sp, du)


def test_topk_shape_and_order(spark):
    from rangebar_patterns_spark.operators.textops import (
        BM25_QUERIES,
        BM25_TOPK,
        bm25_topk,
    )

    out = bm25_topk(load_table(spark, SF_DIR, "documents")).toPandas()
    for qid, grp in out.groupby("query_id"):
        assert list(grp.sort_values("rank")["rank"]) == list(
            range(1, BM25_TOPK + 1)
        )
        s = grp.sort_values("rank")["score"].tolist()
        assert s == sorted(s, reverse=True)
    assert set(out.query_id) == set(BM25_QUERIES)
