"""IVF multi-probe recall property: probing more cells must not lose
neighbors (oracle value parity is covered by the catalog sweep)."""

from __future__ import annotations

from conftest import SF_DIR


def test_ivf_multiprobe_recall_nondecreasing(spark):
    from rangebar_patterns_spark.operators.similarity import (
        cosine_topk,
        label_centroid_search,
    )
    from rangebar_patterns_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    truth = {r.query_id: r.neighbor_id for r in cosine_topk(emb, k=1).collect()}
    assert truth

    def recall(nprobe: int) -> float:
        got = {
            r.query_id: r.neighbor_id
            for r in label_centroid_search(emb, nprobe=nprobe).collect()
        }
        return sum(got.get(q) == n for q, n in truth.items()) / len(truth)

    r1, r2, rall = recall(1), recall(2), recall(10)
    assert r1 <= r2 <= rall
    # probing every cell IS the brute-force scan — recall must be exact
    assert rall == 1.0
