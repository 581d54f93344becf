"""duplicate_clusters unit vectors: multi-hop chains must converge to one
component (the property the per-pair relation alone doesn't give you)."""

from __future__ import annotations


def test_chain_and_island(spark):
    from rangebar_patterns_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (6, 5), (9, 8)],
        "doc_a long, doc_b long",
    )
    got = {
        r.doc_id: (r.cluster_rep, r.is_rep, r.cluster_size)
        for r in duplicate_clusters(pairs).collect()
    }
    assert got == {
        1: (1, True, 4),
        2: (1, False, 4),
        3: (1, False, 4),
        4: (1, False, 4),
        5: (5, True, 2),
        6: (5, False, 2),
        8: (8, True, 2),
        9: (8, False, 2),
    }


def test_deep_chain_multi_partition(spark):
    """A 9-hop chain (diameter 9 > 3 rounds) must still converge to one
    component with a non-1 partition count — the scale configuration."""
    from rangebar_patterns_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 10)], "doc_a long, doc_b long"
    )
    rows = duplicate_clusters(pairs, num_partitions=4).collect()
    assert {r.cluster_rep for r in rows} == {1}
    assert all(r.cluster_size == 10 for r in rows)
    assert sum(r.is_rep for r in rows) == 1


def test_non_convergence_raises(spark):
    import pytest

    from rangebar_patterns_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(pairs, max_iter=1)


def test_triangle_single_round(spark):
    from rangebar_patterns_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (10, 12)], "doc_a long, doc_b long"
    )
    rows = duplicate_clusters(pairs).collect()
    assert {r.cluster_rep for r in rows} == {10}
    assert all(r.cluster_size == 3 for r in rows)
