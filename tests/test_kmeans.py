"""Distributed spherical k-means for IVF training: oracle compare plus
convergence/determinism invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from rangebar_patterns_spark.operators.similarity import (
    KMEANS_ITERS,
    KMEANS_K,
    _assign,
    _kmeans_vecs,
    kmeans_assign,
    kmeans_train,
)
from rangebar_patterns_spark.plans.textops_oracle import kmeans_assign_sql
from rangebar_patterns_spark.sources.tables import load_table

from conftest import SF_DIR, compare_frames


def test_matches_oracle(spark, duck):
    sp = kmeans_assign(load_table(spark, SF_DIR, "embeddings"))
    du = duck.execute(kmeans_assign_sql()).df()
    compare_frames(sp, du)


def _mean_cos(spark, cents):
    emb = load_table(spark, SF_DIR, "embeddings")
    cdf = spark.createDataFrame(
        list(enumerate(cents)), "cid int, cv array<double>"
    )
    return (
        _assign(_kmeans_vecs(emb), cdf)
        .agg(F.avg("cos"))
        .collect()[0][0]
    )


def test_iterations_improve_fit(spark):
    """Lloyd's objective (mean assignment cosine, the spherical twin of
    -inertia) must not degrade with training."""
    emb = load_table(spark, SF_DIR, "embeddings")
    before = _mean_cos(spark, kmeans_train(emb, iters=0))
    after = _mean_cos(spark, kmeans_train(emb, iters=KMEANS_ITERS))
    assert after >= before - 1e-9
    assert after > before + 0.01  # and actually moves on this data


def test_all_clusters_populated_and_stable(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    out = kmeans_assign(emb).toPandas()
    assert out.cluster.nunique() == KMEANS_K
    assert len(out) == emb.count()
    # partition-layout invariance: same assignment after a reshuffle
    out2 = kmeans_assign(emb.repartition(13, "label")).toPandas()
    a = out.sort_values("vec_id").reset_index(drop=True)
    b = out2.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b[a.columns])


def test_parallel_seeding_deterministic_and_competitive(spark):
    """k-means‖ seeding (opt-in `seeding="parallel"`): exactly k distinct
    seeds, bit-identical across invocations (no RNG state — md5 coins +
    greedy weighted farthest-point reduction), and the trained fit is
    not worse than the default first-k seeding beyond noise (on this
    fixture the first-k seeds all come from one corner of the id space,
    so k-means‖ should match or beat them)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    c1 = kmeans_train(emb, seeding="parallel")
    c2 = kmeans_train(emb, seeding="parallel")
    assert c1 == c2
    assert len(c1) == KMEANS_K
    assert len({tuple(c) for c in c1}) == KMEANS_K
    fit_par = _mean_cos(spark, c1)
    fit_first = _mean_cos(spark, kmeans_train(emb))
    assert fit_par >= fit_first - 0.01, (fit_par, fit_first)


def test_parallel_seeding_leaves_oracle_path_untouched(spark):
    """The gate entry trains with the DEFAULT seeding — flagging must not
    change the certified configuration."""
    emb = load_table(spark, SF_DIR, "embeddings")
    assert kmeans_train(emb) == kmeans_train(emb, seeding="first_k")


def test_sample_training_deterministic_and_fixture_safe(spark):
    """Sample-trained Lloyd's (the SemDeDup production recipe): an
    over-sized cap is a no-op (byte-identical to full training — the
    certified-path guarantee), an engaged cap is deterministic across
    invocations and partition layouts, and the sampled fit stays within
    noise of the full-corpus fit at the same k."""
    emb = load_table(spark, SF_DIR, "embeddings")
    full = kmeans_train(emb, k=12)
    assert kmeans_train(emb, k=12, train_sample=10_000) == full
    assert kmeans_train(emb, k=12, train_sample=10_000, n=500) == full
    s1 = kmeans_train(emb, k=12, train_sample=200)
    s2 = kmeans_train(emb.repartition(13, "label"), k=12, train_sample=200)
    assert s1 == s2
    assert len(s1) == 12
    assert _mean_cos(spark, s1) >= _mean_cos(spark, full) - 0.05


def test_semdedup_cell_count_formula():
    """k is a pure, clamped function of corpus size: the 500-vector
    correctness fixtures land exactly on the certified k=8 quantizer;
    bigger corpora scale k ∝ n at ~SEMDEDUP_CELL vectors per cell; the
    cap bounds the broadcast centroid matrix."""
    from rangebar_patterns_spark.operators.dedup import (
        SEMDEDUP_CELL,
        SEMDEDUP_KMAX,
        semdedup_cell_count,
    )

    assert semdedup_cell_count(500) == KMEANS_K
    assert semdedup_cell_count(0) == KMEANS_K
    assert semdedup_cell_count(2000) == 2000 // SEMDEDUP_CELL
    assert semdedup_cell_count(10**9) == SEMDEDUP_KMAX


def test_semdedup_injected_cents_define_k(spark):
    """ADVICE r8 (medium): injected shared centroids must never be
    silently discarded — they DEFINE the cell count, and a conflicting
    explicit k raises instead of diverging from the paired oracle."""
    import pytest

    from rangebar_patterns_spark.operators.dedup import semantic_dedup_pairs

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = kmeans_train(emb, k=3)
    out = semantic_dedup_pairs(emb, cents=cents).toPandas()
    assert set(out.cluster.unique()) <= {0, 1, 2}
    with pytest.raises(ValueError, match="k=3"):
        semantic_dedup_pairs(emb, cents=cents, k=8)


def test_parallel_seed_degenerate_corpus_raises(spark):
    """ADVICE r8 (low): a corpus with fewer distinct vectors than k must
    raise loudly, not silently train fewer clusters."""
    import pytest

    from rangebar_patterns_spark.operators.similarity import (
        kmeans_parallel_seed,
    )

    dup = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(20)] + [(99, [0.0, 1.0])],
        "vec_id long, x array<double>",
    )
    with pytest.raises(ValueError, match="distinct"):
        kmeans_parallel_seed(dup, k=4)


def _big_embeddings(tmp_path, n=2000, dim=16, seed=7):
    """Synthetic embeddings parquet big enough that semdedup_cell_count
    derives k > KMEANS_K (n=2000 -> k=10) AND the bounded training
    sample engages (n > 32k=320) — the regime the 500-vector fixtures
    never reach."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    # plant exact clones so the semdedup verify has pairs to certify
    for i in range(0, 60, 2):
        base[i + 1] = base[i]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "label": pa.array([i % 10 for i in range(n)], pa.int64()),
            "embedding": pa.array(
                [list(map(float, r)) for r in base], pa.list_(pa.float32())
            ),
        }
    )
    path = str(tmp_path / "embeddings.parquet")
    pq.write_table(tbl, path)
    return path


def test_corpus_sized_quantizer_matches_oracle_end_to_end(spark, tmp_path):
    """VERDICT r9 #1: the DuckDB twin derives k from the SAME pure
    function of n as the engine (semdedup_cell_count) and replicates the
    bounded md5 training sample, so engine and oracle stay hash-equal
    for ANY fixture size — certified here at n=2000 (k=10 > KMEANS_K,
    sample-trained) for both the assignment relation and the semdedup
    pair output."""
    import duckdb

    from rangebar_patterns_spark.operators.dedup import (
        semantic_dedup_pairs,
        semdedup_cell_count,
    )
    from rangebar_patterns_spark.operators.similarity import (
        KMEANS_TRAIN_FACTOR,
    )
    from rangebar_patterns_spark.plans.textops_oracle import (
        semdedup_pairs_sql,
    )

    path = _big_embeddings(tmp_path)
    emb = spark.read.parquet(path)
    n = emb.count()
    k = semdedup_cell_count(n)
    assert k > KMEANS_K and n > KMEANS_TRAIN_FACTOR * k
    cents = kmeans_train(
        emb, k=k, train_sample=KMEANS_TRAIN_FACTOR * k, n=n
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{path}'"
    )
    compare_frames(
        kmeans_assign(emb, k=k, cents=cents),
        con.execute(kmeans_assign_sql()).df(),
    )
    sem = semantic_dedup_pairs(emb, cents=cents)
    du = con.execute(semdedup_pairs_sql()).df()
    assert len(du) >= 30  # the planted clones actually exercise the verify
    assert int(du.cluster.max()) > KMEANS_K - 1 or len(set(du.cluster)) > 1
    compare_frames(sem, du)
    con.close()
