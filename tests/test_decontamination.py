"""Benchmark decontamination (n-gram overlap vs an eval set) — oracle
compare at fixture scale plus semantic invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from rangebar_patterns_spark.operators.textops import (
    BENCHMARK_MOD,
    BENCHMARK_RESIDUE,
    benchmark_overlap,
)
from rangebar_patterns_spark.plans.textops_oracle import decontamination_sql
from rangebar_patterns_spark.sources.tables import load_table

from conftest import SF_DIR, compare_frames


def _split(spark):
    docs = load_table(spark, SF_DIR, "documents")
    is_bench = F.col("doc_id") % BENCHMARK_MOD == BENCHMARK_RESIDUE
    return docs.filter(~is_bench), docs.filter(is_bench)


def test_matches_oracle(spark, duck):
    corpus, bench = _split(spark)
    sp = benchmark_overlap(corpus, bench)
    du = duck.execute(decontamination_sql()).df()
    compare_frames(sp, du)


def test_benchmark_docs_self_score_fully(spark):
    """Scoring the eval set against itself must flag every member with a
    shingle as 100% contaminated — the operator's sanity anchor."""
    _, bench = _split(spark)
    out = benchmark_overlap(bench, bench).filter(F.col("n_shingles") > 0)
    assert out.count() > 0
    assert out.filter(~F.col("is_contaminated")).count() == 0
    assert out.filter(F.col("contamination_ratio") != 1.0).count() == 0


def test_disjoint_benchmark_scores_zero(spark):
    corpus, _ = _split(spark)
    bench = corpus.sparkSession.createDataFrame(
        [("zzq xxv wwy uup ttr ssn zzq xxv wwy",)], "text string"
    )
    out = benchmark_overlap(corpus.limit(50), bench)
    assert out.filter(F.col("n_contaminated") != 0).count() == 0
