"""Per-source corpus statistics vs the DuckDB twin."""

from __future__ import annotations

from rangebar_patterns_spark.operators.textops import source_stats
from rangebar_patterns_spark.plans.textops_oracle import source_stats_sql
from rangebar_patterns_spark.sources.tables import load_table

from conftest import SF_DIR, compare_frames


def test_matches_oracle(spark, duck):
    docs = load_table(spark, SF_DIR, "documents")
    sp = source_stats(docs)
    du = duck.execute(source_stats_sql()).df()
    compare_frames(sp, du)


def test_ratios_are_consistent(spark):
    docs = load_table(spark, SF_DIR, "documents")
    rows = source_stats(docs).collect()
    assert rows
    for r in rows:
        assert 0 <= r.dup_docs <= r.n_docs
        assert 0.0 <= r.mean_quality <= 1.0
