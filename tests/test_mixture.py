"""Domain-mixture reweighting: oracle compare + plan/sample invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from rangebar_patterns_spark.operators.textops import (
    MIXTURE_BUDGET_TOKENS,
    mixture_plan,
    mixture_sample,
)
from rangebar_patterns_spark.plans.textops_oracle import mixture_sample_sql
from rangebar_patterns_spark.sources.tables import load_table

from conftest import SF_DIR, compare_frames


def test_matches_oracle(spark, duck):
    docs = load_table(spark, SF_DIR, "documents")
    sp = mixture_sample(docs)
    du = duck.execute(mixture_sample_sql()).df()
    compare_frames(sp, du)


def test_plan_rates_hit_budget(spark):
    """Expected kept tokens (sum rate_s * tokens_s) lands on the budget
    up to capped sources (rate 1.0 keeps fewer than its allocation)."""
    pl = mixture_plan(load_table(spark, SF_DIR, "documents")).collect()
    assert all(0.0 <= r.sample_rate <= 1.0 for r in pl)
    expected = sum(r.sample_rate * r.n_tokens for r in pl)
    # uncapped sources alone would hit the budget exactly; caps only lose
    assert expected <= MIXTURE_BUDGET_TOKENS * 1.01
    # upweighted sources get higher rates: grouped by weight, rates rank
    by_w = {}
    for r in pl:
        by_w.setdefault(r.weight, []).append(r.sample_rate * r.n_tokens)
    means = {w: sum(v) / len(v) for w, v in by_w.items()}
    ws = sorted(means)
    assert all(means[a] <= means[b] * 1.05 for a, b in zip(ws, ws[1:]))


def test_sample_is_partition_invariant(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = {r.doc_id for r in mixture_sample(docs).collect()}
    b = {r.doc_id for r in mixture_sample(docs.repartition(17, "lang")).collect()}
    assert a == b


def test_sample_realizes_mixture(spark):
    """Deterministic: rate-1.0 sources keep every document.  Statistical
    (loose — 25-doc sources make per-source token sums very noisy): the
    corpus-total kept tokens land within a broad band of the expected
    sum, and no source keeps more docs than it has."""
    docs = load_table(spark, SF_DIR, "documents")
    pl = {r.source: r for r in mixture_plan(docs).collect()}
    got = {
        r.source: r
        for r in mixture_sample(docs)
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("t"))
        .collect()
    }
    for src, p in pl.items():
        if p.sample_rate == 1.0:
            assert got[src].n == p.n_docs, (src, "rate-1.0 must keep all")
        else:
            assert src not in got or got[src].n <= p.n_docs
    want_total = sum(p.sample_rate * p.n_tokens for p in pl.values())
    got_total = sum(r.t for r in got.values())
    assert 0.5 * want_total <= got_total <= 1.6 * want_total
