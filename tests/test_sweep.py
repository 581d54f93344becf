"""Sweep-engine-specific checks (the oracle parity itself is covered by
test_queries_oracle's parametrized sweep over the catalog)."""

from __future__ import annotations

from rangebar_patterns_spark.plans.catalog import QUERIES

from conftest import SF_DIR


def test_sweep_funnel_counts_consistent(spark):
    """signals <= candidates, hits <= signals, and at least one config
    fires at the smallest fixture (population sanity)."""
    pdf = QUERIES["sweep_funnel"](spark, SF_DIR).toPandas()
    assert (pdf.n_signals <= pdf.n_candidates).all()
    assert (pdf.hits <= pdf.n_signals).all()
    assert pdf.n_signals.sum() > 0


def test_sweep_shares_one_bar_scan(spark):
    """The whole 24-config funnel must read the events parquet exactly
    once — the shared-scan amortization that replaces the reference's
    per-config query storm (BASELINE.md)."""
    df = QUERIES["sweep_funnel"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("FileScan parquet") + plan.count("Scan parquet [")
    n_configs = 24
    # the exact count varies with caching/AQE plan rendering, but it must
    # never scale with the config count (the reference re-scans per config)
    assert 0 < n_scans < 4, f"{n_scans} scans for {n_configs} configs:\n{plan}"
