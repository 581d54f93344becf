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
    from rangebar_patterns_spark.operators.sweep import (
        default_sweep_grid,
        sweep_candidates,
        sweep_funnel,
        sweep_grid_to_spark,
        with_signalset_quantiles,
    )
    from rangebar_patterns_spark.operators.windows import with_bar_features
    from rangebar_patterns_spark.plans.catalog import SWEEP_FEATURES, SWEEP_ROLLING, WARMUP
    from rangebar_patterns_spark.sources.bars import bars_from_events

    # build the pipeline directly (uncached) so the plan rendering is
    # deterministic — the catalog variant persists its source
    feat = with_bar_features(bars_from_events(spark, SF_DIR), rolling_window=SWEEP_ROLLING)
    cand = sweep_candidates(
        feat, sweep_grid_to_spark(spark, default_sweep_grid()), SWEEP_FEATURES, WARMUP
    )
    df = sweep_funnel(with_signalset_quantiles(cand))
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("FileScan parquet")
    assert n_scans == 1, f"{n_scans} scans for 24 configs:\n{plan[:2000]}"
