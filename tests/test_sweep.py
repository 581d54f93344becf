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


def test_sweep_scan_count_independent_of_config_count(spark):
    """The shared-scan amortization that replaces the reference's
    per-config query storm (BASELINE.md): the number of source scans in
    the funnel plan must NOT grow with the config-grid size.  (The exact
    scan count is not asserted — CacheManager substitution and AQE change
    the rendering between runs — but a per-config scan storm would scale
    linearly with the grid.)"""
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

    def n_scans(grid) -> tuple[int, int]:
        feat = with_bar_features(
            bars_from_events(spark, SF_DIR), rolling_window=SWEEP_ROLLING
        )
        cand = sweep_candidates(
            feat, sweep_grid_to_spark(spark, grid), SWEEP_FEATURES, WARMUP
        )
        df = sweep_funnel(with_signalset_quantiles(cand))
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("FileScan parquet") + plan.count("InMemoryTableScan")

    import dataclasses

    small = default_sweep_grid()
    # 2x the configs (q1=0.51 is not in the default grid, so ids are unique)
    big = small + [dataclasses.replace(c, q1=0.51) for c in small]
    ns, nb = n_scans(small), n_scans(big)
    assert ns == nb, f"scan count grew with configs: {ns} -> {nb}"
    # the absolute count in this deliberately-unpersisted plan is a plan
    # artifact (the threshold join branches re-derive the candidate
    # subtree; the catalog persists that relation, collapsing them to one
    # materialization) — what must never happen is scans scaling with the
    # config grid, asserted above
    assert ns > 0
