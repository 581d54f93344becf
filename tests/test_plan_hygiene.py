"""Catalog-wide physical-plan guards (verify flow #5): Python may appear
only as Arrow-batched group/map pandas nodes at the sanctioned sites —
row-at-a-time ``BatchEvalPython`` is banned everywhere (AP: UDFs are the
slow path), and the W7/HMM/Laguerre Arrow passes must not leak into
entries that don't need them."""

from __future__ import annotations

from conftest import SF_DIR

#: entries whose plans legitimately contain Arrow pandas nodes
ARROW_SANCTIONED = {
    "nolookahead_thresholds",  # streaming quantile kernel
    "champion_nolookahead",
    "formation_counts",
    "temporal_yearly",
    "triple_barrier_trades",
    "barrier_mode_trades",
    "combined_barrier_metrics",
    "barrier_profile_metrics",
    "gen720_wl1d_metrics",
    "sweep_panel",
    "sweep_gen500_1008cfg",
    "sweep_gen600_fullgrid",
    "sweep_nfeature_metrics",
    "regime_labels",
    "multimodal_byte_features",
    "streaming_hourly_counts",
    # downstream consumers of the champion-trades chain (the trades
    # relation is built from the streaming-quantile featurization)
    "eval_moments_dsr", "eval_tail_tamrs",
    "cutoff_ou_panel",
    "mergeable_quantiles",  # r12: corpus-merge collapse on summary-sized input
    "eval_bootstrap_synthesis",
    "eval_spearman", "wf_fold_metrics", "wf_topk",
    "cpcv_pbo", "gt_composite_mbb", "wf_fold_objectives",
    "probe_panel", "config_skip_done",
    "sketch_distinct",  # r11: q-digest compress is a bounded applyInPandas
    "gen800_rolling_rdd", "crossasset_panel",
    "bars_adapter", "genx_hypotheses",
}


def _plans(spark):
    from rangebar_patterns_spark.plans.catalog import QUERIES

    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        yield name, df._jdf.queryExecution().executedPlan().toString()


def test_python_placement_across_catalog(spark):
    arrow_nodes = ("FlatMapGroupsInPandas", "MapInPandas", "ArrowEvalPython")
    row_udfs, leaked = [], []
    for n, p in _plans(spark):
        if "BatchEvalPython" in p:
            row_udfs.append(n)
        if any(a in p for a in arrow_nodes) and n not in ARROW_SANCTIONED:
            leaked.append(n)
    assert not row_udfs, f"row-at-a-time Python UDFs in: {row_udfs}"
    assert not leaked, f"unexpected Python in: {leaked}"


def test_scan_column_pruning(spark):
    """Projections must reach the parquet scans: the bars adapter reads
    only the event columns it uses (not user_id/props), and a narrow
    documents projection prunes to the selected columns."""
    from rangebar_patterns_spark.sources.bars import bars_from_events
    from rangebar_patterns_spark.sources.tables import load_table

    plan = (
        bars_from_events(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "user_id" not in plan and "props" not in plan

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    dplan = docs._jdf.queryExecution().executedPlan().toString()
    import re

    rs = re.search(r"ReadSchema: struct<([^>]*)>", dplan)
    assert rs is not None
    cols = {c.split(":")[0] for c in rs.group(1).split(",")}
    assert cols == {"doc_id", "n_chars"}, cols


def test_join_strategies_across_catalog(spark):
    """No unbroadcast cartesian product may appear anywhere (every
    config-grid cross join must ship the grid side), and the explicitly
    hinted dimension joins plan as broadcast: the n-gram Jaccard verify
    (shingle-array side) and the barrier-grid cross join."""
    cartesian = []
    for n, p in _plans(spark):
        if "CartesianProduct" in p:
            cartesian.append(n)
    assert not cartesian, f"unbroadcast cross joins in: {cartesian}"

    from rangebar_patterns_spark.plans.catalog import QUERIES

    jac = (
        QUERIES["dedup_neardup_pairs"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in jac, "jaccard verify should broadcast arrs"

    trades = (
        QUERIES["triple_barrier_trades"](spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in trades or "BroadcastExchange" in trades, (
        "barrier grid cross join should broadcast the grid side"
    )


#: entries allowed to carry Window nodes with an EMPTY partition spec —
#: all of them rank/scan across the config grain (~symbols × grid rows,
#: set by the grid, not the data), where a single-partition window is the
#: semantics.  A global window over bar/event grain funnels the whole
#: dataset through one task and must never appear.
#: entry -> MAX allowed unpartitioned-window count (ADVICE r5: a boolean
#: allowlist over-sanctions — several formerly listed entries now have
#: ZERO global windows, and growth within a sanctioned entry must fail
#: too).  All are config-grain relations (~symbols x grid rows).
GLOBAL_WINDOW_SANCTIONED = {
    "eval_moments_dsr": 3,  # e-BH rank + GROW ordering + fold ranks (merged e-values side)
    "eval_tail_tamrs": 2,  # TOPSIS ideal-point scalars (merged ranking side)
    "cutoff_ou_panel": 2,  # per-candidate ranking over the metric grid
    # the corpus-merge collapse: its '__all__' literal partition key is
    # constant-folded away (the q-digest precedent below) and its input
    # is the checkpointed union of per-source summaries (<= 5*MRL_M
    # weighted items) replayed per consumer — bounded at any scale
    "mergeable_quantiles": 8,
    "eval_bootstrap_synthesis": 2,  # RW config-id axis + critical value
    "eval_spearman": 6,  # 2 rank windows x 3 metric pairs
    "sketch_heavy_hitters": 1,  # rank over the 32-row top-N probe panel
    "reservoir_sample": 1,  # rank over the 64-row post-limit sample
    # the merged q-digest ground-truth cumsum: its '__all__' literal
    # partition key is constant-folded away, and the input is the value
    # histogram — bounded by the QD_U=4096 universe at ANY corpus size
    "sketch_distinct": 1,
}


def _walk_final_plan(node):
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        yield from _walk_final_plan(node.executedPlan())
        return
    if name.endswith("QueryStageExec"):
        yield from _walk_final_plan(node.plan())
        return
    yield name, node
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk_final_plan(ch.apply(i))


def test_global_windows_only_on_config_grain_entries(spark):
    """Walk every catalog entry's physical plan (cached subtrees excluded
    — their shape is pinned where they're built) and flag any Window node
    with an empty PARTITION BY outside the sanctioned config-grain set."""
    from rangebar_patterns_spark.plans.catalog import QUERIES

    leaked = []
    for name, fn in QUERIES.items():
        df = fn(spark, SF_DIR)
        n_global = sum(
            1
            for nn, node in _walk_final_plan(
                df._jdf.queryExecution().executedPlan()
            )
            if nn == "WindowExec" and node.partitionSpec().size() == 0
        )
        if n_global > GLOBAL_WINDOW_SANCTIONED.get(name, 0):
            leaked.append((name, n_global))
    assert not leaked, (
        f"unpartitioned windows above the per-entry pins: {leaked} "
        f"(update GLOBAL_WINDOW_SANCTIONED only for config-grain relations)"
    )


def test_fullgrid_funnel_plan_stays_broadcast_shaped(spark):
    """The headline sweep's consumer plan must stay: one exact-count
    threshold shuffle feeding the Arrow pass (inside the persisted
    relation), broadcast-only joins for the config fan-out, no sort-merge
    join and no cartesian anywhere.  Generous upper bounds — AQE may
    restructure details — but a config-grain shuffle or an unbroadcast
    fan-out join is exactly the regression this pins out."""
    from rangebar_patterns_spark.plans.catalog import QUERIES

    df = QUERIES["sweep_gen600_fullgrid"](spark, SF_DIR)
    df.count()
    names = [
        n for n, _ in _walk_final_plan(df._jdf.queryExecution().executedPlan())
    ]
    assert names.count("SortMergeJoinExec") == 0
    assert names.count("CartesianProductExec") == 0
    assert names.count("ShuffleExchangeExec") <= 2, names.count(
        "ShuffleExchangeExec"
    )


def test_gen800_plan_is_join_free_past_the_bar_lookup(spark):
    """The gen800 chain once self-joined against grouped copies of its
    own output three times (span bounds, ratio extremes, TOPSIS
    norms/extremes), re-evaluating the explode/window subtree per join
    side — 31 broadcast joins in the executed plan.  Pin the rewrite:
    the only join left is the exit-bar equi-join; everything grouped is
    a window aggregate over the same partition key."""
    from rangebar_patterns_spark.plans.catalog import QUERIES

    df = QUERIES["gen800_rolling_rdd"](spark, SF_DIR)
    df.count()  # resolve AQE so the final plan is the one that ran
    n_joins = sum(
        1
        for n, _ in _walk_final_plan(df._jdf.queryExecution().executedPlan())
        if n in (
            "BroadcastHashJoinExec",
            "SortMergeJoinExec",
            "ShuffledHashJoinExec",
            "BroadcastNestedLoopJoinExec",
        )
    )
    assert n_joins <= 1, f"gen800 grew {n_joins} joins (expected 1: bar lookup)"


def test_reset_plan_caches_covers_every_module_cache(spark):
    """bench.py relies on reset_plan_caches to make repeat passes cold; a
    module-level *_CACHE dict added without registering it in the reset
    list would silently turn the medians warm.  Enumerate every cache in
    the catalog namespace, plant a sentinel, and require reset to clear
    them all."""
    import rangebar_patterns_spark.plans.catalog as cat

    cache_names = [
        n
        for n, v in vars(cat).items()
        if n.endswith("_CACHE") and isinstance(v, dict)
    ]
    assert len(cache_names) >= 8, cache_names
    for n in cache_names:
        getattr(cat, n)["__sentinel__"] = None
    cat.reset_plan_caches(spark)
    stale = [n for n in cache_names if getattr(cat, n)]
    assert not stale, f"reset_plan_caches does not clear: {stale}"
