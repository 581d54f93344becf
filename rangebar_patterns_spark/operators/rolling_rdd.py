"""gen800: rolling calendar-window Return/Drawdown-ratio distributions +
TOPSIS cross-asset ranking (reference scripts/gen800_rolling_rdd.py).

The reference loads per-config trade JSONL, slides a 90-calendar-day
window in 1-day steps over trade *exit* timestamps (range bars are not
time-uniform — windows must be calendar-time, the E28 semantic), computes
each window's total return / max-drawdown ratio, summarizes the per-asset
ratio DISTRIBUTION, and TOPSIS-ranks assets on (median, p10, frac>2,
frac<1) with weights (.35, .30, .20, .15) where frac<1 is a cost
criterion (gen800_rolling_rdd.py:108-186, 260-276; eval/ranking.py:
333-367 topsis_rank).

Spark-first shape — no driver loops, no Python kernels:

* window membership is integer-ms arithmetic: each trade's covering
  window indices form a contiguous ``[k_lo, k_hi]`` range (window W ms,
  step S ms ⇒ ≤ W/S windows per trade), exploded JVM-side with
  ``sequence()`` — the relation is (trades × W/S) rows, NOT
  (windows × trades);
* per-window drawdown is a running cumsum/running-max over an explicit
  ROWS window ordered by (exit, signal_rn) — evaluated as a sequential
  left fold in both engines, matching numpy's cumsum/accumulate scan,
  and (unlike ordered list aggregates, which the DuckDB twin cannot do
  robustly under memory-pressure spills) immune to aggregate merge
  order;
* distribution moments and TOPSIS L2 norms are exact integer-scaled
  sums (ratios/criteria are rounded-4, so ×1e4 scaling is exact and the
  integer sums are associative → merge-order-free in both engines);
* distribution percentiles use explicit type-7 interpolation over the
  sorted ratio values (both engines pick the same two elements and
  evaluate the same expression — no engine-internal percentile
  kernels);
* TOPSIS is the same grouped column algebra as E15/E16
  (eval_metrics.ranking_survivors), generalized to weights + cost
  criteria.

Scale: bounded per-asset state (windows ≈ span/step rows; the return
array per window ≤ trades-in-window); everything shuffles on the asset
key exactly once per stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


DAY_MS = 86_400_000

#: reference constants (gen800_rolling_rdd.py:34-39)
GEN800_WINDOW_DAYS = 90
GEN800_STEP_DAYS = 1
GEN800_MIN_TRADES = 5
GEN800_RATIO_CAP = 50.0
GEN800_MIN_VALID_WINDOWS = 10

#: TOPSIS spec (gen800_rolling_rdd.py:255-262): criterion → (weight, type)
GEN800_CRITERIA = [
    ("median_ratio", 0.35, 1),
    ("p10_ratio", 0.30, 1),
    ("frac_gt_2", 0.20, 1),
    ("frac_lt_1", 0.15, -1),
]


def with_exit_ts(trades: DataFrame, bars: DataFrame) -> DataFrame:
    """Attach the exit bar's close time: exit happens on forward bar
    ``exit_bar``, i.e. row ``signal_rn + 1 + exit_bar`` (barriers.py
    forward-index convention) — an equi-join against the bar table."""
    b = bars.select(
        "symbol", F.col("rn").alias("_xrn"), F.col("close_time_ms").alias("exit_ts_ms")
    )
    return trades.withColumn(
        "_xrn", F.col("signal_rn") + 1 + F.col("exit_bar")
    ).join(b, ["symbol", "_xrn"]).drop("_xrn")


def rolling_rdd_windows(
    trades: DataFrame,
    keys: list[str] | None = None,
    window_days: int = GEN800_WINDOW_DAYS,
    step_days: int = GEN800_STEP_DAYS,
    min_trades: int = GEN800_MIN_TRADES,
    ratio_cap: float = GEN800_RATIO_CAP,
) -> DataFrame:
    """Per-asset rolling-window return/drawdown rows
    (gen800_rolling_rdd.py:110-186 build_window_boundaries +
    compute_rolling_rdd): windows end at ``earliest_exit + window + k·step``
    for k = 0.. while ≤ latest exit; a single (earliest, latest) window
    when the span is shorter than the window; membership is
    w_start ≤ exit ≤ w_end (bisect_left/right inclusive bounds); windows
    with fewer than ``min_trades`` trades are dropped; ratio =
    total/maxdd capped at ``ratio_cap``, = cap when maxdd ≈ 0 with
    positive total, else 0.  total/maxdd are rounded to 6 decimals before
    the ratio branch (cross-engine float-sum convention), ratio to 4
    (reference rounding)."""
    g = keys or ["symbol", "barrier_id"]
    W = F.lit(window_days * DAY_MS)
    S = F.lit(step_days * DAY_MS)
    ex = F.col("exit_ts_ms")
    # per-asset span as whole-partition window aggregates, NOT a self-join
    # against a grouped copy: the trades subtree (itself a bar join over
    # the barrier sim) would otherwise be evaluated once per side, and
    # every downstream self-join would double it again
    wg = Window.partitionBy(*g)
    t = trades.withColumn("_earliest", F.min(ex).over(wg)).withColumn(
        "_latest", F.max(ex).over(wg)
    )
    first_end = F.col("_earliest") + W
    single = first_end > F.col("_latest")
    # ms magnitudes < 2^53: double division is exact enough that
    # floor/ceil land correctly (true quotients are ≥ 1/S away from the
    # nearest integer when not integral) — same expression in the twin
    kmax = F.floor((F.col("_latest") - first_end).cast("double") / S)
    k_lo = F.when(single, F.lit(0)).otherwise(
        F.greatest(F.lit(0).cast("long"), F.ceil((ex - first_end).cast("double") / S))
    )
    k_hi = F.when(single, F.lit(0)).otherwise(
        F.least(kmax, F.floor((ex + W - first_end).cast("double") / S))
    )
    # a trade exiting after the last full window's end (w_end_kmax <
    # exit ≤ latest) belongs to no window — the reference's boundary loop
    # stops at w_end ≤ latest; guard before sequence() (which would
    # otherwise generate a DESCENDING range)
    t = (
        t.withColumn("_klo", k_lo.cast("long"))
        .withColumn("_khi", k_hi.cast("long"))
        .filter(F.col("_klo") <= F.col("_khi"))
        .withColumn("k", F.explode(F.sequence(F.col("_klo"), F.col("_khi"))))
        .drop("_klo", "_khi")
    )
    t = t.withColumn(
        "w_start_ms",
        F.when(single, F.col("_earliest")).otherwise(first_end + F.col("k") * S - W),
    ).withColumn(
        "w_end_ms",
        F.when(single, F.col("_latest")).otherwise(first_end + F.col("k") * S),
    )
    # running cumsum / running max over an explicit ROWS window ordered by
    # (exit, signal_rn): the cumulative frame is evaluated as a sequential
    # left fold in BOTH engines (bit-identical association), and — unlike
    # an ordered list aggregate — window ordering is part of the operator
    # spec, immune to parallel/spilling aggregate-merge order (a DuckDB
    # in-aggregate ORDER BY was observed to break under memory pressure)
    wcum = (
        Window.partitionBy(*g, "k")
        .orderBy("exit_ts_ms", "signal_rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = (
        t.withColumn("_cum", F.sum("return_pct").over(wcum))
        .withColumn("_runmax", F.max("_cum").over(wcum))
        .withColumn(
            "_tn",
            F.row_number().over(
                Window.partitionBy(*g, "k").orderBy("exit_ts_ms", "signal_rn")
            ),
        )
        .withColumn("_cnt", F.count("*").over(Window.partitionBy(*g, "k")))
    )
    grouped = t.groupBy(*g, "k", "w_start_ms", "w_end_ms").agg(
        F.count("*").alias("n_trades"),
        # total = the running sum at the last trade (sequential fold, not
        # a merge-order-dependent float re-aggregation)
        F.round(
            F.max(F.when(F.col("_tn") == F.col("_cnt"), F.col("_cum"))), 6
        ).alias("total_return"),
        F.round(F.max(F.col("_runmax") - F.col("_cum")), 6).alias("max_drawdown"),
    )
    out = grouped
    ratio = (
        F.when(
            F.col("max_drawdown") > 1e-12,
            F.least(
                F.col("total_return") / F.col("max_drawdown"), F.lit(ratio_cap)
            ),
        )
        .when(F.col("total_return") > 0, F.lit(ratio_cap))
        .otherwise(F.lit(0.0))
    )
    return (
        out.withColumn("return_dd_ratio", F.round(ratio, 4))
        .filter(F.col("n_trades") >= min_trades)
    )


def _pctl(arr: Column, q: float) -> Column:
    """Explicit type-7 (numpy linear) percentile over a sorted-ascending
    array — 1-based element_at; identical expression in the DuckDB twin."""
    n = F.size(arr)
    h = (n - 1).cast("double") * F.lit(q)
    lo = F.floor(h).cast("int")
    gfrac = h - lo.cast("double")
    a = F.element_at(arr, lo + 1)
    b = F.element_at(arr, F.least(lo + F.lit(2), n))
    return a + (b - a) * gfrac


def rdd_distribution_stats(
    windows: DataFrame,
    keys: list[str] | None = None,
    min_valid_windows: int = GEN800_MIN_VALID_WINDOWS,
) -> DataFrame:
    """Per-asset ratio-distribution summary
    (gen800_rolling_rdd.py:190-246 compute_distribution_stats): moments,
    explicit type-7 percentiles, threshold fractions, argmin/argmax
    windows (first occurrence on ties, like np.argmin — tie-broken by
    window index), CV when mean > 1e-6.  Assets with fewer than
    ``min_valid_windows`` qualifying windows are dropped (the reference
    marks them insufficient_data and excludes them from ranking)."""
    g = keys or ["symbol", "barrier_id"]
    r = F.col("return_dd_ratio")
    sorted_r = F.array_sort(F.collect_list(r))
    # argmin/argmax (np.argmin/argmax = FIRST extreme): w_start_ms is
    # strictly monotone in the window index, so "first window at the
    # extreme ratio" is min(w_start) over the windows at the extreme.
    # Lexicographic struct min/max gets both in ONE aggregate pass — no
    # self-join against a grouped copy of the windows relation (which
    # would evaluate the whole explode/window subtree twice):
    #   min (r, ws)  → (min r, min ws among ties)      = first worst
    #   max (r, -ws) → (max r, max -ws = min ws among ties) = first best
    # min/max over a total order are associative → merge-order-free in
    # both engines (unlike ordered-list formulations, which the DuckDB
    # twin cannot do robustly under memory-pressure spills).
    ws = F.col("w_start_ms")
    worst = F.min(F.struct(r.alias("r"), ws.alias("ws")))
    best = F.max(F.struct(r.alias("r"), (-ws).alias("nws")))
    agg = windows.groupBy(g).agg(
        worst.alias("_worst"),
        best.alias("_best"),
        F.count("*").alias("n_windows"),
        F.sum("n_trades").alias("n_trades_total"),
        sorted_r.alias("_sr"),
        # ratios are rounded-4, so scaling by 1e4 gives EXACT integers —
        # integer sums are associative, hence merge-order-free in both
        # engines (the float-fold alternative relies on ordered list
        # aggregation, which the twin cannot do robustly under spills).
        # Squares run in DECIMAL: the ratio is unbounded BELOW (the
        # reference caps only the positive side), so an int64/double
        # square of the scaled value can overflow 2^53 for deep-loss
        # windows; decimal×decimal stays exact in both engines.
        F.sum(F.round(r * 10000).cast("long")).alias("_sum_sc"),
        F.sum(
            F.round(r * 10000).cast("decimal(12,0)")
            * F.round(r * 10000).cast("decimal(12,0)")
        ).alias("_sumsq_sc"),
        F.sum(F.when(r > 2.0, 1).otherwise(0)).alias("_n_gt2"),
        F.sum(F.when(r > 1.0, 1).otherwise(0)).alias("_n_gt1"),
        F.sum(F.when(r < 1.0, 1).otherwise(0)).alias("_n_lt1"),
        F.sum(F.when(r < 0.0, 1).otherwise(0)).alias("_n_neg"),
    )
    n = F.col("n_windows").cast("double")
    mean = F.col("_sum_sc").cast("double") / (F.lit(10000.0) * n)
    var = F.greatest(
        F.lit(0.0),
        F.col("_sumsq_sc").cast("double") / (F.lit(100000000.0) * n) - mean * mean,
    )
    out = agg.select(
        *g,
        "n_windows",
        "n_trades_total",
        F.round(_pctl(F.col("_sr"), 0.5), 4).alias("median_ratio"),
        F.round(mean, 4).alias("mean_ratio"),
        F.round(F.sqrt(var), 4).alias("std_ratio"),
        F.round(_pctl(F.col("_sr"), 0.10), 4).alias("p10_ratio"),
        F.round(_pctl(F.col("_sr"), 0.25), 4).alias("p25_ratio"),
        F.round(_pctl(F.col("_sr"), 0.75), 4).alias("p75_ratio"),
        F.round(_pctl(F.col("_sr"), 0.90), 4).alias("p90_ratio"),
        F.element_at(F.col("_sr"), 1).alias("min_ratio"),
        F.element_at(F.col("_sr"), F.size(F.col("_sr"))).alias("max_ratio"),
        F.round(F.col("_n_gt2") / n, 4).alias("frac_gt_2"),
        F.round(F.col("_n_gt1") / n, 4).alias("frac_gt_1"),
        F.round(F.col("_n_lt1") / n, 4).alias("frac_lt_1"),
        F.round(F.col("_n_neg") / n, 4).alias("frac_negative"),
        F.col("_worst.ws").alias("worst_window_start_ms"),
        F.col("_worst.r").alias("worst_window_ratio"),
        (-F.col("_best.nws")).alias("best_window_start_ms"),
        F.col("_best.r").alias("best_window_ratio"),
    ).filter(F.col("n_windows") >= min_valid_windows)
    cv = F.when(
        F.col("mean_ratio") > 1e-6,
        F.round(F.col("std_ratio") / F.col("mean_ratio"), 4),
    ).otherwise(F.lit(None).cast("double"))
    return out.withColumn("ratio_cv", cv)


def rdd_topsis_rank(
    stats: DataFrame,
    group_col: str = "barrier_id",
    asset_col: str = "symbol",
) -> DataFrame:
    """Weighted TOPSIS with cost criteria per config group (reference
    eval/ranking.py:333-367 topsis_rank; criteria/weights
    gen800_rolling_rdd.py:255-262): L2 column norms (integer-scaled exact
    sums; 0 → 1), weighted normalized matrix, ideal/nadir per criterion type,
    closeness coefficient (0 when both distances are 0), ranked by
    rounded score desc with the asset key as the stable tie-break (the
    reference sorts rounded scores over sorted asset keys)."""
    crit = GEN800_CRITERIA
    # criteria are rounded-4 values: L2 norms via exact integer-scaled
    # squares (merge-order-free, identical arithmetic in the twin).
    # Norms and per-group extremes are whole-partition window aggregates
    # over the config group — NOT self-joins against grouped copies of
    # ``stats``, which would re-evaluate the entire upstream windows
    # subtree once per join side.  One exchange on the group key serves
    # every window below.
    wg = Window.partitionBy(group_col)
    t = stats
    for c, _, _ in crit:
        t = t.withColumn(
            f"_norm_{c}",
            F.sqrt(
                F.sum(
                    F.round(F.col(c) * 10000).cast("decimal(12,0)")
                    * F.round(F.col(c) * 10000).cast("decimal(12,0)")
                )
                .over(wg)
                .cast("double")
                / F.lit(100000000.0)
            ),
        )
    for c, w, _ in crit:
        nz = F.when(F.col(f"_norm_{c}") == 0.0, F.lit(1.0)).otherwise(
            F.col(f"_norm_{c}")
        )
        t = t.withColumn(f"_w_{c}", F.col(c) / nz * F.lit(w))
    for c, _, _ in crit:
        t = t.withColumn(f"_max_{c}", F.max(f"_w_{c}").over(wg)).withColumn(
            f"_min_{c}", F.min(f"_w_{c}").over(wg)
        )
    d_pos = None
    d_neg = None
    for c, _, typ in crit:
        ideal = F.col(f"_max_{c}") if typ == 1 else F.col(f"_min_{c}")
        nadir = F.col(f"_min_{c}") if typ == 1 else F.col(f"_max_{c}")
        tp = (F.col(f"_w_{c}") - ideal) * (F.col(f"_w_{c}") - ideal)
        tn = (F.col(f"_w_{c}") - nadir) * (F.col(f"_w_{c}") - nadir)
        d_pos = tp if d_pos is None else d_pos + tp
        d_neg = tn if d_neg is None else d_neg + tn
    score = F.when(
        F.sqrt(d_pos) + F.sqrt(d_neg) == 0.0, F.lit(0.0)
    ).otherwise(F.sqrt(d_neg) / (F.sqrt(d_pos) + F.sqrt(d_neg)))
    t = t.withColumn("topsis_score", F.round(score, 4))
    rank = F.row_number().over(
        Window.partitionBy(group_col).orderBy(
            F.col("topsis_score").desc(), F.col(asset_col).asc()
        )
    )
    keep = [c for c in stats.columns]
    return t.select(*keep, "topsis_score").withColumn("rank", rank)
