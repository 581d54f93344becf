"""gen06/gen07/gen08 hypothesis-screen families (P3 predicate shapes +
A1 countIf + A7 hypothesis columns).

The reference runs three fixed batteries of lagged-microstructure
hypotheses per symbol shard — lookback patterns (sql/gen06_lookback.sql),
mean-reversion shapes (sql/gen07_meanrev.sql) and divergence/alignment
combos (sql/gen08_divergence.sql) — each combo a countIf pair
(signal_count, hits) over a lag relation, with global trade-intensity /
OFI percentile thresholds.

Two deliberate normalizations, mirrored in the DuckDB twin:

* lag convention — the reference evaluates each combo on the outcome bar
  (predicates over ``*_1..*_4`` lags, outcome = that bar's ``direction``);
  here predicates sit on the last *pattern* bar (the engine-wide AP-15
  convention) with outcome ``next_dir``, i.e. every reference lag k
  becomes lag k-1.  Identical rows, one bar of relabeling.
* percentile estimator — the reference's ClickHouse ``quantile()`` is a
  sampling estimator (nondeterministic at scale); we pin the exact
  type-6 quantileExactExclusive convention used engine-wide
  (functions/quantiles.py).

Hypotheses are *data* (one registry row each, SQL predicate text shared
verbatim by the Spark plan via ``F.expr`` and the DuckDB twin), so the
whole battery is ONE scan + ONE per-symbol aggregate: 3 conditional
aggregates per combo, unpivoted to the long hypothesis-row format.  At
100 TB the scan dominates and everything here is map-side combinable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.quantiles import duck_q6_expr, q6_from_sorted_array

#: per-symbol global percentile columns the predicates may reference
PCT_COLS: dict[str, tuple[str, float]] = {
    "ti_p90": ("trade_intensity", 0.90),
    "ti_p95": ("trade_intensity", 0.95),
    "ofi_p10": ("ofi", 0.10),
    "ofi_p90": ("ofi", 0.90),
}


@dataclass(frozen=True)
class Hypothesis:
    """One gen06/07/08 combo: predicate text over the lag relation."""

    family: str  # "gen06" | "gen07" | "gen08"
    name: str
    n_features: int
    side: str  # "long" | "short"
    lookback: int
    guard: str  # population WHERE (the reference's per-combo guard)
    cond: str  # signal predicate (evaluated guard AND cond)


# reference lag k -> our lag k-1: trade_intensity/kyle_lambda_proxy/ofi/
# direction are the current (last-pattern) bar; ti_1.., kyle_1, ofi_1,
# dir_1..dir_3 the earlier pattern bars; outcome is next_dir
HYPOTHESES: list[Hypothesis] = [
    # --- gen06: lookback patterns (sql/gen06_lookback.sql) ---
    Hypothesis("gen06", "ti_p95_lag2_kyle_gt_0_lag1", 2, "long", 2,
               "ti_1 IS NOT NULL", "ti_1 > ti_p95 AND kyle_lambda_proxy > 0"),
    Hypothesis("gen06", "ti_p90_lag2_AND_ti_p90_lag1", 2, "long", 2,
               "ti_1 IS NOT NULL", "ti_1 > ti_p90 AND trade_intensity > ti_p90"),
    Hypothesis("gen06", "kyle_gt_0_lag2_AND_kyle_gt_0_lag1", 2, "long", 2,
               "kyle_1 IS NOT NULL", "kyle_1 > 0 AND kyle_lambda_proxy > 0"),
    Hypothesis("gen06", "ofi_gt_0_lag2_AND_ofi_gt_0_lag1", 2, "long", 2,
               "ofi_1 IS NOT NULL", "ofi_1 > 0 AND ofi > 0"),
    Hypothesis("gen06", "kyle_reversal_neg_to_pos", 2, "long", 2,
               "kyle_1 IS NOT NULL", "kyle_1 < 0 AND kyle_lambda_proxy > 0"),
    Hypothesis("gen06", "kyle_reversal_pos_to_neg", 2, "short", 2,
               "kyle_1 IS NOT NULL", "kyle_1 > 0 AND kyle_lambda_proxy < 0"),
    Hypothesis("gen06", "ti_p90_3bar_streak", 3, "long", 3,
               "ti_2 IS NOT NULL",
               "ti_2 > ti_p90 AND ti_1 > ti_p90 AND trade_intensity > ti_p90"),
    Hypothesis("gen06", "dir_up_2bar_ti_p90", 3, "long", 2,
               "dir_1 IS NOT NULL",
               "dir_1 = 1 AND direction = 1 AND trade_intensity > ti_p90"),
    Hypothesis("gen06", "dir_down_2bar_ti_p90", 3, "short", 2,
               "dir_1 IS NOT NULL",
               "dir_1 = 0 AND direction = 0 AND trade_intensity > ti_p90"),
    Hypothesis("gen06", "ti_p95_lag1_dir_up_lag1", 2, "long", 1,
               "trade_intensity IS NOT NULL",
               "trade_intensity > ti_p95 AND direction = 1"),
    Hypothesis("gen06", "ti_p95_lag1_dir_down_lag1", 2, "short", 1,
               "trade_intensity IS NOT NULL",
               "trade_intensity > ti_p95 AND direction = 0"),
    # --- gen07: mean reversion (sql/gen07_meanrev.sql) ---
    Hypothesis("gen07", "meanrev_2up_short", 1, "short", 2,
               "dir_1 IS NOT NULL", "dir_1 = 1 AND direction = 1"),
    Hypothesis("gen07", "meanrev_2down_long", 1, "long", 2,
               "dir_1 IS NOT NULL", "dir_1 = 0 AND direction = 0"),
    Hypothesis("gen07", "meanrev_3up_short", 1, "short", 3,
               "dir_2 IS NOT NULL", "dir_2 = 1 AND dir_1 = 1 AND direction = 1"),
    Hypothesis("gen07", "meanrev_3down_long", 1, "long", 3,
               "dir_2 IS NOT NULL", "dir_2 = 0 AND dir_1 = 0 AND direction = 0"),
    Hypothesis("gen07", "meanrev_4up_short", 1, "short", 4,
               "dir_3 IS NOT NULL",
               "dir_3 = 1 AND dir_2 = 1 AND dir_1 = 1 AND direction = 1"),
    Hypothesis("gen07", "meanrev_4down_long", 1, "long", 4,
               "dir_3 IS NOT NULL",
               "dir_3 = 0 AND dir_2 = 0 AND dir_1 = 0 AND direction = 0"),
    Hypothesis("gen07", "meanrev_2up_ti_p90_short", 2, "short", 2,
               "dir_1 IS NOT NULL",
               "dir_1 = 1 AND direction = 1 AND trade_intensity > ti_p90"),
    Hypothesis("gen07", "meanrev_2down_ti_p90_long", 2, "long", 2,
               "dir_1 IS NOT NULL",
               "dir_1 = 0 AND direction = 0 AND trade_intensity > ti_p90"),
    Hypothesis("gen07", "meanrev_2up_kyle_lt_0_short", 2, "short", 2,
               "dir_1 IS NOT NULL",
               "dir_1 = 1 AND direction = 1 AND kyle_lambda_proxy < 0"),
    Hypothesis("gen07", "meanrev_2down_kyle_gt_0_long", 2, "long", 2,
               "dir_1 IS NOT NULL",
               "dir_1 = 0 AND direction = 0 AND kyle_lambda_proxy > 0"),
    Hypothesis("gen07", "single_up_short", 1, "short", 1,
               "direction IS NOT NULL", "direction = 1"),
    Hypothesis("gen07", "single_down_long", 1, "long", 1,
               "direction IS NOT NULL", "direction = 0"),
    # --- gen08: divergence / alignment / exhaustion (sql/gen08_divergence.sql) ---
    Hypothesis("gen08", "divergence_ofi_pos_kyle_neg", 2, "short", 1,
               "ofi IS NOT NULL", "ofi > 0 AND kyle_lambda_proxy < 0"),
    Hypothesis("gen08", "divergence_ofi_neg_kyle_pos", 2, "long", 1,
               "ofi IS NOT NULL", "ofi < 0 AND kyle_lambda_proxy > 0"),
    Hypothesis("gen08", "intensity_no_conviction_long", 2, "long", 1,
               "trade_intensity IS NOT NULL",
               "trade_intensity > ti_p90 AND abs(kyle_lambda_proxy) < 0.0001"),
    Hypothesis("gen08", "combo_2down_ti_p95_kyle_gt_0_long", 4, "long", 2,
               "dir_1 IS NOT NULL",
               "dir_1 = 0 AND direction = 0 AND trade_intensity > ti_p95"
               " AND kyle_lambda_proxy > 0"),
    Hypothesis("gen08", "combo_2down_ti_p90_kyle_gt_0_long", 4, "long", 2,
               "dir_1 IS NOT NULL",
               "dir_1 = 0 AND direction = 0 AND trade_intensity > ti_p90"
               " AND kyle_lambda_proxy > 0"),
    Hypothesis("gen08", "extreme_ofi_ti_long", 2, "long", 1,
               "ofi IS NOT NULL", "ofi > ofi_p90 AND trade_intensity > ti_p90"),
    Hypothesis("gen08", "extreme_ofi_neg_ti_short", 2, "short", 1,
               "ofi IS NOT NULL", "ofi < ofi_p10 AND trade_intensity > ti_p90"),
    Hypothesis("gen08", "triple_alignment_long", 3, "long", 1,
               "ofi IS NOT NULL",
               "ofi > 0 AND kyle_lambda_proxy > 0 AND direction = 1"),
    Hypothesis("gen08", "triple_alignment_short", 3, "short", 1,
               "ofi IS NOT NULL",
               "ofi < 0 AND kyle_lambda_proxy < 0 AND direction = 0"),
    Hypothesis("gen08", "exhaustion_up_kyle_neg_short", 2, "short", 1,
               "direction IS NOT NULL", "direction = 1 AND kyle_lambda_proxy < 0"),
    Hypothesis("gen08", "exhaustion_down_kyle_pos_long", 2, "long", 1,
               "direction IS NOT NULL", "direction = 0 AND kyle_lambda_proxy > 0"),
]


def _lagged(bars: DataFrame) -> DataFrame:
    """The lag relation both engines aggregate over (per-symbol order by
    rn): direction + ti/kyle/ofi lags + next-bar outcome."""
    w = Window.partitionBy("symbol").orderBy("rn")
    d = bars.withColumn(
        "direction", F.when(F.col("close") > F.col("open"), 1).otherwise(0)
    )
    d = (
        d.withColumn("ti_1", F.lag("trade_intensity", 1).over(w))
        .withColumn("ti_2", F.lag("trade_intensity", 2).over(w))
        .withColumn("kyle_1", F.lag("kyle_lambda_proxy", 1).over(w))
        .withColumn("ofi_1", F.lag("ofi", 1).over(w))
        .withColumn("dir_1", F.lag("direction", 1).over(w))
        .withColumn("dir_2", F.lag("direction", 2).over(w))
        .withColumn("dir_3", F.lag("direction", 3).over(w))
        .withColumn("next_dir", F.lead("direction", 1).over(w))
    )
    return d


def _percentiles(bars: DataFrame) -> DataFrame:
    """Per-symbol global thresholds (exact type-6; see module docstring)."""
    aggs = [
        q6_from_sorted_array(
            F.sort_array(
                F.filter(F.collect_list(src), lambda x: x.isNotNull())
            ),
            p,
        ).alias(out)
        for out, (src, p) in PCT_COLS.items()
    ]
    return bars.groupBy("symbol").agg(*aggs)


def hypothesis_screen(bars: DataFrame) -> DataFrame:
    """All 34 gen06/07/08 combos as one scan + one per-symbol aggregate,
    unpivoted to the reference's hypothesis-row format."""
    lp = _lagged(bars).join(F.broadcast(_percentiles(bars)), "symbol")

    aggs = []
    for i, h in enumerate(HYPOTHESES):
        # outcome-bar semantics: the reference evaluates predicates on the
        # outcome bar, so every counted row has an outcome — require
        # next_dir on the relabelled relation too (exact row equivalence)
        g = F.expr(h.guard) & F.col("next_dir").isNotNull()
        c = g & F.expr(h.cond)
        want = F.lit(1) if h.side == "long" else F.lit(0)
        hit = c & (F.col("next_dir") == want)
        aggs.append(F.sum(F.when(g, 1).otherwise(0)).alias(f"_t{i}"))
        aggs.append(F.sum(F.when(c, 1).otherwise(0)).alias(f"_s{i}"))
        aggs.append(F.sum(F.when(hit, 1).otherwise(0)).alias(f"_h{i}"))
    wide = lp.groupBy("symbol").agg(*aggs)

    rows = F.array(
        *[
            F.struct(
                F.lit(h.family).alias("family"),
                F.lit(h.name).alias("combo_name"),
                F.lit(h.n_features).cast("int").alias("n_features"),
                F.lit(h.side).alias("signal_type"),
                F.lit(h.lookback).cast("int").alias("lookback_bars"),
                F.col(f"_t{i}").alias("total_bars"),
                F.col(f"_s{i}").alias("signal_count"),
                F.col(f"_h{i}").alias("hits"),
            )
            for i, h in enumerate(HYPOTHESES)
        ]
    )
    long = (
        wide.select("symbol", F.explode(rows).alias("r"))
        .select("symbol", "r.*")
        # the twin's `WHERE guard GROUP BY symbol` omits (symbol, combo)
        # groups whose guard matched zero rows; mirror that here
        .filter(F.col("total_bars") > 0)
    )
    sc = F.nullif(F.col("signal_count").cast("double"), F.lit(0.0))
    hit_rate = F.col("hits") / sc
    return (
        long.withColumn("hit_rate", hit_rate)
        .withColumn("edge_pct", hit_rate - 0.5)
        .withColumn("z_score", (hit_rate - 0.5) / F.sqrt(F.lit(0.25) / sc))
    )


def hypothesis_screen_oracle(bars_relation: str = "bars") -> str:
    """DuckDB twin: lag CTE + exact percentile CTE + one UNION ALL block
    per combo (the reference's per-combo SELECT shape)."""
    pct_cols = ",\n        ".join(
        f"{duck_q6_expr(f'list({src})', p)} AS {out}"
        for out, (src, p) in PCT_COLS.items()
    )
    blocks = []
    for h in HYPOTHESES:
        want = 1 if h.side == "long" else 0
        guard = f"({h.guard}) AND next_dir IS NOT NULL"
        hit = f"({h.cond}) AND next_dir = {want}"
        blocks.append(f"""SELECT symbol,
    '{h.family}' AS family, '{h.name}' AS combo_name,
    CAST({h.n_features} AS INT) AS n_features,
    '{h.side}' AS signal_type, CAST({h.lookback} AS INT) AS lookback_bars,
    CAST(count(*) AS BIGINT) AS total_bars,
    CAST(sum(CASE WHEN {h.cond} THEN 1 ELSE 0 END) AS BIGINT) AS signal_count,
    CAST(sum(CASE WHEN {hit} THEN 1 ELSE 0 END) AS BIGINT) AS hits,
    sum(CASE WHEN {hit} THEN 1 ELSE 0 END)
        / nullif(CAST(sum(CASE WHEN {h.cond} THEN 1 ELSE 0 END) AS DOUBLE), 0.0)
        AS hit_rate,
    sum(CASE WHEN {hit} THEN 1 ELSE 0 END)
        / nullif(CAST(sum(CASE WHEN {h.cond} THEN 1 ELSE 0 END) AS DOUBLE), 0.0)
        - 0.5 AS edge_pct,
    (sum(CASE WHEN {hit} THEN 1 ELSE 0 END)
        / nullif(CAST(sum(CASE WHEN {h.cond} THEN 1 ELSE 0 END) AS DOUBLE), 0.0)
        - 0.5)
        / sqrt(0.25 / nullif(CAST(sum(CASE WHEN {h.cond} THEN 1 ELSE 0 END) AS DOUBLE), 0.0))
        AS z_score
FROM lp WHERE {guard}
GROUP BY symbol""")
        # the guard is re-applied inside cond via AND in the Spark plan;
        # textual twin keeps WHERE guard so total_bars matches countIf
    unions = "\nUNION ALL\n".join(blocks)
    return f"""lagged AS (
    SELECT symbol, rn, trade_intensity, kyle_lambda_proxy, ofi,
        CASE WHEN close > open THEN 1 ELSE 0 END AS direction,
        lag(trade_intensity, 1) OVER w AS ti_1,
        lag(trade_intensity, 2) OVER w AS ti_2,
        lag(kyle_lambda_proxy, 1) OVER w AS kyle_1,
        lag(ofi, 1) OVER w AS ofi_1,
        lag(CASE WHEN close > open THEN 1 ELSE 0 END, 1) OVER w AS dir_1,
        lag(CASE WHEN close > open THEN 1 ELSE 0 END, 2) OVER w AS dir_2,
        lag(CASE WHEN close > open THEN 1 ELSE 0 END, 3) OVER w AS dir_3,
        lead(CASE WHEN close > open THEN 1 ELSE 0 END, 1) OVER w AS next_dir
    FROM {bars_relation}
    WINDOW w AS (PARTITION BY symbol ORDER BY rn)
),
pct AS (
    SELECT symbol,
        {pct_cols}
    FROM {bars_relation} GROUP BY symbol
),
lp AS (
    SELECT l.*, p.ti_p90, p.ti_p95, p.ofi_p10, p.ofi_p90
    FROM lagged l JOIN pct p USING (symbol)
)
SELECT * FROM (
{unions}
)"""
