"""The composite triple-barrier simulation operator (SURVEY.md §2.9).

Semantics are the reference's unit-test oracle ``barrier_sim.simulate_barriers``
(src/opendeviationbar_patterns/barrier_sim.py:45-147) and the gen720 SQL
templates (sql/gen720_wf_wl1d_template.sql:118-252):

  * entry at the NEXT bar's open after the signal bar (AP-15);
  * forward scan covers bars signal+2 .. signal+1+max_bars (1-based
    forward index 1..max_bars);
  * 2-segment stop: wide SL while fwd <= phase1_bars, tight SL after;
  * per bar, SL is checked before TP — **SL wins same-bar ties (AP-12)**;
  * SL executes at ``least(open_at_exit, sl_price)`` — gap-down fills at
    the worse price (AP-13); TP executes exactly at tp_price; TIME exits
    at the close of forward bar max_bars;
  * signals without max_bars complete forward bars are INCOMPLETE and
    dropped (gen200_triple_barrier.sql:247).

Everything is Catalyst higher-order functions over per-signal forward
arrays — zero Python UDFs on this path.  Spark HOF lambdas capture outer
columns correctly, so the reference's AP-02 hoisting workaround is not
*needed*, but prices are still hoisted as columns for plan readability.

Scale strategy: the forward arrays are built by a bounded window
(CURRENT+2 .. CURRENT+1+cap FOLLOWING) partitioned by symbol — per-row
state is 4 × cap × 8 B, and the whole operator is shuffle-free up to the
final config cross-join, which broadcasts the (≤ thousands-row) grid.
For very sparse signals at 100 TB, prefer filtering signals first and
range-joining forward bars (J1) instead; see ``forward_join_variant``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .windows import bar_window

TRADE_COLUMNS = [
    "symbol",
    "signal_rn",
    "signal_ts_ms",
    "barrier_id",
    "entry_price",
    "exit_type",
    "exit_bar",
    "exit_price",
    "return_pct",
]


def with_entry_and_forward(df: DataFrame, cap: int) -> DataFrame:
    """Attach entry_price (next-bar open) and forward OHLC arrays covering
    forward bars 1..cap (i.e. rows signal+2 .. signal+1+cap)."""
    w = bar_window()
    fwd = bar_window().rowsBetween(2, 1 + cap)
    out = df.withColumn("entry_price", F.lead("open", 1).over(w))
    for src, dst in [
        ("high", "fwd_highs"),
        ("low", "fwd_lows"),
        ("open", "fwd_opens"),
        ("close", "fwd_closes"),
    ]:
        out = out.withColumn(dst, F.collect_list(src).over(fwd))
    return out


def _first_breach_index(arr: Column, pred) -> Column:
    """1-based index of the first element satisfying pred, 0 if none —
    the reference's arrayFirstIndex convention (AP-03)."""
    return F.coalesce(
        F.array_position(F.transform(arr, pred), F.lit(True)), F.lit(0)
    ).cast("int")


def simulate_barriers(
    signals: DataFrame,
    grid: DataFrame,
    bar_range: Column | None = None,
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """signals: output of ``with_entry_and_forward`` filtered to signal
    rows.  grid: broadcastable barrier-config DataFrame (config.py).
    Returns the per-trade long format (gen720_wf_wl1d_template.sql:238-252);
    ``id_cols`` are extra passthrough identity columns (e.g. config_id for
    sweep runs).
    """
    if bar_range is None:
        bar_range = F.col("threshold_decimal_bps").cast("double") / F.lit(100000.0)

    t = signals.crossJoin(F.broadcast(grid))
    if "side" not in t.columns:
        t = t.withColumn("side", F.lit("long"))
    # SHORT geometry (gen600_2up_s_template.sql:141-150): TP *below* entry,
    # SL *above*; the long expressions are byte-identical to the unsided
    # original, so long-only call sites are unaffected.
    short = F.col("side") == "short"
    e = F.col("entry_price")
    t = (
        t.withColumn("bar_range", bar_range)
        .withColumn(
            "tp_price",
            F.when(
                short, e * (F.lit(1.0) - F.col("tp_mult") * F.col("bar_range"))
            ).otherwise(e * (F.lit(1.0) + F.col("tp_mult") * F.col("bar_range"))),
        )
        .withColumn(
            "sl_wide_price",
            F.when(
                short, e * (F.lit(1.0) + F.col("sl_mult") * F.col("bar_range"))
            ).otherwise(e * (F.lit(1.0) - F.col("sl_mult") * F.col("bar_range"))),
        )
        .withColumn(
            "sl_tight_price",
            F.when(
                short, e * (F.lit(1.0) + F.col("sl_tight_mult") * F.col("bar_range"))
            ).otherwise(
                e * (F.lit(1.0) - F.col("sl_tight_mult") * F.col("bar_range"))
            ),
        )
    )

    # complete trades only (INCOMPLETE dropped)
    t = t.filter(
        F.col("entry_price").isNotNull() & (F.size("fwd_highs") >= F.col("max_bars"))
    )

    tp = F.col("tp_price")
    slw = F.col("sl_wide_price")
    slt = F.col("sl_tight_price")
    p1 = F.col("phase1_bars")
    mb = F.col("max_bars")

    # TP scans the favourable side (highs long / lows short), SL the
    # adverse side; lambdas branch on `short` per element — still pure
    # Catalyst HOFs, no Python
    tp_arr = F.when(short, F.col("fwd_lows")).otherwise(F.col("fwd_highs"))
    sl_arr = F.when(short, F.col("fwd_highs")).otherwise(F.col("fwd_lows"))
    t = (
        t.withColumn(
            "tp_idx",
            _first_breach_index(
                F.slice(tp_arr, F.lit(1), mb),
                lambda x: F.when(short, x <= tp).otherwise(x >= tp),
            ),
        )
        .withColumn(
            "sl_wide_idx",
            _first_breach_index(
                F.slice(sl_arr, F.lit(1), F.least(p1, mb)),
                lambda x: F.when(short, x >= slw).otherwise(x <= slw),
            ),
        )
        .withColumn(
            "_sl_tight_rel",
            _first_breach_index(
                F.slice(sl_arr, p1 + F.lit(1), F.greatest(mb - p1, F.lit(0))),
                lambda x: F.when(short, x >= slt).otherwise(x <= slt),
            ),
        )
        .withColumn(
            "sl_idx",
            F.when(F.col("sl_wide_idx") > 0, F.col("sl_wide_idx"))
            .when(F.col("_sl_tight_rel") > 0, F.col("_sl_tight_rel") + p1)
            .otherwise(F.lit(0)),
        )
    )

    sl_found = F.col("sl_idx") > 0
    tp_found = F.col("tp_idx") > 0
    is_sl = sl_found & (~tp_found | (F.col("sl_idx") <= F.col("tp_idx")))
    is_tp = tp_found & (~sl_found | (F.col("tp_idx") < F.col("sl_idx")))

    exit_bar = (
        F.when(is_sl, F.col("sl_idx")).when(is_tp, F.col("tp_idx")).otherwise(mb)
    )
    sl_price_at_exit = F.when(F.col("sl_idx") <= p1, slw).otherwise(slt)
    # gap fill at the worse price (AP-13): gap-DOWN for longs
    # (least(open, sl)), gap-UP against shorts (greatest(open, sl))
    sl_fill = F.when(
        short, F.greatest(F.element_at("fwd_opens", F.col("sl_idx")), sl_price_at_exit)
    ).otherwise(
        F.least(F.element_at("fwd_opens", F.col("sl_idx")), sl_price_at_exit)
    )
    exit_price = (
        F.when(is_sl, sl_fill)
        .when(is_tp, tp)
        .otherwise(F.element_at("fwd_closes", mb))
    )

    return (
        t.withColumn("exit_type", F.when(is_sl, "SL").when(is_tp, "TP").otherwise("TIME"))
        .withColumn("exit_bar", exit_bar.cast("long"))
        .withColumn("exit_price", exit_price)
        .withColumn(
            "return_pct",
            F.when(
                short,
                (F.col("entry_price") - F.col("exit_price")) / F.col("entry_price"),
            ).otherwise(
                (F.col("exit_price") - F.col("entry_price")) / F.col("entry_price")
            ),
        )
        .withColumnRenamed("rn", "signal_rn")
        .withColumnRenamed("close_time_ms", "signal_ts_ms")
        .select(*id_cols, *TRADE_COLUMNS)
    )


def barrier_metrics(trades: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Per-config aggregate metrics (A2 — gen200_triple_barrier.sql:247-309):
    win_rate, profit_factor, avg win/loss, risk_reward, expected_value,
    avg_bars_held, kelly_fraction.  Float aggregates are rounded to 6
    decimals (cross-engine float-sum tolerance; see plans/catalog.py)."""
    from ..functions.detsum import osum_if

    g = group_cols or ["symbol", "barrier_id"]
    r = F.col("return_pct")
    ts = F.col("signal_ts_ms")
    win = r > 0
    n = F.count("*")
    n_win = F.sum(F.when(win, 1).otherwise(0))
    win_rate = n_win.cast("double") / n.cast("double")
    # ordered folds (functions/detsum.py): plain double sums are
    # ulp-nondeterministic across runs/engines
    gross_win = osum_if(ts, win, r)
    gross_loss = F.abs(osum_if(ts, ~win, r))
    n_loss = (n - n_win).cast("double")
    avg_win = gross_win / F.nullif(n_win.cast("double"), F.lit(0.0))
    avg_loss = gross_loss / F.nullif(n_loss, F.lit(0.0))
    rr = avg_win / F.nullif(avg_loss, F.lit(0.0))
    ev = osum_if(ts, F.lit(True), r) / n.cast("double")
    kelly = win_rate - (F.lit(1.0) - win_rate) / F.nullif(rr, F.lit(0.0))
    return trades.groupBy(*g).agg(
        n.alias("n_trades"),
        F.sum(F.when(F.col("exit_type") == "TP", 1).otherwise(0)).alias("n_tp"),
        F.sum(F.when(F.col("exit_type") == "SL", 1).otherwise(0)).alias("n_sl"),
        F.sum(F.when(F.col("exit_type") == "TIME", 1).otherwise(0)).alias("n_time"),
        F.round(win_rate, 6).alias("win_rate"),
        F.round(gross_win / F.nullif(gross_loss, F.lit(0.0)), 6).alias("profit_factor"),
        F.round(avg_win, 6).alias("avg_win"),
        F.round(avg_loss, 6).alias("avg_loss"),
        F.round(rr, 6).alias("risk_reward"),
        F.round(ev, 6).alias("expected_value"),
        F.round(F.avg(F.col("exit_bar").cast("double")), 6).alias("avg_bars_held"),
        F.round(kelly, 6).alias("kelly_fraction"),
    )


def simulate_trailing_barriers(
    signals: DataFrame,
    grid: DataFrame,
    bar_range: Column | None = None,
    id_cols: tuple[str, ...] = (),
) -> DataFrame:
    """gen201 trailing-stop / gen202 combined barrier simulation
    (gen201_trailing_stop.sql:144-230; gen202_combined_barrier.sql shares
    identical mechanics): fixed TP + per-bar ratcheting trailing SL.

      * running_max[i] = greatest(entry, max(fwd_highs[1..i])) — the stop
        only ratchets UP (arrayMap/arrayReduce block, gen201:150-152);
      * trailing_sl[i] = running_max[i] * (1 - trail_mult * bar_range);
      * TRAIL breach: first i with fwd_lows[i] <= trailing_sl[i]
        (dual-array lambda, gen201:188-192) — TRAIL WINS same-bar ties;
      * exits: TRAIL -> least(open[i], trailing_sl[i]) (gap-down fill),
        TP -> tp_price exactly, TIME -> closes[max_bars];
      * LONG-only, like the reference generations.

    All per-bar state is Catalyst higher-order functions (transform /
    zip_with / array_max over the bounded forward arrays) — no Python, no
    extra shuffle beyond the broadcast grid cross-join.
    """
    if bar_range is None:
        bar_range = F.col("threshold_decimal_bps").cast("double") / F.lit(100000.0)

    t = signals.crossJoin(F.broadcast(grid)).withColumn("bar_range", bar_range)
    e = F.col("entry_price")
    mb = F.col("max_bars")
    t = (
        t.withColumn(
            "tp_price", e * (F.lit(1.0) + F.col("tp_mult") * F.col("bar_range"))
        )
        .withColumn("trail_pct", F.col("trail_mult") * F.col("bar_range"))
        .filter(e.isNotNull() & (F.size("fwd_highs") >= mb))
        .withColumn(
            "trailing_sls",
            F.transform(
                F.sequence(F.lit(1), mb),
                lambda i: F.greatest(
                    F.col("entry_price"),
                    F.array_max(F.slice(F.col("fwd_highs"), F.lit(1), i)),
                )
                * (F.lit(1.0) - F.col("trail_pct")),
            ),
        )
    )
    t = t.withColumn(
        "tp_idx",
        _first_breach_index(
            F.slice("fwd_highs", F.lit(1), mb), lambda h: h >= F.col("tp_price")
        ),
    ).withColumn(
        "trail_idx",
        F.coalesce(
            F.array_position(
                F.zip_with(
                    F.slice(F.col("fwd_lows"), F.lit(1), mb),
                    F.col("trailing_sls"),
                    lambda lo, ts: lo <= ts,
                ),
                F.lit(True),
            ),
            F.lit(0),
        ).cast("int"),
    )

    trail_found = F.col("trail_idx") > 0
    tp_found = F.col("tp_idx") > 0
    is_trail = trail_found & (~tp_found | (F.col("trail_idx") <= F.col("tp_idx")))
    is_tp = tp_found & (~trail_found | (F.col("tp_idx") < F.col("trail_idx")))

    exit_bar = (
        F.when(is_trail, F.col("trail_idx"))
        .when(is_tp, F.col("tp_idx"))
        .otherwise(mb)
    )
    exit_price = (
        F.when(
            is_trail,
            F.least(
                F.element_at("fwd_opens", F.col("trail_idx")),
                F.element_at("trailing_sls", F.col("trail_idx")),
            ),
        )
        .when(is_tp, F.col("tp_price"))
        .otherwise(F.element_at("fwd_closes", mb))
    )
    return (
        t.withColumn(
            "exit_type",
            F.when(is_trail, "TRAIL").when(is_tp, "TP").otherwise("TIME"),
        )
        .withColumn("exit_bar", exit_bar.cast("long"))
        .withColumn("exit_price", exit_price)
        .withColumn(
            "return_pct",
            (F.col("exit_price") - F.col("entry_price")) / F.col("entry_price"),
        )
        .withColumnRenamed("rn", "signal_rn")
        .withColumnRenamed("close_time_ms", "signal_ts_ms")
        .select(*id_cols, *TRADE_COLUMNS)
    )
