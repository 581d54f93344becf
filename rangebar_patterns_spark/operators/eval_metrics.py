"""The eval metric layer (SURVEY.md §2.10 E1–E16) as native Spark
aggregations over the long-format trades table.

The reference runs these as per-config Python functions over extracted
return vectors (eval/*.py), with JSONL handoffs between 10+ stages.  Here
each metric is a ``groupBy(config keys)`` aggregation (scale axis =
config count), and the whole DAG is one lineage.  Order-sensitive metrics
(tail slices, drawdown curves, e-value processes) use *deterministic
sequential* constructs — ts-ordered running windows and sorted-array
folds — so Spark and the DuckDB oracle agree exactly; unordered float
sums rely on the 6-decimal rounding convention (plans/catalog.py).

Reference formula sources (file:line cited per function): eval/omega.py,
rachev.py, cdar.py, evalues.py, dsr.py, minbtl.py, cornish_fisher.py,
ou_barriers.py, tamrs.py, synthesis.py, ranking.py.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.stats import norm_cdf_col, norm_ppf_col

KEYS = ["symbol", "barrier_id"]

# reference config.py defaults
ALPHA = 0.05
RACHEV_ALPHA = 0.05
CDAR_ALPHA = 0.95
MIN_TRADES_RACHEV = 20
MIN_TRADES_CDAR = 10
E_THRESHOLD = 1.0 / ALPHA  # 20.0
MIN_BET = 0.001
MAX_EVALUE = 1e10
EULER_GAMMA = 0.5772156649  # eval/dsr.py:20


def _r() -> Column:
    return F.col("return_pct")


def _tp_like() -> Column:
    """'winning exit' per extraction.py moments: TP, or TIME closing above
    entry (extraction.py:212-216)."""
    e = F.col("exit_type")
    return (e == "TP") | ((e == "TIME") & (F.col("exit_price") > F.col("entry_price")))


def _sl_like() -> Column:
    e = F.col("exit_type")
    return (e == "SL") | ((e == "TIME") & (F.col("exit_price") <= F.col("entry_price")))


def trade_moments(trades: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """E-moments row per config (extraction.py:200-232): n, mean, sample
    std/skew/kurt (kurt NON-excess, ClickHouse ``kurtSamp`` convention —
    SURVEY §2.4 A5), exclusive q01/q05, TP-based win_rate / profit_factor
    / kelly_fraction."""
    from ..functions.detsum import osum, osum_if

    g = keys or KEYS
    r = _r()
    ts = F.col("signal_ts_ms")
    n = F.count("*").cast("long")
    nd = n.cast("double")
    # deterministic ordered folds (see functions/detsum.py) — plain sums
    # are ulp-nondeterministic across runs and engines
    s1, s2 = osum(ts, r), osum(ts, r * r)
    s3, s4 = osum(ts, r * r * r), osum(ts, r * r * r * r)
    m = s1 / nd
    # sum (r-m)^2 expanded from raw power sums; clamped at 0 — float
    # cancellation can leave it at -1e-20 for near-constant returns, and
    # DuckDB raises on sqrt(negative) where Spark yields NaN
    m2 = F.greatest(s2 - F.lit(2.0) * m * s1 + nd * m * m, F.lit(0.0))
    m3 = s3 - F.lit(3.0) * m * s2 + F.lit(3.0) * m * m * s1 - nd * m * m * m
    m4 = (
        s4
        - F.lit(4.0) * m * s3
        + F.lit(6.0) * m * m * s2
        - F.lit(4.0) * m * m * m * s1
        + nd * m * m * m * m
    )
    var_s = m2 / F.nullif(nd - 1.0, F.lit(0.0))
    std = F.sqrt(var_s)
    # ClickHouse skewSamp / kurtSamp (extraction.py:205-207): mean central
    # moment over the SAMPLE variance, no small-sample adjustment —
    # skewSamp = (Σ(r-m)³/n) / varSamp^1.5, kurtSamp = (Σ(r-m)⁴/n) /
    # varSamp² (non-excess).  The scipy-style bias-corrected estimators
    # differ at O(1/n) and would propagate into PSR/DSR/MinBTL/CF.
    skew = (m3 / nd) / F.nullif(F.pow(var_s, 1.5), F.lit(0.0))
    kurt = (m4 / nd) / F.nullif(var_s * var_s, F.lit(0.0))
    from ..functions.quantiles import q6_from_sorted_array

    sorted_r = F.sort_array(F.collect_list(r))
    n_tp = F.sum(F.when(F.col("exit_type") == "TP", 1).otherwise(0))
    n_closed = F.sum(F.when(F.col("exit_type").isin("TP", "SL", "TIME"), 1).otherwise(0))
    win_rate = n_tp / F.nullif(n_closed.cast("double"), F.lit(0.0))
    gross_win = osum_if(ts, _tp_like(), r)
    gross_loss = F.abs(osum_if(ts, _sl_like(), r))
    cnt_tpl = F.sum(F.when(_tp_like(), 1).otherwise(0)).cast("double")
    cnt_sll = F.sum(F.when(_sl_like(), 1).otherwise(0)).cast("double")
    avg_win = gross_win / F.nullif(cnt_tpl, F.lit(0.0))
    avg_loss = gross_loss / F.nullif(cnt_sll, F.lit(0.0))
    rr = avg_win / F.nullif(avg_loss, F.lit(0.0))
    kelly = win_rate - (F.lit(1.0) - win_rate) / F.nullif(rr, F.lit(0.0))
    return trades.groupBy(*g).agg(
        n.alias("n_trades"),
        F.round(m, 6).alias("mean_return"),
        F.round(std, 6).alias("std_return"),
        F.round(skew, 6).alias("skew_return"),
        F.round(kurt, 6).alias("kurt_return"),
        F.round(q6_from_sorted_array(sorted_r, 0.01), 6).alias("q01_return"),
        F.round(q6_from_sorted_array(sorted_r, 0.05), 6).alias("q05_return"),
        F.round(win_rate, 6).alias("win_rate"),
        F.round(gross_win / F.nullif(gross_loss, F.lit(0.0)), 6).alias("profit_factor"),
        F.round(kelly, 6).alias("kelly_fraction"),
        # unrounded internals for downstream DSR math
        m.alias("_mean_raw"),
        std.alias("_std_raw"),
        skew.alias("_skew_raw"),
        kurt.alias("_kurt_raw"),
        kelly.alias("_kelly_raw"),
    )


def _fold_mean(arr: Column, k: Column) -> Column:
    """Sequential left-fold mean of an array — deterministic association
    order (matches DuckDB list_aggregate 'sum' over the same ordering)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x) / k.cast("double")


def tail_metrics(trades: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Omega(0) (omega.py:29-37), Rachev ratio (rachev.py:20-57: CVaR tail
    means over value-sorted returns, cap 10, min 20 trades), CDaR
    (cdar.py:20-29: mean of worst (1-alpha) drawdowns of the ts-ordered
    equity curve, min 10 trades)."""
    g = keys or KEYS
    w = (
        Window.partitionBy(*g)
        .orderBy("signal_ts_ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = trades.withColumn("_cum", F.sum(_r()).over(w)).withColumn(
        "_dd", F.max("_cum").over(w) - F.col("_cum")
    )
    from ..functions.detsum import fold_sum

    r = _r()
    n = F.count("*")
    nd = n.cast("double")
    sorted_r = F.sort_array(F.collect_list(r))
    # deterministic folds over the value-sorted returns (detsum.py)
    gains = fold_sum(F.transform(sorted_r, lambda x: F.greatest(x, F.lit(0.0))))
    losses = fold_sum(F.transform(sorted_r, lambda x: F.greatest(-x, F.lit(0.0))))
    omega = gains / F.nullif(losses, F.lit(0.0))
    k_tail = F.greatest(F.lit(1), F.floor(nd * F.lit(RACHEV_ALPHA)).cast("int"))
    cvar_up = _fold_mean(F.slice(F.reverse(sorted_r), F.lit(1), k_tail), k_tail)
    cvar_lo_abs = F.abs(_fold_mean(F.slice(sorted_r, F.lit(1), k_tail), k_tail))
    rachev = (
        F.when(n < MIN_TRADES_RACHEV, F.lit(None).cast("double"))
        .when(cvar_lo_abs < 1e-12, F.lit(None).cast("double"))
        .otherwise(F.least(cvar_up / cvar_lo_abs, F.lit(10.0)))
    )
    sorted_dd_desc = F.reverse(F.sort_array(F.collect_list(F.col("_dd"))))
    k_dd = F.greatest(F.lit(1), F.floor(nd * F.lit(1.0 - CDAR_ALPHA)).cast("int"))
    cdar = F.when(
        n < MIN_TRADES_CDAR, F.lit(None).cast("double")
    ).otherwise(_fold_mean(F.slice(sorted_dd_desc, F.lit(1), k_dd), k_dd))
    return t.groupBy(*g).agg(
        n.cast("long").alias("n_trades"),
        F.round(omega, 6).alias("omega"),
        F.round(rachev, 6).alias("rachev_ratio"),
        F.round(cdar, 6).alias("cdar"),
        cdar.alias("_cdar_raw"),
        rachev.alias("_rachev_raw"),
        omega.alias("_omega_raw"),
    )


def evalues(trades: DataFrame, moments: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Sequential e-values under half-Kelly bet sizing (evalues.py:26-63):
    E_t = prod(1 + f*r_t) via capped running log sums; GROW criterion;
    first-rejection trade index at E >= 1/alpha."""
    g = keys or KEYS
    f_bet = F.when(
        F.col("_kelly_raw") > 0,
        F.greatest(F.col("_kelly_raw") / 2.0, F.lit(MIN_BET)),
    ).otherwise(F.lit(MIN_BET))
    t = trades.join(
        moments.select(*g, "_kelly_raw"), g
    ).withColumn("_f", f_bet)
    wo = Window.partitionBy(*g).orderBy("signal_ts_ms")
    w = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    max_log = math.log(MAX_EVALUE)
    t = (
        # ln(1.0 + f*r) spelled exactly as the DuckDB oracle (eval_oracle.py:176)
        # computes it: log1p(x) differs from ln(1+x) in final ulps, which survives
        # round(...,8) and breaks the value hash (reference evalues.py:26-63).
        t.withColumn("_logf", F.log(F.lit(1.0) + F.col("_f") * _r()))
        .withColumn("_tn", F.row_number().over(wo))
        .withColumn("_cum", F.least(F.sum("_logf").over(w), F.lit(max_log)))
    )
    ln_thresh = math.log(E_THRESHOLD)
    from ..functions.detsum import osum

    return t.groupBy(*g).agg(
        F.count("*").cast("long").alias("n_trades"),
        F.round(F.exp(F.max_by(F.col("_cum"), F.col("_tn"))), 6).alias("final_evalue"),
        F.round(F.exp(F.max("_cum")), 6).alias("max_evalue"),
        # + 0.0 normalizes IEEE -0.0 to +0.0 so both engines serialize a tiny
        # negative mean that rounds to zero identically (DuckDB round keeps the
        # sign bit; the gate's value-hash distinguishes -0.0 from 0.0).
        (
            F.round(
                osum(F.col("signal_ts_ms"), F.col("_logf"))
                / F.count("*").cast("double"),
                8,
            )
            + F.lit(0.0)
        ).alias("grow_criterion"),
        (F.exp(F.max("_cum")) >= E_THRESHOLD).alias("rejects_null_at_005"),
        F.min(F.when(F.col("_cum") >= ln_thresh, F.col("_tn"))).alias(
            "first_rejection_trade"
        ),
        F.round(F.max("_f"), 6).alias("kelly_used"),
    )


def dsr_metrics(
    moments: DataFrame,
    keys: list[str] | None = None,
    passthrough: list[str] | None = None,
) -> DataFrame:
    """PSR / DSR (dsr.py:22-70) + MinBTL (minbtl.py:21-37) + Cornish–Fisher
    VaR (cornish_fisher.py:18-35).  The expected-max-SR benchmark uses the
    *observed* trial count and cross-config SR variance (False Strategy
    Theorem), computed as broadcast scalars.

    ``passthrough`` carries extra ``moments`` columns into the output
    unchanged — DSR/PSR/MinBTL/CF are pure column math over the moments
    row, so a caller wanting moments + DSR as one panel appends columns
    here instead of self-joining two derivations of the same relation."""
    g = keys or KEYS
    from ..functions.detsum import fold_sum

    sr = F.col("_mean_raw") / F.nullif(F.col("_std_raw"), F.lit(0.0))
    m = moments.withColumn("_sr", sr)
    # var of SRs via deterministic fold over key-ordered values
    srs = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("_sr").isNotNull(),
                    F.struct(*[F.col(c) for c in g], F.col("_sr").alias("sr")),
                )
            )
        ),
        lambda s: s["sr"],
    )
    nn = F.size(srs).cast("double")
    ssum = fold_sum(srs)
    ssq = fold_sum(F.transform(srs, lambda x: x * x))
    var_expr = F.greatest(ssq - nn * (ssum / nn) * (ssum / nn), F.lit(0.0)) / F.nullif(
        nn - 1.0, F.lit(0.0)
    )
    stats = m.agg(
        F.count("*").cast("double").alias("_n_trials"),
        var_expr.alias("_var_sr"),
    )
    m = m.crossJoin(F.broadcast(stats))
    nt = F.col("_n_trials")
    z1 = norm_ppf_col(F.lit(1.0) - F.lit(1.0) / nt)
    z2 = norm_ppf_col(F.lit(1.0) - F.lit(1.0) / (nt * F.lit(math.e)))
    sr_star = F.when(nt <= 1, F.lit(0.0)).otherwise(
        F.sqrt(F.col("_var_sr"))
        * ((F.lit(1.0) - F.lit(EULER_GAMMA)) * z1 + F.lit(EULER_GAMMA) * z2)
    )
    n = F.col("n_trades").cast("double")
    s, k = F.col("_skew_raw"), F.col("_kurt_raw")
    srr = F.col("_sr")
    inner = F.greatest(
        F.lit(1.0) + F.lit(0.5) * srr * srr - s * srr + (k - 3.0) / 4.0 * srr * srr,
        F.lit(1e-10),
    )
    se = F.sqrt(inner / F.nullif(n, F.lit(0.0)))  # dsr.py:40 sqrt(inner/n)
    psr = norm_cdf_col(srr / F.nullif(se, F.lit(0.0)))
    dsr = norm_cdf_col((srr - sr_star) / F.nullif(se, F.lit(0.0)))
    moment_adj = F.greatest(
        F.lit(1.0) - s * srr / 3.0 + (k - 1.0) / 4.0 * srr * srr, F.lit(0.1)
    )
    minbtl = F.when(F.abs(srr) < 1e-8, F.lit(None).cast("double")).otherwise(
        F.lit(2.0) * F.log(nt) / (srr * srr) * moment_adj
    )
    from ..functions.stats import python_norm_ppf

    z_a = python_norm_ppf(ALPHA)
    z2_, z3_ = z_a * z_a, z_a * z_a * z_a
    z_cf = (
        F.lit(z_a)
        + F.lit(1.0 / 6.0) * F.lit(z2_ - 1.0) * s
        + F.lit(1.0 / 24.0) * F.lit(z3_ - 3.0 * z_a) * (k - 3.0)
        - F.lit(1.0 / 36.0) * F.lit(2.0 * z3_ - 5.0 * z_a) * s * s
    )
    var_cf = F.col("_mean_raw") + z_cf * F.col("_std_raw")
    return m.select(
        *g,
        F.col("n_trades"),
        *[F.col(c) for c in (passthrough or [])],
        F.round(srr, 6).alias("sharpe"),
        F.round(psr, 6).alias("psr"),
        F.round(sr_star, 6).alias("expected_max_sr"),
        F.round(dsr, 6).alias("dsr"),
        F.round(minbtl, 6).alias("minbtl"),
        F.round(z_cf, 6).alias("cf_quantile"),
        F.round(var_cf, 6).alias("cf_var"),
    )


def ou_calibration(bars: DataFrame) -> DataFrame:
    """Per-symbol OU fit on the close series (ou_barriers.py:28-55):
    OLS dX = a + b*X; mu = -b, sigma = std(resid), half-life = ln2/mu,
    optimal TP fraction = sigma*sqrt(HL)/mean(price).  Expressed as
    closed-form OLS via covariance aggregates (no UDF); NULL when not
    mean-reverting (mu <= 0)."""
    from ..functions.detsum import osum

    w = Window.partitionBy("symbol").orderBy("rn")
    d = (
        bars.select("symbol", "rn", "close")
        .withColumn("_x", F.lag("close", 1).over(w))
        .filter(F.col("_x").isNotNull())
        .withColumn("_y", F.col("close") - F.col("_x"))
    )
    rn = F.col("rn")
    agg = d.groupBy("symbol").agg(
        F.count("*").cast("double").alias("_n"),
        osum(rn, F.col("_x")).alias("_sx"),
        osum(rn, F.col("_y")).alias("_sy"),
        osum(rn, F.col("_x") * F.col("_y")).alias("_sxy"),
        osum(rn, F.col("_x") * F.col("_x")).alias("_sxx"),
        osum(rn, F.col("_y") * F.col("_y")).alias("_syy"),
        (osum(rn, F.col("close")) / F.count("*").cast("double")).alias("_mean_price"),
    )
    # single-pass OLS: centered sums give slope AND residual variance
    # (SSE = Syy_c - b*Sxy_c), so no second pass over the series
    n_, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    sxx_c = F.col("_sxx") - sx * sx / n_
    sxy_c = F.col("_sxy") - sx * sy / n_
    syy_c = F.col("_syy") - sy * sy / n_
    b = sxy_c / F.nullif(sxx_c, F.lit(0.0))
    sse = F.greatest(syy_c - b * sxy_c, F.lit(0.0))
    out = agg.select(
        "symbol",
        b.alias("_b"),
        F.col("_mean_price"),
        F.sqrt(sse / n_).alias("_sigma"),
    )
    mu = -F.col("_b")
    hl = F.log(F.lit(2.0)) / mu
    tp_abs = F.col("_sigma") * F.sqrt(hl)
    tp_frac = F.when(F.col("_mean_price") > 0, tp_abs / F.col("_mean_price")).otherwise(
        F.lit(0.0)
    )
    valid = mu > 0
    return out.select(
        "symbol",
        F.round(F.when(valid, mu), 8).alias("mu_dt"),
        F.round(F.when(valid, F.col("_sigma")), 8).alias("sigma_dt"),
        F.round(F.when(valid, hl), 6).alias("half_life"),
        F.when(valid, tp_frac).alias("_tp_frac_raw"),
        F.round(F.when(valid, tp_frac), 8).alias("optimal_tp_frac"),
    )


def tamrs(
    tail: DataFrame,
    ou: DataFrame,
    grid: DataFrame,
    bar_range: float,
    keys: list[str] | None = None,
) -> DataFrame:
    """TAMRS composite (tamrs.py:19-27, CLAUDE.md "TAMRS formula"):
    Rachev * min(1, |SL_emp| / CDaR) * min(1, TP_emp / TP_OU), with
    SL_emp/TP_emp derived from each barrier config's multipliers."""
    g = keys or KEYS
    j = (
        tail.join(F.broadcast(grid.select("barrier_id", "tp_mult", "sl_mult")), "barrier_id")
        .join(F.broadcast(ou.select("symbol", "_tp_frac_raw")), "symbol")
    )
    sl_emp = F.col("sl_mult") * F.lit(bar_range)
    tp_emp = F.col("tp_mult") * F.lit(bar_range)
    sl_cdar = F.when(
        F.col("_cdar_raw") > 0, F.least(F.lit(1.0), F.abs(sl_emp) / F.col("_cdar_raw"))
    )
    ou_ratio = F.when(
        F.col("_tp_frac_raw") > 0, F.least(F.lit(1.0), tp_emp / F.col("_tp_frac_raw"))
    )
    return j.select(
        *g,
        F.col("n_trades"),
        F.round(F.col("_rachev_raw"), 6).alias("rachev_ratio"),
        F.round(sl_cdar, 6).alias("sl_cdar_ratio"),
        F.round(ou_ratio, 6).alias("ou_barrier_ratio"),
        F.round(F.col("_rachev_raw") * sl_cdar * ou_ratio, 6).alias("tamrs"),
    )


def ebh_discoveries(ev: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """e-BH FDR procedure (synthesis.py:26-58): rank configs by final
    e-value descending; k* = max{k : k*e_k/K >= 1/alpha}; top-k* are
    discoveries.  Config population is small — a single global window is
    fine (driver-scale data, as in the reference)."""
    g = keys or KEYS
    wo = Window.orderBy(F.col("final_evalue").desc(), *[F.col(c) for c in g])
    t = (
        ev.filter(F.col("final_evalue").isNotNull() & (F.col("final_evalue") > 0))
        # NB: Spark resolves column names case-insensitively by default, so
        # the total count must NOT be named "_K" next to rank "_k"
        .withColumn("_k", F.row_number().over(wo))
        .withColumn("_ktot", F.count("*").over(Window.partitionBy()))
    )
    cond_k = F.when(
        F.col("_k").cast("double") * F.col("final_evalue") / F.col("_ktot").cast("double")
        >= E_THRESHOLD,
        F.col("_k"),
    )
    t = t.withColumn(
        "_k_star",
        F.coalesce(F.max(cond_k).over(Window.partitionBy()), F.lit(0)),
    )
    return t.select(
        *g,
        "final_evalue",
        F.col("_k").cast("long").alias("e_rank"),
        F.col("_k_star").cast("long").alias("k_star"),
        (F.col("_k") <= F.col("_k_star")).alias("is_discovery"),
    )


def ranking_survivors(
    metrics: DataFrame,
    metric_cols: list[str],
    top_pct: float = 0.5,
    keys: list[str] | None = None,
) -> DataFrame:
    """E15 percentile ranking + cutoff intersection (ranking.py:138-332):
    percent-rank each metric across configs (higher = better), survivors
    are configs in the top ``top_pct`` on EVERY metric.  Plus the E16
    TOPSIS score (ranking.py:333-370): L2-normalized distance to
    ideal/nadir with equal weights."""
    g = keys or KEYS
    out = metrics
    # rank on 6-decimal-rounded values: raw unordered float sums differ at
    # the last ulp across engines, which flips orderings; the rounded
    # representation is the cross-engine-stable one (catalog convention)
    for c in metric_cols:
        out = out.withColumn(c, F.round(F.col(c), 6))
    for c in metric_cols:
        out = out.withColumn(
            f"{c}_pctrank", F.percent_rank().over(Window.orderBy(F.col(c).asc_nulls_first()))
        )
    survive = None
    for c in metric_cols:
        cond = F.col(f"{c}_pctrank") >= F.lit(1.0 - top_pct)
        survive = cond if survive is None else (survive & cond)
    out = out.withColumn("survivor", survive)
    norms = out.agg(
        *[
            F.sqrt(F.sum(F.col(c) * F.col(c))).alias(f"_norm_{c}")
            for c in metric_cols
        ]
    )
    out = out.crossJoin(F.broadcast(norms))
    for c in metric_cols:
        out = out.withColumn(
            f"_v_{c}", F.col(c) / F.nullif(F.col(f"_norm_{c}"), F.lit(0.0))
        )
    ideals = out.agg(
        *[F.max(f"_v_{c}").alias(f"_ideal_{c}") for c in metric_cols],
        *[F.min(f"_v_{c}").alias(f"_nadir_{c}") for c in metric_cols],
    )
    out = out.crossJoin(F.broadcast(ideals))
    d_pos = sum(
        (F.col(f"_v_{c}") - F.col(f"_ideal_{c}")) * (F.col(f"_v_{c}") - F.col(f"_ideal_{c}"))
        for c in metric_cols
    )
    d_neg = sum(
        (F.col(f"_v_{c}") - F.col(f"_nadir_{c}")) * (F.col(f"_v_{c}") - F.col(f"_nadir_{c}"))
        for c in metric_cols
    )
    topsis = F.sqrt(d_neg) / F.nullif(F.sqrt(d_pos) + F.sqrt(d_neg), F.lit(0.0))
    return out.select(
        *g,
        *[F.round(F.col(f"{c}_pctrank"), 6).alias(f"{c}_pctrank") for c in metric_cols],
        "survivor",
        F.round(topsis, 6).alias("topsis_score"),
    )
