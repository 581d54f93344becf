"""DuckDB oracle twins for the eval metric layer (operators/eval_metrics.py).

Each builder returns SQL to append after the bars/feat/trades CTE chain
(the ``trades`` relation from barrier_oracle).  Formula text mirrors the
Spark Column expressions 1:1 — same association order, same nullif guards,
same 6/8-decimal rounding.
"""

from __future__ import annotations

import math

from ..functions.quantiles import duck_q6_expr
from ..functions.stats import norm_cdf_sql, norm_ppf_sql, python_norm_ppf
from ..operators.eval_metrics import (
    ALPHA,
    CDAR_ALPHA,
    E_THRESHOLD,
    EULER_GAMMA,
    MAX_EVALUE,
    MIN_BET,
    MIN_TRADES_CDAR,
    MIN_TRADES_RACHEV,
    RACHEV_ALPHA,
)

_TP_LIKE = "(exit_type = 'TP' OR (exit_type = 'TIME' AND exit_price > entry_price))"
_SL_LIKE = "(exit_type = 'SL' OR (exit_type = 'TIME' AND exit_price <= entry_price))"

def _dfold(val: str) -> str:
    """Deterministic ordered fold — twin of functions/detsum.py osum."""
    return (
        f"list_reduce(list_prepend(0.0, list({val} ORDER BY signal_ts_ms)),"
        f" (acc, x) -> acc + x)"
    )


# shared per-config raw-sum CTE over trades (ordered folds: see detsum.py)
MSUMS_CTE = f"""msums AS (
    SELECT symbol, barrier_id,
        count(*) AS n, CAST(count(*) AS DOUBLE) AS nd,
        {_dfold("return_pct")} AS s1,
        {_dfold("return_pct * return_pct")} AS s2,
        {_dfold("return_pct * return_pct * return_pct")} AS s3,
        {_dfold("return_pct * return_pct * return_pct * return_pct")} AS s4,
        list(return_pct ORDER BY return_pct) AS rs,
        CAST(sum(CASE WHEN exit_type = 'TP' THEN 1 ELSE 0 END) AS DOUBLE) AS n_tp,
        CAST(sum(CASE WHEN exit_type IN ('TP','SL','TIME') THEN 1 ELSE 0 END) AS DOUBLE) AS n_closed,
        {_dfold(f"CASE WHEN {_TP_LIKE} THEN return_pct ELSE 0.0 END")} AS gross_win,
        abs({_dfold(f"CASE WHEN {_SL_LIKE} THEN return_pct ELSE 0.0 END")}) AS gross_loss,
        CAST(sum(CASE WHEN {_TP_LIKE} THEN 1 ELSE 0 END) AS DOUBLE) AS cnt_tpl,
        CAST(sum(CASE WHEN {_SL_LIKE} THEN 1 ELSE 0 END) AS DOUBLE) AS cnt_sll
    FROM trades GROUP BY symbol, barrier_id
),
msums2 AS (
    SELECT *,
        gross_win / nullif(cnt_tpl, 0.0) AS avg_win,
        gross_loss / nullif(cnt_sll, 0.0) AS avg_loss
    FROM msums
),
mstats AS (
    SELECT *,
        s1 / nd AS m,
        greatest(s2 - 2.0 * (s1 / nd) * s1 + nd * (s1 / nd) * (s1 / nd), 0.0) AS m2,
        s3 - 3.0 * (s1 / nd) * s2 + 3.0 * (s1 / nd) * (s1 / nd) * s1
            - nd * (s1 / nd) * (s1 / nd) * (s1 / nd) AS m3,
        s4 - 4.0 * (s1 / nd) * s3 + 6.0 * (s1 / nd) * (s1 / nd) * s2
            - 4.0 * (s1 / nd) * (s1 / nd) * (s1 / nd) * s1
            + nd * (s1 / nd) * (s1 / nd) * (s1 / nd) * (s1 / nd) AS m4,
        n_tp / nullif(n_closed, 0.0) AS win_rate_raw,
        avg_win / nullif(avg_loss, 0.0) AS rr
    FROM msums2
),
mfull AS (
    SELECT *,
        m2 / nullif(nd - 1.0, 0.0) AS var_s,
        sqrt(m2 / nullif(nd - 1.0, 0.0)) AS std_raw,
        (m3 / nd)
            / nullif((m2 / nullif(nd - 1.0, 0.0)) ^ 1.5, 0.0) AS skew_raw,
        (m4 / nd)
            / nullif((m2 / nullif(nd - 1.0, 0.0))
                     * (m2 / nullif(nd - 1.0, 0.0)), 0.0) AS kurt_raw,
        win_rate_raw - (1.0 - win_rate_raw) / nullif(rr, 0.0) AS kelly_raw
    FROM mstats
)"""


def moments_select() -> str:
    return f"""
SELECT symbol, barrier_id,
    n AS n_trades,
    round(m, 6) AS mean_return,
    round(std_raw, 6) AS std_return,
    round(skew_raw, 6) AS skew_return,
    round(kurt_raw, 6) AS kurt_return,
    round({duck_q6_expr("rs", 0.01)}, 6) AS q01_return,
    round({duck_q6_expr("rs", 0.05)}, 6) AS q05_return,
    round(win_rate_raw, 6) AS win_rate,
    round(gross_win / nullif(gross_loss, 0.0), 6) AS profit_factor,
    round(kelly_raw, 6) AS kelly_fraction
FROM mfull
"""


TAIL_CTES = f"""tcum AS (
    SELECT symbol, barrier_id, return_pct, signal_ts_ms,
        sum(return_pct) OVER (PARTITION BY symbol, barrier_id ORDER BY signal_ts_ms
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM trades
),
tdd AS (
    SELECT *, max(cum) OVER (PARTITION BY symbol, barrier_id ORDER BY signal_ts_ms
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cum AS dd
    FROM tcum
),
tagg AS (
    SELECT symbol, barrier_id,
        count(*) AS n, CAST(count(*) AS DOUBLE) AS nd,
        list(return_pct ORDER BY return_pct) AS rs,
        list(dd ORDER BY dd DESC) AS dds
    FROM tdd GROUP BY symbol, barrier_id
),
tagg2 AS (
    SELECT *,
        list_reduce(list_prepend(0.0, list_transform(rs, x -> greatest(x, 0.0))),
            (acc, x) -> acc + x) AS gains,
        list_reduce(list_prepend(0.0, list_transform(rs, x -> greatest(-x, 0.0))),
            (acc, x) -> acc + x) AS losses
    FROM tagg
),
ttail AS (
    SELECT *,
        greatest(1, CAST(floor(nd * {RACHEV_ALPHA!r}) AS INT)) AS k_tail,
        greatest(1, CAST(floor(nd * {1.0 - CDAR_ALPHA!r}) AS INT)) AS k_dd
    FROM tagg2
),
tmetrics AS (
    SELECT symbol, barrier_id, n,
        gains / nullif(losses, 0.0) AS omega_raw,
        list_aggregate(list_slice(list_reverse(rs), 1, k_tail), 'sum') / CAST(k_tail AS DOUBLE) AS cvar_up,
        abs(list_aggregate(list_slice(rs, 1, k_tail), 'sum') / CAST(k_tail AS DOUBLE)) AS cvar_lo_abs,
        list_aggregate(list_slice(dds, 1, k_dd), 'sum') / CAST(k_dd AS DOUBLE) AS cdar_mean
    FROM ttail
),
tfinal AS (
    SELECT symbol, barrier_id, n,
        omega_raw,
        CASE WHEN n < {MIN_TRADES_RACHEV} THEN NULL
             WHEN cvar_lo_abs < 1e-12 THEN NULL
             ELSE least(cvar_up / cvar_lo_abs, 10.0) END AS rachev_raw,
        CASE WHEN n < {MIN_TRADES_CDAR} THEN NULL ELSE cdar_mean END AS cdar_raw
    FROM tmetrics
)"""


def tail_select() -> str:
    return """
SELECT symbol, barrier_id, n AS n_trades,
    round(omega_raw, 6) AS omega,
    round(rachev_raw, 6) AS rachev_ratio,
    round(cdar_raw, 6) AS cdar
FROM tfinal
"""


def evalues_ctes() -> str:
    ln_cap = math.log(MAX_EVALUE)
    return f"""ek AS (
    SELECT t.*, CASE WHEN f.kelly_raw > 0
        THEN greatest(f.kelly_raw / 2.0, {MIN_BET!r}) ELSE {MIN_BET!r} END AS fbet
    FROM trades t JOIN mfull f USING (symbol, barrier_id)
),
ecur AS (
    SELECT symbol, barrier_id, fbet,
        ln(1.0 + fbet * return_pct) AS logf,
        row_number() OVER w AS tn,
        least(sum(ln(1.0 + fbet * return_pct)) OVER (PARTITION BY symbol, barrier_id
            ORDER BY signal_ts_ms ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            {ln_cap!r}) AS cum
    FROM ek
    WINDOW w AS (PARTITION BY symbol, barrier_id ORDER BY signal_ts_ms)
),
evagg AS (
    SELECT symbol, barrier_id,
        count(*) AS n_trades,
        round(exp(max_by(cum, tn)), 6) AS final_evalue,
        round(exp(max(cum)), 6) AS max_evalue,
        round(list_reduce(list_prepend(0.0, list(logf ORDER BY tn)),
            (acc, x) -> acc + x) / CAST(count(*) AS DOUBLE), 8) + 0.0 AS grow_criterion,
        exp(max(cum)) >= {E_THRESHOLD!r} AS rejects_null_at_005,
        min(CASE WHEN cum >= {math.log(E_THRESHOLD)!r} THEN tn END) AS first_rejection_trade,
        round(max(fbet), 6) AS kelly_used
    FROM ecur GROUP BY symbol, barrier_id
)"""


EVALUES_SELECT = "SELECT * FROM evagg"


def dsr_select(as_cte: bool = False) -> str:
    nt = "CAST(tstats.n_trials AS DOUBLE)"
    z1 = norm_ppf_sql(f"(1.0 - 1.0 / {nt})")
    z2 = norm_ppf_sql(f"(1.0 - 1.0 / ({nt} * {math.e!r}))")
    sr = "(m / nullif(std_raw, 0.0))"
    sr_star = (
        f"(CASE WHEN {nt} <= 1 THEN 0.0 ELSE sqrt(tstats.var_sr)"
        f" * ((1.0 - {EULER_GAMMA!r}) * {z1} + {EULER_GAMMA!r} * {z2}) END)"
    )
    inner = (
        f"greatest(1.0 + 0.5 * {sr} * {sr} - skew_raw * {sr}"
        f" + (kurt_raw - 3.0) / 4.0 * {sr} * {sr}, 1e-10)"
    )
    se = f"sqrt({inner} / nd)"
    moment_adj = (
        f"greatest(1.0 - skew_raw * {sr} / 3.0"
        f" + (kurt_raw - 1.0) / 4.0 * {sr} * {sr}, 0.1)"
    )
    z_a = python_norm_ppf(ALPHA)
    z2_, z3_ = z_a * z_a, z_a * z_a * z_a
    z_cf = (
        f"({z_a!r} + {1.0 / 6.0!r} * {z2_ - 1.0!r} * skew_raw"
        f" + {1.0 / 24.0!r} * {z3_ - 3.0 * z_a!r} * (kurt_raw - 3.0)"
        f" - {1.0 / 36.0!r} * {2.0 * z3_ - 5.0 * z_a!r} * skew_raw * skew_raw)"
    )
    srlist = (
        "list(m / nullif(std_raw, 0.0) ORDER BY symbol, barrier_id)"
        " FILTER (WHERE m / nullif(std_raw, 0.0) IS NOT NULL)"
    )
    srsum = f"list_reduce(list_prepend(0.0, {srlist}), (acc, x) -> acc + x)"
    srsq = (
        f"list_reduce(list_prepend(0.0, list_transform({srlist}, x -> x * x)),"
        f" (acc, x) -> acc + x)"
    )
    nn = f"CAST(len({srlist}) AS DOUBLE)"
    body_tail = "" if not as_cte else ")"
    head = ", dsrout AS (" if as_cte else ""
    return f"""
, tstats AS (
    SELECT count(*) AS n_trials,
        greatest({srsq} - {nn} * ({srsum} / {nn}) * ({srsum} / {nn}), 0.0)
            / nullif({nn} - 1.0, 0.0) AS var_sr
    FROM mfull
)
{head}SELECT symbol, barrier_id, n AS n_trades,
    round({sr}, 6) AS sharpe,
    round({norm_cdf_sql(f"({sr} / nullif({se}, 0.0))")}, 6) AS psr,
    round({sr_star}, 6) AS expected_max_sr,
    round({norm_cdf_sql(f"(({sr} - {sr_star}) / nullif({se}, 0.0))")}, 6) AS dsr,
    round(CASE WHEN abs({sr}) < 1e-8 THEN NULL
        ELSE 2.0 * ln({nt}) / ({sr} * {sr}) * {moment_adj} END, 6) AS minbtl,
    round({z_cf}, 6) AS cf_quantile,
    round(m + {z_cf} * std_raw, 6) AS cf_var
FROM mfull, tstats{body_tail}
"""


def _rnfold(val: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list({val} ORDER BY rn)),"
        f" (acc, x) -> acc + x)"
    )


OU_CTES = f"""oud AS (
    SELECT symbol, rn, close,
        lag(close, 1) OVER (PARTITION BY symbol ORDER BY rn) AS x
    FROM bars
),
oud2 AS (
    SELECT symbol, rn, close, x, close - x AS y FROM oud WHERE x IS NOT NULL
),
ouagg AS (
    SELECT symbol,
        CAST(count(*) AS DOUBLE) AS n,
        {_rnfold("x")} AS sx, {_rnfold("y")} AS sy,
        {_rnfold("x * y")} AS sxy, {_rnfold("x * x")} AS sxx,
        {_rnfold("y * y")} AS syy,
        {_rnfold("close")} / CAST(count(*) AS DOUBLE) AS mean_price
    FROM oud2 GROUP BY symbol
),
ouc AS (
    SELECT symbol, mean_price, n,
        sxx - sx * sx / n AS sxx_c,
        sxy - sx * sy / n AS sxy_c,
        syy - sy * sy / n AS syy_c
    FROM ouagg
),
oub AS (
    SELECT *, sxy_c / nullif(sxx_c, 0.0) AS b FROM ouc
),
oufit AS (
    SELECT symbol, -b AS mu,
        sqrt(greatest(syy_c - b * sxy_c, 0.0) / n) AS sigma,
        mean_price,
        ln(2.0) / (-b) AS hl
    FROM oub
),
oufinal AS (
    SELECT symbol,
        CASE WHEN mu > 0 THEN mu END AS mu_valid,
        CASE WHEN mu > 0 THEN sigma END AS sigma_valid,
        CASE WHEN mu > 0 THEN hl END AS hl_valid,
        CASE WHEN mu > 0 THEN
            CASE WHEN mean_price > 0 THEN sigma * sqrt(hl) / mean_price ELSE 0.0 END
        END AS tp_frac_raw
    FROM oufit
)"""

OU_SELECT = """
SELECT symbol,
    round(mu_valid, 8) AS mu_dt,
    round(sigma_valid, 8) AS sigma_dt,
    round(hl_valid, 6) AS half_life,
    round(tp_frac_raw, 8) AS optimal_tp_frac
FROM oufinal
"""


def tamrs_select(grid_cte: str | None, bar_range: float) -> str:
    """Append after TAIL_CTES + OU_CTES; ``grid_cte`` must define
    barrier_grid(barrier_id, tp_mult, sl_mult, ...) — pass None when a
    barrier_grid CTE is already in scope (e.g. from the trades chain)."""
    sl_emp = f"(sl_mult * {bar_range!r})"
    tp_emp = f"(tp_mult * {bar_range!r})"
    sl_cdar = f"(CASE WHEN cdar_raw > 0 THEN least(1.0, abs({sl_emp}) / cdar_raw) END)"
    ou_ratio = f"(CASE WHEN tp_frac_raw > 0 THEN least(1.0, {tp_emp} / tp_frac_raw) END)"
    grid_part = f"\n, {grid_cte}" if grid_cte else ""
    return f"""{grid_part}
SELECT t.symbol, t.barrier_id, t.n AS n_trades,
    round(t.rachev_raw, 6) AS rachev_ratio,
    round({sl_cdar}, 6) AS sl_cdar_ratio,
    round({ou_ratio}, 6) AS ou_barrier_ratio,
    round(t.rachev_raw * {sl_cdar} * {ou_ratio}, 6) AS tamrs
FROM tfinal t
JOIN barrier_grid g ON t.barrier_id = g.barrier_id
JOIN oufinal o ON t.symbol = o.symbol
"""


def ebh_select() -> str:
    return f"""
, epos AS (
    SELECT * FROM evagg WHERE final_evalue IS NOT NULL AND final_evalue > 0
),
eranked AS (
    SELECT symbol, barrier_id, final_evalue,
        row_number() OVER (ORDER BY final_evalue DESC, symbol, barrier_id) AS k,
        count(*) OVER () AS kk
    FROM epos
),
ekstar AS (
    SELECT *, coalesce(max(CASE WHEN CAST(k AS DOUBLE) * final_evalue
        / CAST(kk AS DOUBLE) >= {E_THRESHOLD!r} THEN k END) OVER (), 0) AS k_star
    FROM eranked
)
SELECT symbol, barrier_id, final_evalue,
    CAST(k AS BIGINT) AS e_rank,
    CAST(k_star AS BIGINT) AS k_star,
    k <= k_star AS is_discovery
FROM ekstar
"""


def ranking_select(metric_exprs: dict[str, str], top_pct: float, src: str) -> str:
    """E15/E16 twin: metric_exprs maps output-metric name -> SQL expr over
    ``src`` relation rows."""
    cols = list(metric_exprs)
    sel_metrics = ", ".join(f"round({e}, 6) AS {c}" for c, e in metric_exprs.items())
    ranks = ", ".join(
        f"percent_rank() OVER (ORDER BY {c} ASC NULLS FIRST) AS {c}_pctrank"
        for c in cols
    )
    survive = " AND ".join(f"{c}_pctrank >= {1.0 - top_pct!r}" for c in cols)
    norms = ", ".join(f"sqrt(sum({c} * {c}) OVER ()) AS norm_{c}" for c in cols)
    vnorm = ", ".join(f"{c} / nullif(norm_{c}, 0.0) AS v_{c}" for c in cols)
    ideals = ", ".join(
        f"max(v_{c}) OVER () AS ideal_{c}, min(v_{c}) OVER () AS nadir_{c}"
        for c in cols
    )
    d_pos = " + ".join(f"(v_{c} - ideal_{c}) * (v_{c} - ideal_{c})" for c in cols)
    d_neg = " + ".join(f"(v_{c} - nadir_{c}) * (v_{c} - nadir_{c})" for c in cols)
    rank_cols = ", ".join(f"round({c}_pctrank, 6) AS {c}_pctrank" for c in cols)
    return f"""
, rk0 AS (SELECT symbol, barrier_id, {sel_metrics} FROM {src}),
rk1 AS (SELECT *, {ranks}, {norms} FROM rk0),
rk2 AS (SELECT *, {vnorm} FROM rk1),
rk3 AS (SELECT *, {ideals} FROM rk2)
SELECT symbol, barrier_id, {rank_cols},
    ({survive}) AS survivor,
    round(sqrt({d_neg}) / nullif(sqrt({d_pos}) + sqrt({d_neg}), 0.0), 6) AS topsis_score
FROM rk3
"""


def cutoff_grid_select(
    metric_exprs: dict[str, str],
    candidates: list[tuple[int, ...]],
    src: str,
) -> str:
    """E29 twin (operators/cutoff_search.evaluate_cutoffs over the
    deterministic grid): percent-rank each metric, cross join the
    candidate cutoff vectors, aggregate survivors / value-sorted mean
    quality / objective per candidate."""
    from ..functions.detsum import duck_fold

    cols = list(metric_exprs)
    m = len(cols)
    sel_metrics = ", ".join(f"round({e}, 6) AS {c}" for c, e in metric_exprs.items())
    ranks = ", ".join(
        f"percent_rank() OVER (ORDER BY {c} ASC NULLS FIRST) AS {c}_pctrank"
        for c in cols
    )
    cut_cols = ", ".join(f"cut_{c}" for c in cols)
    vals = ",\n        ".join(
        f"({i}, " + ", ".join(str(x) for x in v) + ")"
        for i, v in enumerate(candidates)
    )
    passes = " AND ".join(
        f"{c}_pctrank >= 1.0 - CAST(cut_{c} AS DOUBLE) / 100.0" for c in cols
    )
    quality = "(" + " + ".join(f"{c}_pctrank" for c in cols) + f") / {float(m)!r}"
    mean_cut = (
        "CAST(" + " + ".join(f"cut_{c}" for c in cols) + f" AS DOUBLE) / {float(m)!r}"
    )
    qual_fold = duck_fold(quality, quality, passes)
    return f"""
, co0 AS (SELECT symbol, barrier_id, {sel_metrics} FROM {src}),
co1 AS (SELECT *, {ranks} FROM co0),
cands(cand_id, {cut_cols}) AS (VALUES
        {vals}),
co2 AS (
    SELECT cand_id, {cut_cols},
        CAST(sum(CASE WHEN {passes} THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
        round({qual_fold}
            / nullif(CAST(sum(CASE WHEN {passes} THEN 1 ELSE 0 END) AS DOUBLE), 0.0), 6)
            AS avg_quality
    FROM co1 CROSS JOIN cands
    GROUP BY cand_id, {cut_cols}
)
SELECT *, {mean_cut} AS mean_cutoff,
    round(CAST(n_survivors AS DOUBLE) / ({mean_cut}), 6) AS objective
FROM co2
"""
