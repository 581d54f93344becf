"""DuckDB twin of operators/rolling_rdd.py (gen800 rolling RDD + TOPSIS).

Mirrors the Spark expressions term-for-term — and deliberately avoids
ordered LIST AGGREGATES anywhere on a comparison-feeding path: DuckDB's
in-aggregate ORDER BY (and even ``list_sort(list(...))``, which the
optimizer fuses back into an ordered aggregate) was observed to produce
merge-order-dependent results under memory pressure.  Every ordered
computation here is either a window function with an explicit ROWS frame
(running cumsum/max — evaluated as a sequential fold in both engines), an
exact integer-scaled sum (ratios/criteria are rounded-4, so ×1e4 scaling
is exact and integer sums are associative), or a row_number element pick.

Reference semantics: scripts/gen800_rolling_rdd.py:108-276,
src/opendeviationbar_patterns/eval/ranking.py:333-367."""

from __future__ import annotations

from ..operators.rolling_rdd import DAY_MS, GEN800_CRITERIA

#: percentiles the distribution summary reports
_QS = [("median_ratio", 0.5), ("p10_ratio", 0.10), ("p25_ratio", 0.25),
       ("p75_ratio", 0.75), ("p90_ratio", 0.90)]


def gen800_ctes(
    window_days: int,
    step_days: int,
    min_trades: int,
    ratio_cap: float,
    min_valid_windows: int,
) -> str:
    """CTE chain (appended after a ``trades`` relation + ``bars``) ending
    in a final SELECT of the ranked per-(barrier_id, symbol) panel."""
    W = window_days * DAY_MS
    S = step_days * DAY_MS

    # per-q element picks: h = (n-1)q, a = sorted[floor(h)+1],
    # b = sorted[least(floor(h)+2, n)] via row_number equality
    def _lo(q: float) -> str:
        return f"CAST(floor(CAST(_nw - 1 AS DOUBLE) * {q!r}) AS BIGINT)"

    pick_cols = ",\n        ".join(
        f"max(CASE WHEN _rr = {_lo(q)} + 1 THEN return_dd_ratio END) AS _a_{name},\n"
        f"        max(CASE WHEN _rr = least({_lo(q)} + 2, _nw)"
        f" THEN return_dd_ratio END) AS _b_{name}"
        for name, q in _QS
    )
    pctl_cols = ",\n        ".join(
        f"round(_a_{name} + (_b_{name} - _a_{name})"
        f" * (CAST(n_windows - 1 AS DOUBLE) * {q!r}"
        f" - floor(CAST(n_windows - 1 AS DOUBLE) * {q!r})), 4) AS {name}"
        for name, q in _QS
    )

    mean_u = "(CAST(_sum_sc AS DOUBLE) / (10000.0 * CAST(n_windows AS DOUBLE)))"
    var = (
        f"greatest(0.0, CAST(_sumsq_sc AS DOUBLE)"
        f" / (100000000.0 * CAST(n_windows AS DOUBLE)) - {mean_u} * {mean_u})"
    )

    crit_norm = ",\n        ".join(
        f"sqrt(CAST(sum(CAST(round({c} * 10000) AS DECIMAL(12,0))"
        f" * CAST(round({c} * 10000) AS DECIMAL(12,0)))"
        f" AS DOUBLE) / 100000000.0) AS _norm_{c}"
        for c, _, _ in GEN800_CRITERIA
    )
    crit_w = ",\n        ".join(
        f"s.{c} / (CASE WHEN n._norm_{c} = 0.0 THEN 1.0 ELSE n._norm_{c} END)"
        f" * {w!r} AS _w_{c}"
        for c, w, _ in GEN800_CRITERIA
    )
    crit_ext = ",\n        ".join(
        f"max(_w_{c}) AS _max_{c},\n        min(_w_{c}) AS _min_{c}"
        for c, _, _ in GEN800_CRITERIA
    )
    d_pos = " + ".join(
        f"(_w_{c} - {'_max_' if t == 1 else '_min_'}{c})"
        f" * (_w_{c} - {'_max_' if t == 1 else '_min_'}{c})"
        for c, _, t in GEN800_CRITERIA
    )
    d_neg = " + ".join(
        f"(_w_{c} - {'_min_' if t == 1 else '_max_'}{c})"
        f" * (_w_{c} - {'_min_' if t == 1 else '_max_'}{c})"
        for c, _, t in GEN800_CRITERIA
    )
    stat_cols = (
        "symbol, barrier_id, n_windows, n_trades_total, median_ratio, "
        "mean_ratio, std_ratio, p10_ratio, p25_ratio, p75_ratio, p90_ratio, "
        "min_ratio, max_ratio, frac_gt_2, frac_gt_1, frac_lt_1, "
        "frac_negative, worst_window_start_ms, worst_window_ratio, "
        "best_window_start_ms, best_window_ratio, ratio_cv"
    )
    return f"""xt AS (
    SELECT t.*, b.close_time_ms AS exit_ts_ms
    FROM trades t
    JOIN bars b ON b.symbol = t.symbol AND b.rn = t.signal_rn + 1 + t.exit_bar
),
g8bounds AS (
    SELECT symbol, barrier_id, min(exit_ts_ms) AS _earliest,
        max(exit_ts_ms) AS _latest
    FROM xt GROUP BY symbol, barrier_id
),
g8k AS (
    SELECT x.*, b._earliest, b._latest,
        b._earliest + {W} AS _first_end,
        (b._earliest + {W}) > b._latest AS _single,
        CASE WHEN (b._earliest + {W}) > b._latest THEN 0
             ELSE greatest(CAST(0 AS BIGINT),
                  CAST(ceil(CAST(x.exit_ts_ms - (b._earliest + {W}) AS DOUBLE) / {S}) AS BIGINT))
        END AS _klo,
        CASE WHEN (b._earliest + {W}) > b._latest THEN 0
             ELSE least(
                  CAST(floor(CAST(b._latest - (b._earliest + {W}) AS DOUBLE) / {S}) AS BIGINT),
                  CAST(floor(CAST(x.exit_ts_ms + {W} - (b._earliest + {W}) AS DOUBLE) / {S}) AS BIGINT))
        END AS _khi
    FROM xt x JOIN g8bounds b USING (symbol, barrier_id)
),
g8exp AS (
    SELECT *, unnest(generate_series(_klo, _khi)) AS k
    FROM g8k WHERE _klo <= _khi
),
g8w AS (
    SELECT *,
        CASE WHEN _single THEN _earliest ELSE _first_end + k * {S} - {W} END AS w_start_ms,
        CASE WHEN _single THEN _latest ELSE _first_end + k * {S} END AS w_end_ms
    FROM g8exp
),
g8cum0 AS (
    SELECT *,
        sum(return_pct) OVER wk AS _cum,
        row_number() OVER (PARTITION BY symbol, barrier_id, k
                           ORDER BY exit_ts_ms, signal_rn) AS _tn,
        count(*) OVER (PARTITION BY symbol, barrier_id, k) AS _cnt
    FROM g8w
    WINDOW wk AS (PARTITION BY symbol, barrier_id, k
                  ORDER BY exit_ts_ms, signal_rn
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
g8cum AS (
    SELECT *,
        max(_cum) OVER (PARTITION BY symbol, barrier_id, k
                        ORDER BY exit_ts_ms, signal_rn
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _runmax
    FROM g8cum0
),
g8win0 AS (
    SELECT symbol, barrier_id, k, w_start_ms, w_end_ms,
        count(*) AS n_trades,
        round(max(CASE WHEN _tn = _cnt THEN _cum END), 6) AS total_return,
        round(max(_runmax - _cum), 6) AS max_drawdown
    FROM g8cum
    GROUP BY symbol, barrier_id, k, w_start_ms, w_end_ms
),
g8win AS (
    SELECT *,
        round(CASE WHEN max_drawdown > 1e-12
                   THEN least(total_return / max_drawdown, CAST({ratio_cap!r} AS DOUBLE))
                   WHEN total_return > 0 THEN CAST({ratio_cap!r} AS DOUBLE)
                   ELSE 0.0 END, 4) AS return_dd_ratio
    FROM g8win0
    WHERE n_trades >= {min_trades}
),
g8rext AS (
    SELECT symbol, barrier_id, min(return_dd_ratio) AS _minr,
        max(return_dd_ratio) AS _maxr
    FROM g8win GROUP BY symbol, barrier_id
),
g8wr AS (
    SELECT w.*, e._minr, e._maxr,
        row_number() OVER (PARTITION BY w.symbol, w.barrier_id
                           ORDER BY w.return_dd_ratio, w.k) AS _rr,
        count(*) OVER (PARTITION BY w.symbol, w.barrier_id) AS _nw
    FROM g8win w JOIN g8rext e USING (symbol, barrier_id)
),
g8sa AS (
    SELECT symbol, barrier_id,
        count(*) AS n_windows,
        sum(n_trades) AS n_trades_total,
        min(_minr) AS _worst_r,
        max(_maxr) AS _best_r,
        min(CASE WHEN return_dd_ratio = _minr THEN w_start_ms END) AS _worst_ws,
        min(CASE WHEN return_dd_ratio = _maxr THEN w_start_ms END) AS _best_ws,
        CAST(sum(CAST(round(return_dd_ratio * 10000) AS BIGINT)) AS BIGINT) AS _sum_sc,
        sum(CAST(round(return_dd_ratio * 10000) AS DECIMAL(12,0))
            * CAST(round(return_dd_ratio * 10000) AS DECIMAL(12,0))) AS _sumsq_sc,
        {pick_cols},
        sum(CASE WHEN return_dd_ratio > 2.0 THEN 1 ELSE 0 END) AS _n_gt2,
        sum(CASE WHEN return_dd_ratio > 1.0 THEN 1 ELSE 0 END) AS _n_gt1,
        sum(CASE WHEN return_dd_ratio < 1.0 THEN 1 ELSE 0 END) AS _n_lt1,
        sum(CASE WHEN return_dd_ratio < 0.0 THEN 1 ELSE 0 END) AS _n_neg
    FROM g8wr
    GROUP BY symbol, barrier_id
),
g8stats0 AS (
    SELECT symbol, barrier_id,
        CAST(n_windows AS BIGINT) AS n_windows,
        CAST(n_trades_total AS BIGINT) AS n_trades_total,
        {pctl_cols},
        round({mean_u}, 4) AS mean_ratio,
        round(sqrt({var}), 4) AS std_ratio,
        _worst_r AS min_ratio,
        _best_r AS max_ratio,
        round(_n_gt2 / CAST(n_windows AS DOUBLE), 4) AS frac_gt_2,
        round(_n_gt1 / CAST(n_windows AS DOUBLE), 4) AS frac_gt_1,
        round(_n_lt1 / CAST(n_windows AS DOUBLE), 4) AS frac_lt_1,
        round(_n_neg / CAST(n_windows AS DOUBLE), 4) AS frac_negative,
        _worst_ws AS worst_window_start_ms,
        _worst_r AS worst_window_ratio,
        _best_ws AS best_window_start_ms,
        _best_r AS best_window_ratio
    FROM g8sa
    WHERE n_windows >= {min_valid_windows}
),
g8stats AS (
    SELECT *, CASE WHEN mean_ratio > 1e-6
                   THEN round(std_ratio / mean_ratio, 4) END AS ratio_cv
    FROM g8stats0
),
g8norms AS (
    SELECT barrier_id,
        {crit_norm}
    FROM g8stats GROUP BY barrier_id
),
g8tw AS (
    SELECT s.*,
        {crit_w}
    FROM g8stats s JOIN g8norms n USING (barrier_id)
),
g8ext AS (
    SELECT barrier_id,
        {crit_ext}
    FROM g8tw GROUP BY barrier_id
),
g8fin AS (
    SELECT t.*,
        sqrt({d_pos}) AS _dpos,
        sqrt({d_neg}) AS _dneg
    FROM g8tw t JOIN g8ext e USING (barrier_id)
)
SELECT {stat_cols},
    round(CASE WHEN _dpos + _dneg = 0.0 THEN 0.0
               ELSE _dneg / (_dpos + _dneg) END, 4) AS topsis_score,
    CAST(row_number() OVER (
        PARTITION BY barrier_id
        ORDER BY round(CASE WHEN _dpos + _dneg = 0.0 THEN 0.0
                            ELSE _dneg / (_dpos + _dneg) END, 4) DESC,
                 symbol ASC) AS INT) AS rank
FROM g8fin"""
