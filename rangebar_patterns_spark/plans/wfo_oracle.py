"""DuckDB oracle twins for the WFO layer (operators/wfo.py).

Mirrors fold arithmetic exactly.  Casting note: DuckDB CAST(double AS INT)
*rounds*, Spark truncates — every fractional index here goes through
floor() before CAST so both engines truncate identically (values are
non-negative).
"""

from __future__ import annotations

from itertools import combinations

from ..functions.quantiles import duck_q6_expr
from ..operators.wfo import (
    CPCV_BLOCKS,
    CPCV_EMBARGO,
    MBB_B,
    MBB_BLOCK,
    MDD_CAP,
    N_FOLDS,
    PURGE_TRADES,
)

_FOLD = (
    "list_reduce(list_prepend(0.0, {arr}), (acc, x) -> acc + x)"
)


def _omega_sql(rs: str) -> str:
    gains = _FOLD.format(arr=f"list_transform({rs}, x -> greatest(x, 0.0))")
    losses = _FOLD.format(arr=f"list_transform({rs}, x -> greatest(-x, 0.0))")
    return f"({gains} / nullif({losses}, 0.0))"


def _median_sql(lst: str) -> str:
    s = f"list_sort(list_filter({lst}, x -> x IS NOT NULL))"
    n = f"len({s})"
    mid = f"CAST(floor({n} / 2) AS INT)"
    return (
        f"(CASE WHEN {n} = 0 THEN NULL"
        f" WHEN {n} % 2 = 1 THEN {s}[{mid} + 1]"
        f" ELSE ({s}[{mid}] + {s}[{mid} + 1]) / 2.0 END)"
    )


TN_CTE = """wft AS (
    SELECT *,
        row_number() OVER (PARTITION BY symbol, barrier_id ORDER BY signal_ts_ms) AS tn,
        count(*) OVER (PARTITION BY symbol, barrier_id) AS n_total
    FROM trades
)"""


def wf_fold_ctes(k: int = N_FOLDS, purge: int = PURGE_TRADES) -> str:
    return f"""wff AS (
    SELECT t.*, f.fold,
        CAST(floor(n_total / {k}) AS INT) AS tsz
    FROM wft t, (SELECT unnest(generate_series(0, {k - 1})) AS fold) f
),
wfm AS (
    SELECT *,
        (tn > fold * tsz AND tn <= CASE WHEN fold = {k - 1} THEN n_total
                                        ELSE (fold + 1) * tsz END) AS is_test,
        (tn <= fold * tsz - {purge}) AS is_train
    FROM wff
),
wfs AS (
    SELECT *, CASE WHEN is_test THEN 'test' ELSE 'train' END AS split
    FROM wfm WHERE is_test OR is_train
),
wfc AS (
    SELECT *,
        sum(return_pct) OVER wseq AS _cum
    FROM wfs
    WINDOW wseq AS (PARTITION BY symbol, barrier_id, fold, split ORDER BY tn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
wfd AS (
    SELECT *,
        max(_cum) OVER wseq - _cum AS _dd
    FROM wfc
    WINDOW wseq AS (PARTITION BY symbol, barrier_id, fold, split ORDER BY tn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
wfu AS (
    SELECT *,
        CAST(_dd > 1e-12 AS INT) AS _uw,
        coalesce(lag(CAST(_dd > 1e-12 AS INT), 1) OVER
            (PARTITION BY symbol, barrier_id, fold, split ORDER BY tn), 0) AS _uw_prev
    FROM wfd
),
wfr AS (
    SELECT *,
        sum(CAST(_uw = 1 AND _uw_prev = 0 AS INT)) OVER
            (PARTITION BY symbol, barrier_id, fold, split ORDER BY tn
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _run_id
    FROM wfu
),
wfps AS (
    SELECT symbol, barrier_id, fold, split,
        count(*) AS n,
        round({_omega_sql("list(return_pct ORDER BY return_pct)")}, 6) AS omega,
        round(max(_dd), 6) AS max_drawdown,
        max(CASE WHEN _uw = 1 THEN _run_id END) AS _n_runs,
        sum(_uw) AS _uw_total
    FROM wfr GROUP BY symbol, barrier_id, fold, split
),
wfw AS (
    SELECT symbol, barrier_id, fold,
        coalesce(max(CASE WHEN split = 'train' THEN n END), 0) AS train_n,
        max(CASE WHEN split = 'train' THEN omega END) AS train_omega,
        coalesce(max(CASE WHEN split = 'test' THEN n END), 0) AS test_n,
        max(CASE WHEN split = 'test' THEN omega END) AS test_omega,
        max(CASE WHEN split = 'test' THEN max_drawdown END) AS test_max_drawdown,
        CAST(coalesce(max(CASE WHEN split = 'test' THEN _n_runs END), 0) AS BIGINT) AS test_underwater_runs,
        CAST(coalesce(max(CASE WHEN split = 'test' THEN _uw_total END), 0) AS BIGINT) AS test_underwater_trades
    FROM wfps GROUP BY symbol, barrier_id, fold
    -- empty-train folds (fold 0) are never scored OOS, matching
    -- operators/wfo.py wf_fold_metrics and reference walk_forward.py:99
    HAVING coalesce(max(CASE WHEN split = 'train' THEN n END), 0) > 0
)"""


WF_FOLD_SELECT = "SELECT * FROM wfw"

_MEDOM = _median_sql("list(test_omega)")

WF_TOPK_SELECT = f"""
, wfmed AS (
    SELECT symbol, barrier_id,
        sign({_MEDOM}) * floor(abs({_MEDOM}) * 1e6 + 0.5) / 1e6 AS median_test_omega,
        count(*) AS n_folds
    FROM wfw GROUP BY symbol, barrier_id
)
SELECT symbol, barrier_id, median_test_omega, n_folds,
    CAST(row_number() OVER (PARTITION BY symbol
        ORDER BY median_test_omega DESC NULLS LAST, barrier_id ASC) AS BIGINT) AS rank,
    row_number() OVER (PARTITION BY symbol
        ORDER BY median_test_omega DESC NULLS LAST, barrier_id ASC) <= 5 AS selected
FROM wfmed
"""


def cpcv_ctes(n_blocks: int = CPCV_BLOCKS, embargo: int = CPCV_EMBARGO) -> str:
    splits = ", ".join(
        f"({i}, {b1}, {b2})"
        for i, (b1, b2) in enumerate(combinations(range(n_blocks), 2))
    )
    return f"""cpb AS (
    SELECT *,
        least(CAST(floor((tn - 1) / CAST(ceil(n_total / {n_blocks}) AS INT)) AS INT),
              {n_blocks - 1}) AS block,
        CAST(ceil(n_total / {n_blocks}) AS INT) AS bsz
    FROM wft
),
cps AS (
    SELECT * FROM (VALUES {splits}) AS t(split_id, tb1, tb2)
),
cpj AS (
    SELECT b.*, s.split_id, s.tb1, s.tb2,
        (b.block = s.tb1 OR b.block = s.tb2) AS in_test,
        (b.block = s.tb1 + 1 AND b.tn - (s.tb1 + 1) * b.bsz <= {embargo}) AS after1,
        (b.block = s.tb2 + 1 AND b.tn - (s.tb2 + 1) * b.bsz <= {embargo}) AS after2
    FROM cpb b CROSS JOIN cps s
),
cpf AS (
    SELECT *, CASE WHEN in_test THEN 'test' ELSE 'train' END AS split
    FROM cpj WHERE in_test OR NOT (after1 OR after2)
),
cpperf AS (
    SELECT symbol, barrier_id, split_id, split,
        round({_omega_sql("list(return_pct ORDER BY return_pct)")}, 6) AS omega
    FROM cpf GROUP BY symbol, barrier_id, split_id, split
),
cpw AS (
    SELECT symbol, barrier_id, split_id,
        max(CASE WHEN split = 'train' THEN omega END) AS train,
        max(CASE WHEN split = 'test' THEN omega END) AS test
    FROM cpperf GROUP BY symbol, barrier_id, split_id
),
cprank AS (
    SELECT *, row_number() OVER (PARTITION BY symbol, split_id
        ORDER BY train DESC NULLS LAST, barrier_id ASC) AS is_rank
    FROM cpw
),
cpmed AS (
    SELECT symbol, split_id, {_median_sql("list(test)")} AS oos_median
    FROM cpw GROUP BY symbol, split_id
),
cpwin AS (
    SELECT r.symbol, r.split_id, r.test, m.oos_median
    FROM cprank r JOIN cpmed m ON r.symbol = m.symbol AND r.split_id = m.split_id
    WHERE r.is_rank = 1
)"""


CPCV_PBO_SELECT = """
SELECT symbol,
    count(*) AS n_splits,
    CAST(sum(CASE WHEN test IS NULL OR test < oos_median THEN 1 ELSE 0 END) AS BIGINT)
        AS n_underperform,
    round(CAST(sum(CASE WHEN test IS NULL OR test < oos_median THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(count(*) AS DOUBLE), 6) AS pbo
FROM cpwin GROUP BY symbol
"""


def mbb_ctes(b_reps: int = MBB_B, block: int = MBB_BLOCK) -> str:
    seedkey = "symbol || '|' || barrier_id || '|' || CAST(rep AS VARCHAR)"
    start = (
        f"CAST(('0x' || substr(md5({seedkey} || '#' || CAST(j AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" % CAST(n - {block} + 1 AS BIGINT) + 1"
    )
    return f"""mbase AS (
    SELECT symbol, barrier_id,
        list(return_pct ORDER BY tn) AS rs,
        CAST(count(*) AS INT) AS n
    FROM wft GROUP BY symbol, barrier_id
    HAVING count(*) >= {block}
),
mgrid AS (
    SELECT *, CAST(ceil(n / {block}) AS INT) AS nblocks
    FROM mbase, (SELECT unnest(generate_series(1, {b_reps})) AS rep) r
),
msample AS (
    SELECT symbol, barrier_id, n, rep,
        flatten(list_transform(generate_series(1, nblocks),
            j -> list_slice(rs, CAST({start} AS INT), CAST({start} AS INT) + {block} - 1)))
            AS sampled
    FROM mgrid
),
mmeans AS (
    SELECT symbol, barrier_id, n, rep,
        {_FOLD.format(arr="sampled")} / CAST(len(sampled) AS DOUBLE) AS mean_r
    FROM msample
),
magg AS (
    SELECT symbol, barrier_id,
        CAST(max(n) AS BIGINT) AS n_trades,
        list(mean_r ORDER BY mean_r) AS ms
    FROM mmeans GROUP BY symbol, barrier_id
)"""


def mbb_select(b_reps: int = MBB_B, alpha: float = 0.05) -> str:
    return f"""
SELECT symbol, barrier_id, n_trades,
    CAST({b_reps} AS BIGINT) AS b_reps,
    round({duck_q6_expr("ms", alpha / 2.0)}, 8) AS ci_low,
    round({duck_q6_expr("ms", 1.0 - alpha / 2.0)}, 8) AS ci_high,
    round({_median_sql("ms")}, 8) AS boot_median
FROM magg
"""


def gt_select() -> str:
    gt = (
        "omega_raw * least(1.0, abs(d.dsr)) * (1.0 - p.pbo)"
        f" * greatest(0.0, 1.0 - w.worst_mdd / {MDD_CAP!r})"
    )
    return f"""
, gtm AS (
    SELECT symbol, barrier_id, max(test_max_drawdown) AS worst_mdd
    FROM wfw GROUP BY symbol, barrier_id
)
SELECT t.symbol, t.barrier_id,
    round(t.omega_raw, 6) AS omega,
    d.dsr, p.pbo,
    round(w.worst_mdd, 6) AS worst_mdd,
    round({gt}, 6) AS gt_composite
FROM tfinal t
JOIN dsrout d ON t.symbol = d.symbol AND t.barrier_id = d.barrier_id
JOIN gtm w ON t.symbol = w.symbol AND t.barrier_id = w.barrier_id
JOIN (SELECT symbol, pbo FROM ({CPCV_PBO_SELECT.strip()}) ) p ON t.symbol = p.symbol
"""


def wf_objectives_ctes(k: int = N_FOLDS) -> str:
    """Twin of ``stability.fold_objectives``: test-block-only per-fold
    (omega, rachev, total_return) — the E23 stability matrix input
    (reference build_stability_matrix, walk_forward.py:713-767)."""
    from ..operators.eval_metrics import MIN_TRADES_RACHEV, RACHEV_ALPHA

    tot = _FOLD.format(arr="list(return_pct ORDER BY tn)")
    return f"""wobj_f AS (
    SELECT t.*, f.fold, CAST(floor(n_total / {k}) AS INT) AS tsz
    FROM wft t, (SELECT unnest(generate_series(0, {k - 1})) AS fold) f
),
wobj_t AS (
    SELECT * FROM wobj_f
    WHERE tn > fold * tsz
      AND tn <= CASE WHEN fold = {k - 1} THEN n_total ELSE (fold + 1) * tsz END
),
wobj_a AS (
    SELECT symbol, barrier_id, fold,
        count(*) AS n, CAST(count(*) AS DOUBLE) AS nd,
        list(return_pct ORDER BY return_pct) AS rs,
        {tot} AS tot
    FROM wobj_t GROUP BY symbol, barrier_id, fold
),
wobj_k AS (
    SELECT *, greatest(1, CAST(floor(nd * {RACHEV_ALPHA!r}) AS INT)) AS k_tail
    FROM wobj_a
),
wobj_x AS (
    SELECT symbol, barrier_id, fold, n, tot,
        {_omega_sql("rs")} AS omega_raw,
        list_aggregate(list_slice(list_reverse(rs), 1, k_tail), 'sum')
            / CAST(k_tail AS DOUBLE) AS cvar_up,
        abs(list_aggregate(list_slice(rs, 1, k_tail), 'sum')
            / CAST(k_tail AS DOUBLE)) AS cvar_lo_abs
    FROM wobj_k
)"""


def wf_objectives_select() -> str:
    from ..operators.eval_metrics import MIN_TRADES_RACHEV

    return f"""
SELECT symbol, barrier_id, fold, CAST(n AS BIGINT) AS test_n,
    round(omega_raw, 6) AS omega,
    round(CASE WHEN n < {MIN_TRADES_RACHEV} THEN NULL
               WHEN cvar_lo_abs < 1e-12 THEN NULL
               ELSE least(cvar_up / cvar_lo_abs, 10.0) END, 6) AS rachev_ratio,
    round(tot, 6) + 0.0 AS total_return
FROM wobj_x
"""
