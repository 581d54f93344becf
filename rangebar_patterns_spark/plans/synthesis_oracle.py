"""DuckDB oracle twins for operators/synthesis.py (E10 Romano–Wolf,
E14 Spearman matrix).

Same LCG, same fold order, same integer rank arithmetic — see the operator
module docstring for the determinism contract.
"""

from __future__ import annotations

from ..operators.synthesis import (
    _LCG_B,
    _LCG_I,
    _LCG_K,
    _LCG_MOD,
    _LCG_MUL,
    RW_ALPHA,
    RW_B,
    RW_MIN_TRADES,
)


def romano_wolf_select(n_bootstrap: int = RW_B) -> str:
    """Append after the trades CTE chain (relation ``trades``)."""
    p = 1.0 - RW_ALPHA
    lcg = (
        f"(((b * {_LCG_B} + i * {_LCG_I} + k * {_LCG_K}) * {_LCG_MUL})"
        f" % {_LCG_MOD}) % n + 1"
    )
    return f"""
, rwvec AS (
    SELECT symbol, barrier_id,
        list(return_pct ORDER BY signal_ts_ms) AS rs,
        CAST(count(*) AS BIGINT) AS n
    FROM trades GROUP BY symbol, barrier_id
    HAVING count(*) >= {RW_MIN_TRADES}
),
rwk AS (
    SELECT *, CAST(row_number() OVER (ORDER BY symbol, barrier_id) AS BIGINT) AS k,
        CAST(n AS DOUBLE) AS nd,
        list_reduce(list_prepend(0.0, rs), (acc, x) -> acc + x) AS s1,
        list_reduce(list_prepend(0.0, list_transform(rs, x -> x * x)),
            (acc, x) -> acc + x) AS s2
    FROM rwvec
),
rwobs AS (
    SELECT symbol, barrier_id, k, n, nd, rs,
        s1 / nd AS mean,
        sqrt(greatest(s2 - s1 * s1 / nd, 0.0) / (nd - 1.0)) / sqrt(nd) AS se
    FROM rwk
),
rwobs2 AS (
    SELECT *, CASE WHEN se > 0 THEN mean / se ELSE 0.0 END AS t_obs,
        list_transform(rs, x -> x - mean) AS centered
    FROM rwobs
),
rwboot AS (
    SELECT r.symbol, r.barrier_id, r.k, r.n, r.nd, r.centered, bs.b
    FROM rwobs2 r, (SELECT unnest(generate_series(1, {n_bootstrap})) AS b) bs
),
rwpick AS (
    SELECT symbol, barrier_id, b, n, nd,
        [centered[CAST({lcg} AS INT)] FOR i IN generate_series(1, CAST(n AS INT))] AS bsv
    FROM rwboot
),
rwbt AS (
    SELECT b,
        list_reduce(list_prepend(0.0, bsv), (acc, x) -> acc + x) AS b1,
        list_reduce(list_prepend(0.0, list_transform(bsv, x -> x * x)),
            (acc, x) -> acc + x) AS b2,
        nd
    FROM rwpick
),
rwbt2 AS (
    SELECT b,
        CASE WHEN sqrt(greatest(b2 - b1 * b1 / nd, 0.0) / (nd - 1.0)) / sqrt(nd) > 0
            THEN (b1 / nd) / (sqrt(greatest(b2 - b1 * b1 / nd, 0.0) / (nd - 1.0)) / sqrt(nd))
            ELSE 0.0 END AS bt
    FROM rwbt
),
rwmax AS (SELECT b, max(bt) AS max_t FROM rwbt2 GROUP BY b),
rwcrit AS (
    SELECT CASE
        WHEN len(smt) = 0 THEN NULL
        WHEN CAST(floor(h) AS INT) >= len(smt) THEN smt[len(smt)]
        ELSE smt[CAST(floor(h) AS INT)]
            + (h - floor(h)) * (smt[CAST(floor(h) AS INT) + 1] - smt[CAST(floor(h) AS INT)])
        END AS critical
    FROM (
        SELECT list(max_t ORDER BY max_t) AS smt,
            CAST(count(*) - 1 AS DOUBLE) * {p!r} + 1.0 AS h
        FROM rwmax
    )
)
SELECT symbol, barrier_id,
    n AS n_trades,
    round(t_obs, 4) AS t_stat,
    round(critical, 4) AS critical_value,
    t_obs > critical AS is_discovery,
    CAST({n_bootstrap} AS BIGINT) AS n_bootstrap
FROM rwobs2, rwcrit
"""


def spearman_select(metric_exprs: dict[str, str], src: str) -> str:
    """E14 twin: pairwise Spearman over ``metric_exprs`` (name -> SQL expr
    evaluated against rows of relation ``src``); doubled-integer average-tie
    ranks, exact integer sums."""
    cols = list(metric_exprs)
    base = ", ".join(f"round({e}, 6) AS {c}" for c, e in metric_exprs.items())
    parts = []
    for ai in range(len(cols)):
        for bi in range(ai + 1, len(cols)):
            a, b = cols[ai], cols[bi]
            parts.append(f"""
SELECT '{a}' AS metric_a, '{b}' AS metric_b,
    CAST(count(*) AS BIGINT) AS n_configs,
    round(CAST(count(*) * sum(ra * rb) - sum(ra) * sum(rb) AS DOUBLE)
        / nullif(sqrt(CAST(count(*) * sum(ra * ra) - sum(ra) * sum(ra) AS DOUBLE))
            * sqrt(CAST(count(*) * sum(rb * rb) - sum(rb) * sum(rb) AS DOUBLE)), 0.0),
        6) AS spearman_rho
FROM (
    SELECT CAST(2 * rank() OVER (ORDER BY {a}) + count(*) OVER (PARTITION BY {a}) - 1 AS BIGINT) AS ra,
        CAST(2 * rank() OVER (ORDER BY {b}) + count(*) OVER (PARTITION BY {b}) - 1 AS BIGINT) AS rb
    FROM spbase WHERE {a} IS NOT NULL AND {b} IS NOT NULL
)""")
    union = "\nUNION ALL\n".join(parts)
    return f"""
, spbase AS (SELECT {base} FROM {src})
{union}
"""


def signal_regularity_select() -> str:
    """E12 twin of operators/regularity.py — identical list expressions,
    densities rounded to 9 dp before comparisons."""
    from ..operators.regularity import (
        BW_SCALE,
        MIN_TRADES_REGULARITY,
        N_COVERAGE_BINS,
        PROMINENCE_FRAC,
        SQRT_2PI,
    )

    fold = lambda arr: f"list_reduce(list_prepend(0.0, {arr}), (acc, x) -> acc + x)"  # noqa: E731
    return f"""
, rg0 AS (
    SELECT symbol, barrier_id,
        list(CAST(signal_ts_ms AS DOUBLE) ORDER BY signal_ts_ms) AS ts,
        CAST(count(*) AS BIGINT) AS n_trades,
        CAST(count(*) AS DOUBLE) AS nd
    FROM trades GROUP BY symbol, barrier_id
),
rg1 AS (
    SELECT *, ts[len(ts)] - ts[1] AS rng,
        (n_trades >= {MIN_TRADES_REGULARITY} AND ts[len(ts)] - ts[1] > 0) AS ok
    FROM rg0
),
rg2 AS (
    SELECT *,
        [ts[i + 1] - ts[i] FOR i IN generate_series(1, CAST(n_trades - 1 AS INT))] AS iats,
        [(x - ts[1]) / rng FOR x IN ts] AS tsn
    FROM rg1
),
rg3 AS (
    SELECT *,
        {fold("iats")} / (nd - 1.0) AS i1,
        {fold("list_transform(iats, x -> x * x)")} / (nd - 1.0) AS i2,
        {fold("tsn")} AS s1,
        {fold("list_transform(tsn, x -> x * x)")} AS s2,
        pow(nd, -0.2) * {BW_SCALE!r} AS factor,
        least(1000, greatest(200, CAST(n_trades * 2 AS INT))) AS ng
    FROM rg2
),
rg4 AS (
    SELECT *,
        factor * sqrt(greatest(s2 - s1 * s1 / nd, 0.0) / (nd - 1.0)) AS h,
        CASE WHEN i1 > 0 THEN sqrt(greatest(i2 - i1 * i1, 0.0)) / i1 END AS iat_cv
    FROM rg3
),
rg5 AS (
    SELECT *,
        CASE WHEN ok AND h > 0 THEN
            [round({fold("list_transform(tsn, x -> exp(((CAST(j - 1 AS DOUBLE) / CAST(ng - 1 AS DOUBLE) - x) / h) * ((CAST(j - 1 AS DOUBLE) / CAST(ng - 1 AS DOUBLE) - x) / h) * -0.5))")}
                / (nd * h * {SQRT_2PI!r}), 9)
             FOR j IN generate_series(1, ng)]
        END AS d
    FROM rg4
),
rg6 AS (
    SELECT *,
        list_filter(
            list_filter(generate_series(2, ng - 1),
                j -> d[j] > d[j - 1] AND d[j] > d[j + 1]),
            j -> d[j] - greatest(
                list_min(list_slice(d,
                    coalesce(list_max(list_filter(generate_series(1, j - 1), i -> d[i] > d[j])), 0) + 1,
                    j - 1)),
                list_min(list_slice(d, j + 1,
                    coalesce(list_min(list_filter(generate_series(j + 1, ng), i -> d[i] > d[j])), ng + 1) - 1))
            ) >= {PROMINENCE_FRAC!r} * list_max(d)
        ) AS pk
    FROM rg5
),
rg7 AS (
    SELECT *, len(pk) AS n_peaks,
        [CAST(j - 1 AS DOUBLE) / CAST(ng - 1 AS DOUBLE) FOR j IN pk] AS ppos
    FROM rg6
),
rg8 AS (
    SELECT *,
        [ppos[i + 1] - ppos[i] FOR i IN generate_series(1, CAST(n_peaks - 1 AS INT))] AS ipd,
        CAST(n_peaks - 1 AS DOUBLE) AS kp
    FROM rg7
),
rg9 AS (
    SELECT *,
        {fold("ipd")} / kp AS p1,
        {fold("list_transform(ipd, x -> x * x)")} / kp AS p2,
        CAST(len(list_distinct(
            [least({N_COVERAGE_BINS - 1}, CAST(floor((x - ts[1]) / rng * {N_COVERAGE_BINS}) AS INT)) FOR x IN ts]
        )) AS DOUBLE) / {float(N_COVERAGE_BINS)!r} AS coverage
    FROM rg8
)
SELECT symbol, barrier_id, n_trades,
    round(CASE WHEN ok AND n_peaks >= 2 AND p1 > 0
        THEN sqrt(greatest(p2 - p1 * p1, 0.0)) / p1 END, 6) AS kde_peak_cv,
    CASE WHEN ok THEN CAST(n_peaks AS BIGINT) END AS n_peaks,
    round(CASE WHEN ok THEN iat_cv END, 6) AS raw_iat_cv,
    round(CASE WHEN ok THEN coverage END, 4) AS temporal_coverage,
    round(CASE WHEN ok THEN factor END, 6) AS kde_bandwidth
FROM rg9
"""


def knee_select(metric_exprs: dict[str, str], src: str) -> str:
    """E17 twin of operators/synthesis.knee_points — same normalization,
    all-pairs tradeoffs, Pareto-front restriction, mean+2*sigma outlier
    rule (population std, key-ordered fold)."""
    cols = list(metric_exprs)
    base = ", ".join(f"round({e}, 6) AS {c}" for c, e in metric_exprs.items())
    notnull = " AND ".join(f"({e}) IS NOT NULL" for e in metric_exprs.values())
    bounds = ", ".join(f"max({c}) AS hi_{c}, min({c}) AS lo_{c}" for c in cols)
    vnorm = ", ".join(
        f"CASE WHEN hi_{c} - lo_{c} > 0 THEN (hi_{c} - {c}) / (hi_{c} - lo_{c}) ELSE 0.0 END AS v_{c}"
        for c in cols
    )
    dom_le = " AND ".join(f"b.v_{c} <= a.v_{c}" for c in cols)
    dom_lt = " OR ".join(f"b.v_{c} < a.v_{c}" for c in cols)
    sac = " + ".join(f"greatest(b.v_{c} - a.v_{c}, 0.0)" for c in cols)
    gain = " + ".join(f"greatest(a.v_{c} - b.v_{c}, 0.0)" for c in cols)
    return f"""
, kn0 AS (SELECT symbol, barrier_id, {base} FROM {src} WHERE {notnull}),
knb AS (SELECT {bounds} FROM kn0),
knv AS (SELECT symbol, barrier_id, {vnorm} FROM kn0, knb),
knp AS (
    SELECT a.symbol, a.barrier_id,
        max(CASE WHEN ({dom_le}) AND ({dom_lt}) THEN 1 ELSE 0 END) AS dominated,
        min(CASE WHEN ({gain}) > 0 THEN ({sac}) / ({gain}) END) AS mu
    FROM knv a JOIN knv b
        ON (a.symbol != b.symbol OR a.barrier_id != b.barrier_id)
    GROUP BY a.symbol, a.barrier_id
),
knf AS (SELECT *, dominated = 0 AS on_front FROM knp),
knt AS (
    SELECT mean_mu + 2.0 * sqrt(greatest(s2 / nn - mean_mu * mean_mu, 0.0)) AS thresh
    FROM (
        SELECT
            list_reduce(list_prepend(0.0, mus), (acc, x) -> acc + x)
                / CAST(len(mus) AS DOUBLE) AS mean_mu,
            list_reduce(list_prepend(0.0, list_transform(mus, x -> x * x)),
                (acc, x) -> acc + x) AS s2,
            CAST(len(mus) AS DOUBLE) AS nn
        FROM (
            SELECT list(mu ORDER BY symbol, barrier_id)
                FILTER (WHERE on_front AND mu IS NOT NULL) AS mus
            FROM knf
        )
    )
)
SELECT symbol, barrier_id, on_front,
    round(mu, 6) AS tradeoff_mu,
    (on_front AND mu IS NOT NULL AND mu >= thresh) AS is_knee
FROM knf, knt
"""


def bca_omega_select(n_bootstrap: int | None = None) -> str:
    """E21 twin of operators/synthesis.bca_omega_ci — same LCG resamples,
    same jackknife acceleration, same type-7 endpoints."""
    from ..functions.stats import norm_cdf_sql, norm_ppf_sql, python_norm_ppf
    from ..operators.synthesis import (
        BCA_ALPHA,
        BCA_B,
        BCA_MIN_TRADES,
        OMEGA_CI_REJECT,
    )

    nb = n_bootstrap or BCA_B
    za_lo = python_norm_ppf(BCA_ALPHA / 2.0)
    lcg = (
        f"(((b * {_LCG_B} + i * {_LCG_I} + k * {_LCG_K}) * {_LCG_MUL})"
        f" % {_LCG_MOD}) % n + 1"
    )
    fold = lambda arr: f"list_reduce(list_prepend(0.0, {arr}), (acc, x) -> acc + x)"  # noqa: E731
    q7 = (
        lambda p: f"""CASE
        WHEN len(bos) = 0 THEN NULL
        WHEN CAST(floor((CAST(len(bos) - 1 AS DOUBLE) * ({p}) + 1.0)) AS INT) >= len(bos) THEN bos[len(bos)]
        ELSE bos[CAST(floor((CAST(len(bos) - 1 AS DOUBLE) * ({p}) + 1.0)) AS INT)]
            + ((CAST(len(bos) - 1 AS DOUBLE) * ({p}) + 1.0) - floor((CAST(len(bos) - 1 AS DOUBLE) * ({p}) + 1.0)))
            * (bos[CAST(floor((CAST(len(bos) - 1 AS DOUBLE) * ({p}) + 1.0)) AS INT) + 1]
               - bos[CAST(floor((CAST(len(bos) - 1 AS DOUBLE) * ({p}) + 1.0)) AS INT)])
        END"""
    )  # noqa: E731
    adj = lambda za: norm_cdf_sql(f"(z0 + (z0 + ({za})) / (1.0 - a * (z0 + ({za}))))")  # noqa: E731
    return f"""
, bcv AS (
    SELECT symbol, barrier_id,
        list(return_pct ORDER BY signal_ts_ms) AS rs,
        CAST(count(*) AS BIGINT) AS n
    FROM trades GROUP BY symbol, barrier_id
),
bck AS (
    SELECT *, CAST(row_number() OVER (ORDER BY symbol, barrier_id) AS BIGINT) AS k,
        {fold("list_transform(rs, x -> greatest(x, 0.0))")} AS gains,
        {fold("list_transform(rs, x -> greatest(-x, 0.0))")} AS losses
    FROM bcv
),
bco AS (
    SELECT *, gains / nullif(losses, 0.0) AS omega,
        list_filter(
            list_transform(rs, x -> (gains - greatest(x, 0.0))
                / nullif(losses - greatest(-x, 0.0), 0.0)),
            v -> v IS NOT NULL) AS loo
    FROM bck
),
bcj AS (
    SELECT *, {fold("loo")} / nullif(CAST(len(loo) AS DOUBLE), 0.0) AS loo_mean
    FROM bco
),
bca AS (
    SELECT *, coalesce(
        {fold("list_transform(loo, v -> (loo_mean - v) * (loo_mean - v) * (loo_mean - v))")}
        / nullif(6.0 * pow({fold("list_transform(loo, v -> (loo_mean - v) * (loo_mean - v))")}, 1.5), 0.0),
        0.0) AS a
    FROM bcj
),
bcboot AS (
    SELECT c.symbol, c.barrier_id, bs.b,
        [c.rs[CAST({lcg} AS INT)] FOR i IN generate_series(1, CAST(c.n AS INT))] AS bsv
    FROM (SELECT symbol, barrier_id, rs, n, k FROM bca) c,
        (SELECT unnest(generate_series(1, {nb})) AS b) bs
),
bcbo AS (
    SELECT symbol, barrier_id,
        {fold("list_transform(bsv, x -> greatest(x, 0.0))")}
            / nullif({fold("list_transform(bsv, x -> greatest(-x, 0.0))")}, 0.0) AS bo
    FROM bcboot
),
bcstats AS (
    SELECT symbol, barrier_id,
        list(bo ORDER BY bo) FILTER (WHERE bo IS NOT NULL) AS bos
    FROM bcbo GROUP BY symbol, barrier_id
),
bcz AS (
    SELECT v.*, s.bos,
        {norm_ppf_sql(
            "((CAST(len(list_filter(s.bos, x -> x < v.omega)) AS DOUBLE) + 0.5)"
            " / (CAST(len(s.bos) AS DOUBLE) + 1.0))"
        )} AS z0
    FROM bca v JOIN bcstats s USING (symbol, barrier_id)
),
bcfin AS (
    SELECT *, {q7(adj(repr(za_lo)))} AS ci_lo, {q7(adj(f"-({za_lo!r})"))} AS ci_hi
    FROM bcz
)
SELECT symbol, barrier_id,
    n AS n_trades,
    round(omega, 6) AS omega,
    round(CASE WHEN n < {BCA_MIN_TRADES} THEN omega ELSE ci_lo END, 6) AS omega_ci_low,
    round(CASE WHEN n < {BCA_MIN_TRADES} THEN omega ELSE ci_hi END, 6) AS omega_ci_high,
    CASE WHEN n < {BCA_MIN_TRADES} THEN 'degenerate' ELSE 'bca_iid' END AS method,
    (CASE WHEN n < {BCA_MIN_TRADES} THEN omega ELSE ci_lo END) < {OMEGA_CI_REJECT!r} AS rejected
FROM bcfin
"""
