"""DuckDB oracle twin of the sweep engine (operators/sweep.py).

Where Spark evaluates all configs in one parameterized plan, the oracle
does what the *reference* does — textually instantiates the per-config CTE
chain (gen600_2down_template.sql:66-138) once per config and UNION ALLs
the results.  That asymmetry is the point: the oracle stays an independent
implementation (template-expanded SQL, like generate.sh) while the engine
under test is config-as-data.
"""

from __future__ import annotations

from ..config import BarrierConfig, grid_to_duckdb_values, max_bars_cap
from ..functions.quantiles import duck_q6_expr
from ..operators.sweep import SIGNALSET_LOOKBACK, SweepConfig
from . import fragments as frag
from .barrier_oracle import barrier_metrics_select, fwd_cte, trades_chain_ctes

from ..operators.signals import FORMATIONS, base_eligibility_sql


def _base_where(formation: str, warmup: int, f1: str, f2: str) -> str:
    """Per-config candidate WHERE: the formation's own pattern ∧ gate
    (signals.FORMATIONS — wl* formations carry no ti/kyle gate, matching
    the reference templates) plus the shared warmup/entry/feature checks."""
    return (
        f"{FORMATIONS[formation].signal_sql()}"
        f" AND {base_eligibility_sql(warmup)}"
        f" AND {f1} IS NOT NULL AND {f2} IS NOT NULL"
    )


def _config_cand_cte(i: int, c: SweepConfig, warmup: int) -> str:
    """cand_i: candidates with W7 signal-set quantile thresholds and the
    pass flag for one config."""
    win = (
        "PARTITION BY symbol ORDER BY rn "
        f"ROWS BETWEEN {SIGNALSET_LOOKBACK} PRECEDING AND 1 PRECEDING"
    )
    q1 = duck_q6_expr(f"list(f1_val) OVER ({win})", c.q1)
    q2 = duck_q6_expr(f"list(f2_val) OVER ({win})", c.q2)
    return f"""cand_{i} AS (
    SELECT '{c.config_id}' AS config_id, symbol, rn, close_time_ms,
        threshold_decimal_bps, entry_price, next_dir,
        {c.feature1} AS f1_val, {c.feature2} AS f2_val
    FROM feat
    WHERE {_base_where(c.formation, warmup, c.feature1, c.feature2)}
),
candq_{i} AS (
    SELECT *, {q1} AS f1_thr, {q2} AS f2_thr
    FROM cand_{i}
),
candp_{i} AS (
    SELECT *,
        (f1_thr IS NOT NULL AND f2_thr IS NOT NULL
         AND f1_val {c.dir1} f1_thr AND f2_val {c.dir2} f2_thr) AS passed
    FROM candq_{i}
)"""


def sweep_funnel_oracle(grid: list[SweepConfig], warmup: int) -> str:
    ctes = ",\n".join(_config_cand_cte(i, c, warmup) for i, c in enumerate(grid))
    unions = "\nUNION ALL\n".join(
        f"""SELECT config_id, symbol,
    count(*) AS n_candidates,
    CAST(sum(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS n_signals,
    CAST(sum(CASE WHEN passed AND next_dir = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits,
    sum(CASE WHEN passed AND next_dir = 1 THEN 1 ELSE 0 END)
        / nullif(CAST(sum(CASE WHEN passed THEN 1 ELSE 0 END) AS DOUBLE), 0.0) AS hit_rate,
    sum(CASE WHEN passed AND next_dir = 1 THEN 1 ELSE 0 END)
        / nullif(CAST(sum(CASE WHEN passed THEN 1 ELSE 0 END) AS DOUBLE), 0.0) - 0.5 AS edge_pct,
    (sum(CASE WHEN passed AND next_dir = 1 THEN 1 ELSE 0 END)
        / nullif(CAST(sum(CASE WHEN passed THEN 1 ELSE 0 END) AS DOUBLE), 0.0) - 0.5)
        / sqrt(0.25 / nullif(CAST(sum(CASE WHEN passed THEN 1 ELSE 0 END) AS DOUBLE), 0.0)) AS z_score
FROM candp_{i}
GROUP BY config_id, symbol"""
        for i in range(len(grid))
    )
    return f"{ctes}\nSELECT * FROM (\n{unions}\n)"


def sweep_trades_ctes(
    grid: list[SweepConfig], profiles: list[BarrierConfig], warmup: int
) -> str:
    """CTE chain ending in ``trades`` (with config_id) for the barrier
    stage of the sweep: surviving signals of every config UNION ALLed,
    joined to shared forward arrays, through the shared trade chain."""
    cand_ctes = ",\n".join(_config_cand_cte(i, c, warmup) for i, c in enumerate(grid))
    surv = "\nUNION ALL\n".join(
        f"SELECT config_id, symbol, rn, close_time_ms, threshold_decimal_bps,"
        f" entry_price FROM candp_{i} WHERE passed"
        for i in range(len(grid))
    )
    return f"""{cand_ctes},
{grid_to_duckdb_values(profiles)},
{fwd_cte(max_bars_cap(profiles), feat_relation="feat", name="fwdarr")},
surv AS (
{surv}
),
sigs AS (
    SELECT s.*, f.fwd_highs, f.fwd_lows, f.fwd_opens, f.fwd_closes
    FROM surv s JOIN fwdarr f USING (symbol, rn)
),
{trades_chain_ctes(("config_id", "symbol"))}"""


def sweep_metrics_oracle(
    grid: list[SweepConfig], profiles: list[BarrierConfig], warmup: int
) -> str:
    return (
        sweep_trades_ctes(grid, profiles, warmup)
        + barrier_metrics_select(("config_id", "symbol", "barrier_id"))
    )


# re-export for catalog composition
FEAT_CTE_SWEEP = frag.feat_cte  # rolling feat twin builder
