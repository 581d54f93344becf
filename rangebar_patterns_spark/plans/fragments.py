"""Shared DuckDB SQL fragments for oracle twins.

Each fragment mirrors a Spark transform *with identical arithmetic
association order* so results are bit-comparable (see sources/bars.py for
the conventions).  The fragments compose: ``WITH {BARS_DUCKDB_CTE},
{FEAT_CTE(...)} SELECT ...``.
"""

from __future__ import annotations

from ..functions.quantiles import duck_q6_expr

DIRECTION = "CASE WHEN close > open THEN 1 ELSE 0 END"

# opposite wick % (gen600_2down_template.sql:37-41 semantics)
WICK_PCT = (
    "CASE WHEN close <= open THEN (high - open) / nullif(high - low, 0.0) "
    "ELSE (open - low) / nullif(high - low, 0.0) END"
)


def feat_cte(p: float = 0.95, rolling: int | None = None, n_lags: int = 2) -> str:
    """DuckDB twin of ``operators.windows.with_bar_features``."""
    frame_lo = "UNBOUNDED PRECEDING" if rolling is None else f"{rolling} PRECEDING"
    arr = (
        f"list(trade_intensity) OVER (PARTITION BY symbol ORDER BY rn "
        f"ROWS BETWEEN {frame_lo} AND 1 PRECEDING)"
    )
    lags = "\n        ".join(
        f"lag({DIRECTION}, {i}) OVER w AS dir_{i},\n        "
        f"lag({WICK_PCT}, {i}) OVER w AS wick_{i},"
        for i in range(1, n_lags + 1)
    )
    return f"""feat AS (
    SELECT
        bars.*,
        {DIRECTION} AS direction,
        {WICK_PCT} AS opposite_wick_pct,
        rn AS bar_count,
        {duck_q6_expr(arr, p)} AS ti_p95_prior,
        {lags}
        lead({DIRECTION}, 1) OVER w AS next_dir,
        lead(open, 1) OVER w AS entry_price
    FROM bars
    WINDOW w AS (PARTITION BY symbol ORDER BY rn)
)"""


CHAMPION_SIGNAL = (
    "dir_1 = 0 AND direction = 0 AND trade_intensity > ti_p95_prior "
    "AND kyle_lambda_proxy > 0"
)


def eligibility(warmup: int) -> str:
    return (
        "dir_1 IS NOT NULL AND ti_p95_prior IS NOT NULL "
        f"AND ti_p95_prior > 0 AND bar_count > {warmup}"
    )


def gate_quantiles_cte(
    rolling: int = 999,
    in_relation: str = "feat",
    name: str = "featg",
    names: tuple[str, ...] | None = None,
) -> str:
    """DuckDB twin of ``operators.windows.with_gate_quantiles``: the non-ti
    formation-gate thresholds as rolling type-6 window quantiles.  DuckDB's
    ``list()`` window keeps NULLs; ``duck_q6_expr`` filters them, matching
    the stream kernel's NaN-skipping."""
    from ..operators.signals import GATE_QUANTILES

    wanted = {
        out: GATE_QUANTILES[out]
        for out in (names if names is not None else GATE_QUANTILES)
        if out != "ti_p95_prior"
    }
    cols = ",\n        ".join(
        f"{duck_q6_expr(f'list({src}) OVER gw', p)} AS {out}"
        for out, (src, p) in wanted.items()
    )
    return f"""{name} AS (
    SELECT *,
        {cols}
    FROM {in_relation}
    WINDOW gw AS (PARTITION BY symbol ORDER BY rn
                  ROWS BETWEEN {rolling} PRECEDING AND 1 PRECEDING)
)"""
