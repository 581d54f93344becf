"""DuckDB oracle twin of the barrier simulation pipeline.

Mirrors ``operators/barriers.py`` stage by stage with identical arithmetic
association order.  DuckDB specifics vs Spark:
  * ``list_slice(l, a, b)`` is begin/end-INCLUSIVE (Spark ``slice`` takes a
    length) — call sites are written to produce the same element ranges;
  * ``list_position`` returns NULL when not found (Spark ``array_position``
    returns 0) — both normalized to the reference's 0=not-found (AP-03).
"""

from __future__ import annotations

from ..config import BarrierConfig, grid_to_duckdb_values, max_bars_cap


def fwd_cte(cap: int, feat_relation: str = "feat", name: str = "fwd") -> str:
    """Forward-array CTE (W5 twin): per-bar forward OHLC lists covering
    rows +2 .. +1+cap."""
    return f"""{name} AS (
    SELECT *,
        list(high) OVER fw AS fwd_highs,
        list(low) OVER fw AS fwd_lows,
        list(open) OVER fw AS fwd_opens,
        list(close) OVER fw AS fwd_closes
    FROM {feat_relation}
    WINDOW fw AS (PARTITION BY symbol ORDER BY rn
                  ROWS BETWEEN 2 FOLLOWING AND {cap + 1} FOLLOWING)
)"""


def barrier_pipeline_ctes(
    grid: list[BarrierConfig],
    signal_where: str,
    feat_relation: str = "feat",
    side_expr: str = "'long'",
) -> str:
    """CTE chain ``fwd -> sigs -> trades`` (append after bars/feat CTEs).

    ``signal_where``: SQL predicate over the feat relation selecting signal
    bars (include eligibility).  ``side_expr``: SQL expression for the
    trade side ('long'/'short') — SHORT inverts the barrier geometry
    (gen600_2up_s_template.sql:141-150).
    """
    return f"""{grid_to_duckdb_values(grid)},
{fwd_cte(max_bars_cap(grid), feat_relation)},
sigs AS (
    SELECT * FROM fwd WHERE {signal_where}
),
{trades_chain_ctes(side_expr=side_expr)}"""


def trades_chain_ctes(
    id_cols: tuple[str, ...] = ("symbol",), side_expr: str = "'long'"
) -> str:
    """CTE chain ``trades1 .. trades`` over a ``sigs`` relation (must carry
    entry_price, threshold_decimal_bps, fwd_* arrays and ``id_cols``) and a
    ``barrier_grid`` relation.  ``side_expr`` may reference sigs columns
    (e.g. ``s.side``); the long branches are byte-identical to the unsided
    original, so long-only oracles are unaffected."""
    ids = ", ".join(id_cols)
    return f"""trades1 AS (
    SELECT s.*, g.*, {side_expr} AS _side,
        CAST(threshold_decimal_bps AS DOUBLE) / 100000.0 AS bar_range
    FROM sigs s CROSS JOIN barrier_grid g
),
trades2 AS (
    SELECT *,
        CASE WHEN _side = 'short' THEN entry_price * (1.0 - tp_mult * bar_range)
             ELSE entry_price * (1.0 + tp_mult * bar_range) END AS tp_price,
        CASE WHEN _side = 'short' THEN entry_price * (1.0 + sl_mult * bar_range)
             ELSE entry_price * (1.0 - sl_mult * bar_range) END AS sl_wide_price,
        CASE WHEN _side = 'short' THEN entry_price * (1.0 + sl_tight_mult * bar_range)
             ELSE entry_price * (1.0 - sl_tight_mult * bar_range) END AS sl_tight_price
    FROM trades1
    WHERE entry_price IS NOT NULL AND len(fwd_highs) >= max_bars
),
trades3 AS (
    SELECT *,
        CAST(coalesce(list_position(list_transform(
            list_slice(CASE WHEN _side = 'short' THEN fwd_lows ELSE fwd_highs END, 1, max_bars),
            x -> CASE WHEN _side = 'short' THEN x <= tp_price ELSE x >= tp_price END), true), 0) AS INT)
            AS tp_idx,
        CAST(coalesce(list_position(list_transform(
            list_slice(CASE WHEN _side = 'short' THEN fwd_highs ELSE fwd_lows END, 1, least(phase1_bars, max_bars)),
            x -> CASE WHEN _side = 'short' THEN x >= sl_wide_price ELSE x <= sl_wide_price END), true), 0) AS INT)
            AS sl_wide_idx,
        CAST(coalesce(list_position(list_transform(
            list_slice(CASE WHEN _side = 'short' THEN fwd_highs ELSE fwd_lows END, phase1_bars + 1, max_bars),
            x -> CASE WHEN _side = 'short' THEN x >= sl_tight_price ELSE x <= sl_tight_price END), true), 0) AS INT)
            AS sl_tight_rel
    FROM trades2
),
trades4 AS (
    SELECT *,
        CASE WHEN sl_wide_idx > 0 THEN sl_wide_idx
             WHEN sl_tight_rel > 0 THEN sl_tight_rel + phase1_bars
             ELSE 0 END AS sl_idx
    FROM trades3
),
trades5 AS (
    SELECT *,
        (sl_idx > 0 AND (tp_idx = 0 OR sl_idx <= tp_idx)) AS is_sl,
        (tp_idx > 0 AND (sl_idx = 0 OR tp_idx < sl_idx)) AS is_tp
    FROM trades4
),
trades6 AS (
    SELECT *,
        CASE WHEN is_sl THEN 'SL' WHEN is_tp THEN 'TP' ELSE 'TIME' END AS exit_type,
        CAST(CASE WHEN is_sl THEN sl_idx WHEN is_tp THEN tp_idx ELSE max_bars END AS BIGINT) AS exit_bar,
        CASE WHEN is_sl THEN
                 CASE WHEN _side = 'short'
                      THEN greatest(fwd_opens[sl_idx],
                          CASE WHEN sl_idx <= phase1_bars THEN sl_wide_price ELSE sl_tight_price END)
                      ELSE least(fwd_opens[sl_idx],
                          CASE WHEN sl_idx <= phase1_bars THEN sl_wide_price ELSE sl_tight_price END)
                 END
             WHEN is_tp THEN tp_price
             ELSE fwd_closes[max_bars] END AS exit_price
    FROM trades5
),
trades AS (
    SELECT {ids}, rn AS signal_rn, close_time_ms AS signal_ts_ms, barrier_id,
        entry_price, exit_type, exit_bar, exit_price,
        CASE WHEN _side = 'short' THEN (entry_price - exit_price) / entry_price
             ELSE (exit_price - entry_price) / entry_price END AS return_pct
    FROM trades6
)"""


def barrier_metrics_select(group_cols: tuple[str, ...] = ("symbol", "barrier_id")) -> str:
    g = ", ".join(group_cols)
    return BARRIER_METRICS_SELECT.replace(
        "SELECT symbol, barrier_id,", f"SELECT {g},", 1
    ).replace("GROUP BY symbol, barrier_id", f"GROUP BY {g}", 1)


def _tfold(val: str) -> str:
    """Deterministic ordered fold (twin of functions/detsum.py osum_if)."""
    return (
        f"list_reduce(list_prepend(0.0, list({val} ORDER BY signal_ts_ms)),"
        f" (acc, x) -> acc + x)"
    )


_GW = _tfold("CASE WHEN return_pct > 0 THEN return_pct ELSE 0.0 END")
_GL = f"abs({_tfold('CASE WHEN NOT (return_pct > 0) THEN return_pct ELSE 0.0 END')})"
_NW = "CAST(sum(CASE WHEN return_pct > 0 THEN 1 ELSE 0 END) AS DOUBLE)"
_NL = f"(CAST(count(*) AS DOUBLE) - {_NW})"
_WR = f"({_NW} / CAST(count(*) AS DOUBLE))"
_AW = f"({_GW} / nullif({_NW}, 0.0))"
_AL = f"({_GL} / nullif({_NL}, 0.0))"
_RR = f"({_AW} / nullif({_AL}, 0.0))"

BARRIER_METRICS_SELECT = f"""
SELECT symbol, barrier_id,
    count(*) AS n_trades,
    CAST(sum(CASE WHEN exit_type = 'TP' THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
    CAST(sum(CASE WHEN exit_type = 'SL' THEN 1 ELSE 0 END) AS BIGINT) AS n_sl,
    CAST(sum(CASE WHEN exit_type = 'TIME' THEN 1 ELSE 0 END) AS BIGINT) AS n_time,
    round({_WR}, 6) AS win_rate,
    round({_GW} / nullif({_GL}, 0.0), 6) AS profit_factor,
    round({_AW}, 6) AS avg_win,
    round({_AL}, 6) AS avg_loss,
    round({_RR}, 6) AS risk_reward,
    round({_tfold("return_pct")} / CAST(count(*) AS DOUBLE), 6) + 0.0 AS expected_value,
    round(avg(CAST(exit_bar AS DOUBLE)), 6) AS avg_bars_held,
    round({_WR} - (1.0 - {_WR}) / nullif({_RR}, 0.0), 6) + 0.0 AS kelly_fraction
FROM trades
GROUP BY symbol, barrier_id
"""


def trailing_chain_ctes(id_cols: tuple[str, ...] = ("symbol",)) -> str:
    """DuckDB twin of ``operators.barriers.simulate_trailing_barriers``
    (gen201_trailing_stop.sql:144-230 / gen202_combined_barrier.sql):
    fixed TP + ratcheting trailing SL over a ``sigs`` relation and a
    ``trail_grid`` relation; TRAIL wins same-bar ties."""
    ids = ", ".join(id_cols)
    return f"""ttr1 AS (
    SELECT s.*, g.*,
        CAST(threshold_decimal_bps AS DOUBLE) / 100000.0 AS bar_range
    FROM sigs s CROSS JOIN trail_grid g
),
ttr2 AS (
    SELECT *,
        entry_price * (1.0 + tp_mult * bar_range) AS tp_price,
        trail_mult * bar_range AS trail_pct
    FROM ttr1
    WHERE entry_price IS NOT NULL AND len(fwd_highs) >= max_bars
),
ttr3 AS (
    SELECT *,
        list_transform(generate_series(1, max_bars),
            i -> greatest(entry_price, list_max(list_slice(fwd_highs, 1, i)))
                 * (1.0 - trail_pct)) AS trailing_sls
    FROM ttr2
),
ttr4 AS (
    SELECT *,
        CAST(coalesce(list_position(list_transform(
            list_slice(fwd_highs, 1, max_bars), h -> h >= tp_price), true), 0) AS INT)
            AS tp_idx,
        CAST(coalesce(list_position(list_transform(generate_series(1, max_bars),
            i -> fwd_lows[i] <= trailing_sls[i]), true), 0) AS INT)
            AS trail_idx
    FROM ttr3
),
ttr5 AS (
    SELECT *,
        (trail_idx > 0 AND (tp_idx = 0 OR trail_idx <= tp_idx)) AS is_trail,
        (tp_idx > 0 AND (trail_idx = 0 OR tp_idx < trail_idx)) AS is_tp
    FROM ttr4
),
ttr6 AS (
    SELECT *,
        CASE WHEN is_trail THEN 'TRAIL' WHEN is_tp THEN 'TP' ELSE 'TIME' END AS exit_type,
        CAST(CASE WHEN is_trail THEN trail_idx WHEN is_tp THEN tp_idx ELSE max_bars END AS BIGINT) AS exit_bar,
        CASE WHEN is_trail THEN least(fwd_opens[trail_idx], trailing_sls[trail_idx])
             WHEN is_tp THEN tp_price
             ELSE fwd_closes[max_bars] END AS exit_price
    FROM ttr5
),
trades AS (
    SELECT {ids}, rn AS signal_rn, close_time_ms AS signal_ts_ms, barrier_id,
        entry_price, exit_type, exit_bar, exit_price,
        (exit_price - entry_price) / entry_price AS return_pct
    FROM ttr6
)"""
