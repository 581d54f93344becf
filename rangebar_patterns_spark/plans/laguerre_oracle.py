"""DuckDB recursive-CTE twin of operators/laguerre.py.

The Laguerre state recursion is mirrored step-for-step (same expression
forms, same association order) so the 2000-step IIR chain stays bit-exact
against the pandas loop.  Requires ``WITH RECURSIVE`` on the enclosing
query; append after a ``bars`` CTE.
"""

from __future__ import annotations

from ..operators.laguerre import (
    ADAPTIVE_OFFSET,
    ATR_PERIOD,
    LEVEL_DOWN,
    LEVEL_UP,
    SMOOTHING_PERIOD,
)


def laguerre_select() -> str:
    p = float(ATR_PERIOD)
    alpha = 2.0 / (float(SMOOTHING_PERIOD) + 1.0)
    return f"""
, barsm AS MATERIALIZED (
    SELECT symbol, rn, close_time_ms, high, low, close FROM bars
),
lr AS (
    SELECT symbol, rn, close_time_ms, close,
        high - low AS atr,
        [high - low] AS atrs,
        close AS ema,
        close AS l0, close AS l1, close AS l2, close AS l3,
        CAST(0.0 AS DOUBLE) AS rsi
    FROM barsm WHERE rn = 1
    UNION ALL
    SELECT symbol, rn, close_time_ms, close, atr, atrs, ema, l0, l1, l2, l3,
        CASE WHEN cu + cd > 0.0 THEN cu / (cu + cd) ELSE 0.0 END AS rsi
    FROM (
        SELECT *,
            (greatest(l0 - l1, 0.0) + greatest(l1 - l2, 0.0)) + greatest(l2 - l3, 0.0) AS cu,
            (greatest(l1 - l0, 0.0) + greatest(l2 - l1, 0.0)) + greatest(l3 - l2, 0.0) AS cd
        FROM (
            SELECT *, -gamma * l2 + pl2 + gamma * pl3 AS l3
            FROM (
                SELECT *, -gamma * l1 + pl1 + gamma * pl2 AS l2
                FROM (
                    SELECT *, -gamma * l0 + pl0 + gamma * pl1 AS l1
                    FROM (
                        SELECT *, (1.0 - gamma) * ema + gamma * pl0 AS l0
                        FROM (
                            SELECT *,
                                1.0 - 2.0 / ({p!r} * (coeff + {ADAPTIVE_OFFSET!r}) + 1.0) AS gamma,
                                pema + {alpha!r} * (close - pema) AS ema
                            FROM (
                                SELECT *,
                                    CASE WHEN list_max(atrs) > list_min(atrs)
                                        THEN (atr - list_min(atrs)) / (list_max(atrs) - list_min(atrs))
                                        ELSE 0.5 END AS coeff
                                FROM (
                                    SELECT *,
                                        CASE WHEN len(la) > {ATR_PERIOD} THEN la[2:] ELSE la END AS atrs
                                    FROM (
                                        SELECT *, list_append(patrs, atr) AS la
                                        FROM (
                                            SELECT b.symbol, b.rn, b.close_time_ms, b.close,
                                                (r.atr * ({p!r} - 1.0) + (greatest(b.high, r.close) - least(b.low, r.close))) / {p!r} AS atr,
                                                r.atrs AS patrs, r.ema AS pema,
                                                r.l0 AS pl0, r.l1 AS pl1, r.l2 AS pl2, r.l3 AS pl3
                                            FROM lr r JOIN barsm b
                                                ON b.symbol = r.symbol AND b.rn = r.rn + 1
                                        )
                                    )
                                )
                            )
                        )
                    )
                )
            )
        )
    )
)
SELECT symbol, rn, close_time_ms,
    round(rsi, 6) AS laguerre_rsi,
    CAST(CASE WHEN rsi < {LEVEL_DOWN!r} THEN 0
              WHEN rsi > {LEVEL_UP!r} THEN 2
              ELSE 1 END AS BIGINT) AS regime
FROM lr
"""
