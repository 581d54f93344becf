"""Exact *exclusive* quantiles (Hyndman–Fan type 6) as window expressions.

The reference engine's no-lookahead thresholds are
``quantileExactExclusive(p)(x) OVER (ORDER BY ts ROWS BETWEEN <lo> PRECEDING
AND 1 PRECEDING)`` (reference sql/gen111_true_nolookahead.sql:49-52,
sql/gen600_2down_template.sql:68-72).  ClickHouse's exclusive variant is
Hyndman–Fan **type 6** (h = p·(n+1)); Spark's ``percentile`` and DuckDB's
``quantile_cont`` are both type 7 (h = 1 + p·(n−1)), so neither built-in
can be used for parity — we implement type 6 explicitly, identically, in
both engines (SURVEY.md §7.2 item 2).

Spark has no sliding *exact* quantile aggregate, so the window variant is
``sort_array(collect_list(x) over frame)`` + interpolation arithmetic — an
O(w log w)-per-row expression that stays entirely inside Catalyst/codegen
(no Python).  At w=1000 over ~1.5M bars per (symbol, threshold) partition
this is ~10^10 comparisons worst-case *per partition*, embarrassingly
parallel across the (symbol × threshold) grid — the scale story is
partition count, not per-partition cleverness.  ``collect_list`` skips
NULLs, matching ClickHouse window-quantile NULL-skipping
(reference backtest/CLAUDE.md "NaN handling").

Type-6 semantics on a sorted n-vector s (1-based):
    n = 0          -> NULL
    h = p·(n+1)
    h <= 1         -> s[1]
    h >= n         -> s[n]
    else           -> s[k] + (h−k)·(s[k+1]−s[k]),  k = floor(h)

All arithmetic below is written with identical association order in the
Spark and DuckDB forms so results are bit-identical given identical inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F


def q6_from_sorted_array(sorted_arr: Column, p: float) -> Column:
    """Type-6 exclusive quantile of an already-sorted, NULL-free array."""
    n = F.size(sorted_arr)
    h = F.lit(p) * (n + F.lit(1)).cast("double")
    k = F.floor(h).cast("int")
    frac = h - F.floor(h).cast("double")
    lo = F.element_at(sorted_arr, k)
    hi = F.element_at(sorted_arr, k + F.lit(1))
    return (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(h <= 1.0, F.element_at(sorted_arr, 1))
        .when(h >= n.cast("double"), F.element_at(sorted_arr, n))
        .otherwise(lo + frac * (hi - lo))
    )


def rolling_excl_quantile(col: Column, p: float, w: WindowSpec, lo: int, hi: int = -1) -> Column:
    """``quantileExactExclusive(p)(col) OVER (... ROWS BETWEEN |lo| PRECEDING
    AND |hi| PRECEDING)``.

    ``lo`` may be ``None`` for the expanding (UNBOUNDED PRECEDING) variant —
    the reference's strict no-lookahead threshold (gen111) — or a negative
    row offset (e.g. ``-999``) for the rolling-window policy variant
    (reference sql/CLAUDE.md "Rolling Window Policy", gen600).
    """
    from pyspark.sql import Window

    start = Window.unboundedPreceding if lo is None else lo
    arr = F.sort_array(F.collect_list(col).over(w.rowsBetween(start, hi)))
    return q6_from_sorted_array(arr, p)


def duck_q6_expr(arr_sql: str, p: float) -> str:
    """DuckDB SQL expression: type-6 quantile of a (possibly NULL-containing,
    unsorted) list-valued SQL expression — the oracle twin of
    :func:`rolling_excl_quantile`.

    NULLs are filtered before sorting to match ``collect_list`` semantics.
    """
    s = f"list_sort(list_filter({arr_sql}, x -> x IS NOT NULL))"
    n = f"len({s})"
    h = f"(CAST({p} AS DOUBLE) * CAST({n} + 1 AS DOUBLE))"
    k = f"CAST(floor({h}) AS INT)"
    frac = f"({h} - CAST(floor({h}) AS DOUBLE))"
    return (
        f"CASE WHEN {n} = 0 THEN NULL "
        f"WHEN {h} <= 1.0 THEN {s}[1] "
        f"WHEN {h} >= CAST({n} AS DOUBLE) THEN {s}[{n}] "
        f"ELSE {s}[{k}] + {frac} * ({s}[{k} + 1] - {s}[{k}]) END"
    )
