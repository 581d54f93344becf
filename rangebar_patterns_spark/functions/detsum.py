"""Deterministic float aggregation.

Plain ``F.sum(double)`` in Spark merges partial aggregates in a
task-scheduling-dependent order, so results differ run-to-run at the last
ulp — enough to flip a 6-decimal rounding at the boundary and fail the
cross-engine value-hash gate nondeterministically (observed on eval_dsr).

These helpers make every comparison-feeding float sum a *sequential left
fold over an explicitly ordered array*: bit-identical run-to-run AND
engine-to-engine (the DuckDB twin is ``list_reduce(list_prepend(0.0,
list(x ORDER BY k)), (a, x) -> a + x)`` — same fold, same order).

Cost: one collect_list per aggregate input instead of a streaming sum.
Group sizes here are per-config trade vectors (≤ thousands of rows —
the reference materializes the same vectors per config, eval/extraction
.py:234-242) or per-symbol bar series (≤ ~1.5M rows, bounded by the
partition contract), so the arrays are bounded and JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ordered_vals(order_col: Column, val: Column) -> Column:
    """Aggregate expression: values of ``val`` ordered by ``order_col``
    (which must be unique within the group)."""
    return F.transform(
        F.array_sort(F.collect_list(F.struct(order_col.alias("o"), val.alias("v")))),
        lambda s: s["v"],
    )


def fold_sum(arr: Column) -> Column:
    """Sequential left-fold sum, init 0.0 — exact mirror of the DuckDB
    list_prepend/list_reduce twin."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def osum(order_col: Column, val: Column) -> Column:
    """Deterministic SUM(val) ordered by order_col."""
    return fold_sum(ordered_vals(order_col, val))


def osum_if(order_col: Column, cond: Column, val: Column) -> Column:
    """Deterministic conditional sum: non-matching rows contribute +0.0 in
    their ordinal position (identical in the SQL twin)."""
    return osum(order_col, F.when(cond, val).otherwise(F.lit(0.0)))


def duck_fold(val_sql: str, order_sql: str, filter_sql: str | None = None) -> str:
    """DuckDB twin of :func:`osum` / :func:`osum_if` (pass the CASE inside
    ``val_sql`` for conditional sums, or a FILTER clause via filter_sql
    for list membership).

    Sort-after-collect (``list_sort`` over (order, value) structs — the
    exact mirror of Spark's ``array_sort(collect_list(struct(o, v)))``)
    rather than ``list(x ORDER BY k)``: the in-aggregate ORDER BY has been
    observed to break under memory-pressure spills (chunk-local ordering),
    while sorting the materialized list is load-independent."""
    flt = f" FILTER (WHERE {filter_sql})" if filter_sql else ""
    pairs = f"list({{'o': {order_sql}, 'v': {val_sql}}}){flt}"
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(list_sort({pairs}), s -> s.v)), (acc, x) -> acc + x)"
    )
