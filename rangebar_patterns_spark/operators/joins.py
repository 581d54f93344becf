"""Join-family operators the main pipelines don't already cover
(SURVEY.md §2.3): the as-of lookup (J7), the forward range self-join
variant of the barrier scan (J1), and the crash-recovery anti-join (U3).

Join-strategy notes for 100 TB:
  * as-of: implemented as a union-merge + last-non-null window — one
    shuffle on (symbol, time), no range explosion; this is the classic
    Spark as-of pattern (probe rows interleaved into the build stream).
  * range self-join (J1): only preferable when signals are sparse
    (reference AP-14 superseded it with window arrays for dense
    patterns); the join side stays partition-local when both sides are
    bucketed by symbol.
  * anti-join (U3): left_anti against the done-set — the reference's
    ``--skip-done`` crash recovery as one operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_bars(
    probes: DataFrame,
    bars: DataFrame,
    value_cols: list[str],
    probe_ts: str = "ts_ms",
) -> DataFrame:
    """J7: for each probe (symbol, ts) attach the LAST bar at-or-before
    the timestamp (eval/ou_barriers.py:66-96 does this with
    np.searchsorted; DuckDB has native ASOF JOIN — the oracle twin).

    union-merge implementation: bar rows and probe rows are merged into
    one (symbol, time)-ordered stream; a last-non-null window carries each
    bar's values forward onto the probes.  Bars win ties (at-or-before):
    within equal timestamps bar rows sort first via the kind flag.
    """
    b = bars.select(
        "symbol",
        F.col("close_time_ms").alias("_t"),
        F.lit(0).alias("_kind"),  # bars first on ties -> "at or before"
        F.lit(None).cast("long").alias("_probe_id"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    p = probes.select(
        "symbol",
        F.col(probe_ts).alias("_t"),
        F.lit(1).alias("_kind"),
        F.col("probe_id").alias("_probe_id"),
        *[F.lit(None).cast("double").alias(f"_v_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy("symbol")
        .orderBy("_t", "_kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = b.unionByName(p)
    for c in value_cols:
        merged = merged.withColumn(
            f"_v_{c}", F.last(f"_v_{c}", ignorenulls=True).over(w)
        )
    return merged.filter(F.col("_kind") == 1).select(
        "symbol",
        F.col("_probe_id").alias("probe_id"),
        F.col("_t").alias(probe_ts),
        *[F.col(f"_v_{c}").alias(f"bar_{c}") for c in value_cols],
    )


def forward_range_join(signals: DataFrame, bars: DataFrame, max_fwd: int) -> DataFrame:
    """J1: the historical Gen200-500 forward-bar range self-join
    (gen200_triple_barrier.sql:160-171): each signal joined to bars
    rn+2 .. rn+1+max_fwd, re-collected into ordered forward arrays.

    The frame deliberately matches ``with_entry_and_forward`` (the contract
    ``simulate_barriers`` consumes): element k is *forward bar k after the
    entry bar* (row signal+1+k), so the entry bar itself is never scanned
    for TP/SL.  Note this is one bar LATER than ``with_forward_arrays``
    (the literal W5 mapping, whose element 1 is the entry bar) — the
    equivalence test pins against ``with_entry_and_forward``, not W5."""
    s = signals.select("symbol", F.col("rn").alias("srn"))
    b = bars.select("symbol", "rn", "high", "low", "open", "close")
    j = s.join(
        b,
        (s.symbol == b.symbol)
        & (b.rn > s.srn + 1)
        & (b.rn <= s.srn + 1 + max_fwd),
    ).select(s.symbol.alias("symbol"), "srn", "rn", "high", "low", "open", "close")
    agg = j.groupBy("symbol", "srn").agg(
        *[
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rn").alias("o"), F.col(c).alias("v")))
                ),
                lambda st: st["v"],
            ).alias(f"fwd_{c}s")
            for c in ["high", "low", "open", "close"]
        ]
    )
    return agg.withColumnRenamed("srn", "rn")


def exclude_done(configs: DataFrame, done: DataFrame, keys: list[str]) -> DataFrame:
    """U3: crash-recovery done-set exclusion (submit.sh --skip-done) as a
    left_anti join."""
    return configs.join(done, keys, "left_anti")


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join for hot keys that overwhelm one reducer AND a
    right side too large to broadcast: the large side gets a deterministic
    salt from ``salt_src`` (any column that varies within a key group —
    e.g. the row's rn/timestamp), the small side is replicated
    ``n_salts``×, and the join runs on (key, salt) so each hot key fans
    out across ``n_salts`` reducers.

    AQE's runtime skew-join (enabled in the session factory) already
    splits oversized sort-merge partitions; this is the explicit lever
    for plans AQE can't re-split (skewed keys feeding a downstream
    aggregation on the same key, or non-SMJ strategies).  Deterministic
    by construction: the salt is a hash, not a random draw, so results
    and tests are stable across runs.

    Only join types where the small side never emits unmatched rows are
    equivalence-preserving: under right/full outer joins each unmatched
    small-side row would surface once per salt replica (n_salts duplicate
    output rows vs the plain join)."""
    allowed = {"inner", "left", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only; {how!r} would "
            "duplicate unmatched small-side rows once per salt replica"
        )
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).alias("_salt")
    lg = large.withColumn("_salt", salt)
    sm = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>")),
    )
    return lg.join(sm, [key, "_salt"], how).drop("_salt")
