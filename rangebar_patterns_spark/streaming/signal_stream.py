"""Streaming champion-signal detector (SURVEY.md §2.11 beyond-parity).

The reference's champion predicate (gen111: 2 consecutive down bars +
trade_intensity above the no-lookahead p95 threshold + positive Kyle
lambda — sql/gen111_true_nolookahead.sql:80-96) evaluated INCREMENTALLY
over a bar stream.  The batch engine computes the threshold with a
windowed exact exclusive quantile (W3/W4); here the same rolling window
is carried as ``applyInPandasWithState`` state — a sorted window buffer
plus its insertion-order ring — so each arriving bar is scored with the
exact type-6 quantile of the PRECEDING ``lookback`` bars and the signal
decision is bit-identical to the batch detector
(tests/test_signal_stream.py pins single-batch and cross-micro-batch
equality against ``with_bar_features`` + ``champion_signal``).

Scale contract: state is per-symbol and bounded at O(lookback) doubles
(the rolling gen600 window policy — an expanding gen111 threshold would
grow state without bound, which is exactly why the production streaming
tier uses the rolling policy); compute is O(log lookback) per bar.
Ordering contract: per-symbol bars must arrive in ``rn`` order across
micro-batches (rn-contiguous file slices, or a keyed log with
per-partition ordering) — the same per-series ordering every batch
window in the engine assumes.

Quantile pick arithmetic matches functions/series_quantile.py's sorted
kernel expression-for-expression (h = p·(n+1) over the sorted preceding
multiset, linear interpolation between the k-th order statistics), and
the comparison semantics mirror Spark SQL's NaN ordering (NaN compares
greater than any number), so stream and batch agree on every row.
"""

from __future__ import annotations

from bisect import bisect_left, insort
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SIG_STATE_SCHEMA = StructType(
    [
        StructField("last_dir", LongType()),  # -1 = no previous bar yet
        StructField("buf", ArrayType(DoubleType())),  # sorted ti window
        StructField("ring", ArrayType(DoubleType())),  # insertion order
    ]
)

SIG_OUT_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("rn", LongType()),
        StructField("direction", LongType()),
        StructField("dir_1", LongType()),
        StructField("trade_intensity", DoubleType()),
        StructField("ti_p95_prior", DoubleType()),
        StructField("is_signal", BooleanType()),
    ]
)


def _q6_pick(buf: list[float], p: float) -> float | None:
    """Type-6 exclusive quantile of a sorted multiset — the same pick
    expressions as functions/series_quantile.py (bit-equality pinned via
    the batch-twin tests)."""
    n = len(buf)
    if n == 0:
        return None
    h = p * (n + 1.0)
    if h <= 1.0:
        return buf[0]
    if h >= n:
        return buf[-1]
    k = int(h)
    lo = buf[k - 1]
    return lo + (h - float(k)) * (buf[k] - lo)


def _gt_spark(a: float | None, b: float | None) -> bool:
    """``a > b`` under Spark SQL double semantics: NULL propagates to
    false (inside a boolean filter), NaN compares greater than any
    non-NaN value."""
    if a is None or b is None:
        return False
    if a != a:  # NaN left operand: greater than everything except NaN==
        return not b != b
    if b != b:
        return False
    return a > b


def champion_signals_stateful(
    spark: SparkSession,
    bars_dir: str,
    p: float = 0.95,
    lookback: int = 999,
    warmup: int = 100,
    glob: str = "*.parquet",
    sink_name: str = "signal_stream_sink",
    stream_options: dict[str, str] | None = None,
    progress_out: list | None = None,
) -> DataFrame:
    """Run the streaming detector over a bars parquet directory with an
    ``availableNow`` trigger into a memory sink; returns the sink table.

    Emits one row per bar: its direction/lag, the PRECEDING-window
    threshold it was scored against, and the signal decision —
    the stream twin of ``with_bar_features(..., rolling_window=lookback)``
    filtered through ``champion_signal() & eligibility(warmup)``.
    ``progress_out`` receives ``q.recentProgress`` (newest
    ``spark.sql.streaming.numRecentProgressUpdates`` entries only)."""
    static = spark.read.option("pathGlobFilter", glob).parquet(bars_dir)
    reader = (
        spark.readStream.schema(static.schema)
        .format("parquet")
        .option("pathGlobFilter", glob)
    )
    for k, v in (stream_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.load(bars_dir).select(
        "symbol", "rn", "open", "close", "trade_intensity", "kyle_lambda_proxy"
    )

    names = [f.name for f in SIG_OUT_SCHEMA.fields]

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        if state.exists:
            last_dir, buf, ring = state.get
            # Arrow may surface stored NaNs as None — restore them
            buf = [v for v in buf]
            ring = [float("nan") if v is None else v for v in ring]
        else:
            last_dir, buf, ring = -1, [], []
        out: list[tuple] = []
        batch = pd.concat(list(pdfs))
        batch = batch.sort_values("rn", kind="mergesort")
        for rn, op, cl, ti, kyle in zip(
            batch["rn"], batch["open"], batch["close"],
            batch["trade_intensity"], batch["kyle_lambda_proxy"],
        ):
            thr = _q6_pick(buf, p)
            direction = 1 if cl > op else 0
            d1 = None if last_dir < 0 else int(last_dir)
            ti_f = None if ti is None else float(ti)
            eligible = (
                d1 is not None
                and thr is not None
                and thr > 0
                and int(rn) > warmup
            )
            is_signal = bool(
                eligible
                and d1 == 0
                and direction == 0
                and _gt_spark(ti_f, thr)
                and _gt_spark(None if kyle is None else float(kyle), 0.0)
            )
            out.append((symbol, int(rn), direction, d1, ti_f, thr, is_signal))
            # roll the PRECEDING window: admit this bar, evict the oldest
            v = float("nan") if ti_f is None else ti_f
            if v == v:  # NaN values are skipped by the batch kernel too
                insort(buf, v)
            ring.append(v)
            if len(ring) > lookback:
                old = ring.pop(0)
                if old == old:
                    del buf[bisect_left(buf, old)]
            last_dir = direction
        state.update((int(last_dir), buf, ring))
        yield pd.DataFrame(out, columns=names)

    sigs = (
        stream.groupBy("symbol")
        .applyInPandasWithState(
            update,
            SIG_OUT_SCHEMA,
            SIG_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        sigs.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if progress_out is not None:
        progress_out.extend(pr for pr in q.recentProgress if pr is not None)
    return spark.table(sink_name)
