"""Structured Streaming extension (SURVEY.md §2.11: the reference is
batch-only; this is the beyond-parity streaming surface).

Two operators:

* :func:`hourly_counts_stream` — file-source stream over the events
  parquet, event-time tumbling window + watermark, ``availableNow``
  trigger into a memory sink.  Because the aggregates are integer-exact
  (counts + integer-scaled value sums), the finished stream result is
  bit-comparable to a batch DuckDB oracle — the streaming path itself
  goes through the driver's correctness gate.

* :func:`range_bars_stateful` — ``applyInPandasWithState`` range-bar
  constructor: the custom stateful operator the reference's upstream
  pipeline implies (bars are built from ticks before the reference ever
  sees them).  Per event_type key, accumulate the value path and emit a
  bar whenever the cumulative move exceeds the threshold.  Covered by a
  batch-twin test (tests/test_streaming.py), not the SQL oracle —
  stateful streaming is the documented non-SQL-expressible case.

Scale notes: file-source streams shard by file; watermark bounds state;
``applyInPandasWithState`` state is per-key (symbol) and O(1) per bar —
the same (symbol → partition) contract as the batch engine.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

VALUE_SCALE = 1_000_000


def _events_stream(
    spark: SparkSession,
    sf_dir: str,
    glob: str = "events.parquet",
    stream_options: dict[str, str] | None = None,
) -> DataFrame:
    static = spark.read.option("pathGlobFilter", glob).parquet(sf_dir)
    # the file source wants a directory; pathGlobFilter narrows it to the
    # events file(s) inside the shared sf dir.  ``stream_options`` lets
    # tests shape micro-batching (e.g. maxFilesPerTrigger=1 to force one
    # batch per file and exercise cross-batch operator state).
    reader = (
        spark.readStream.schema(static.schema)
        .format("parquet")
        .option("pathGlobFilter", glob)
    )
    for k, v in (stream_options or {}).items():
        reader = reader.option(k, v)
    stream = reader.load(sf_dir)
    ts_type = dict(static.dtypes)["ts"]
    if ts_type == "bigint":  # TIMESTAMP(NANOS) read as raw int64 ns
        event_time = F.timestamp_micros(F.expr("ts div 1000"))
    else:
        event_time = F.col("ts").cast("timestamp")
    return stream.withColumn("event_time", event_time)


def windowed_event_counts(ev: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked event-time tumbling-window aggregation over an
    ``event_time``-stamped events relation — shared by the availableNow
    catalog entry and the late-data semantics test
    (tests/test_streaming.py::test_watermark_drops_late_events).

    Aggregates are integer-exact on purpose: count(*) and a sum of
    floor(value * 1e6) — associativity-proof, so streaming results are
    deterministic and oracle-comparable."""
    return (
        ev.withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", "1 hour").alias("w"),
            F.col("event_type").alias("symbol"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * VALUE_SCALE).cast("long")).alias(
                "value_sum_scaled"
            ),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start_ms"),
            "symbol",
            "n_events",
            "value_sum_scaled",
        )
    )


def hourly_counts_stream(
    spark: SparkSession, sf_dir: str, sink_name: str = "hourly_counts_sink"
) -> DataFrame:
    """Run the tumbling-window aggregation to completion (availableNow)
    and return the finished result as a batch DataFrame."""
    agg = windowed_event_counts(_events_stream(spark, sf_dir))
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_name)


BAR_STATE_SCHEMA = StructType(
    [
        StructField("open_v", DoubleType()),
        StructField("high_v", DoubleType()),
        StructField("low_v", DoubleType()),
        StructField("last_v", DoubleType()),
        StructField("n_events", LongType()),
        StructField("bar_seq", LongType()),
    ]
)

BAR_OUT_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("bar_seq", LongType()),
        StructField("open_v", DoubleType()),
        StructField("high_v", DoubleType()),
        StructField("low_v", DoubleType()),
        StructField("close_v", DoubleType()),
        StructField("n_events", LongType()),
    ]
)


def build_bars_batch(values: list[float], threshold: float) -> list[tuple]:
    """Pure-python batch twin of the stateful range-bar logic — the
    unit-test oracle (same dual-engine strategy as the barrier sim)."""
    bars = []
    state: dict[str, Any] | None = None
    seq = 0
    for v in values:
        if state is None:
            state = {"open": v, "high": v, "low": v, "n": 1}
        else:
            state["high"] = max(state["high"], v)
            state["low"] = min(state["low"], v)
            state["n"] += 1
        if state["high"] - state["low"] >= threshold:
            seq += 1
            bars.append(
                (seq, state["open"], state["high"], state["low"], v, state["n"])
            )
            state = None
    return bars


def range_bars_stateful(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5,
    sink_name: str = "range_bars_sink",
    glob: str = "events.parquet",
    stream_options: dict[str, str] | None = None,
    progress_out: list | None = None,
) -> DataFrame:
    """applyInPandasWithState range-bar constructor over the event stream:
    a bar closes whenever the (high - low) range of the accumulated value
    path reaches ``threshold``.

    ``stream_options`` passes through to the file stream source (tests
    use maxFilesPerTrigger=1 to split the run into one micro-batch per
    input file, exercising state carry-over across batches);
    ``progress_out``, when given, receives the finished query's
    per-micro-batch progress dicts — sourced from ``q.recentProgress``,
    which retains only the newest ``spark.sql.streaming
    .numRecentProgressUpdates`` entries (default 100): a run split into
    more micro-batches than that (e.g. maxFilesPerTrigger=1 over a large
    directory) yields a silently TRUNCATED tail, so don't build
    batch-count assertions on it at that scale — attach a
    ``StreamingQueryListener`` when completeness matters."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (symbol,) = key
        if state.exists:
            open_v, high_v, low_v, last_v, n_events, bar_seq = state.get
        else:
            open_v = high_v = low_v = last_v = None
            n_events, bar_seq = 0, 0
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"].astype(float):
                if open_v is None:
                    open_v = high_v = low_v = v
                    n_events = 1
                else:
                    high_v = max(high_v, v)
                    low_v = min(low_v, v)
                    n_events += 1
                last_v = v
                if high_v - low_v >= threshold:
                    bar_seq += 1
                    out.append((symbol, bar_seq, open_v, high_v, low_v, v, n_events))
                    open_v = high_v = low_v = None
                    n_events = 0
        state.update((open_v, high_v, low_v, last_v, n_events, bar_seq))
        yield pd.DataFrame(out, columns=[f.name for f in BAR_OUT_SCHEMA.fields])

    ev = _events_stream(spark, sf_dir, glob=glob, stream_options=stream_options)
    bars = (
        ev.select("event_type", "ts", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            BAR_OUT_SCHEMA,
            BAR_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        bars.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if progress_out is not None:
        progress_out.extend(p for p in q.recentProgress if p is not None)
    return spark.table(sink_name)


def dedup_events_stream(
    ev: DataFrame,
    watermark: str = "1 hour",
    keys: tuple[str, ...] = ("event_id",),
) -> DataFrame:
    """Ingest-time streaming deduplication — the front door of a
    training-data pipeline fed by an at-least-once transport (replayed
    Kafka offsets, retried uploads): downstream sees each key exactly
    once *within the watermark horizon* — a re-delivery arriving after
    the watermark has passed the key's event time is no longer in state
    and passes through (size the horizon to the transport's maximum
    redelivery delay).

    ``dropDuplicatesWithinWatermark`` holds per-key state only until the
    watermark passes the key's event time, so the state store is bounded
    by (ingest rate × horizon) instead of growing with the corpus the
    way plain ``dropDuplicates`` state does — the property that makes
    this operator viable on an unbounded stream.  It also drops a retry
    whose re-stamped event time differs from the original's (any two
    occurrences within the horizon collapse), which keyed-on-(id, time)
    dedup cannot do.
    """
    return ev.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
