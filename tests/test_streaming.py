"""Streaming extension tests: windowed stream vs batch, and the stateful
range-bar constructor vs its pure-python batch twin."""

from __future__ import annotations

import pandas as pd

from rangebar_patterns_spark.streaming import range_bars_stateful
from rangebar_patterns_spark.streaming.events_stream import build_bars_batch

from conftest import SF_DIR


def test_stateful_range_bars_match_batch_twin(spark):
    got = (
        range_bars_stateful(spark, SF_DIR, threshold=0.5, sink_name="rb_test_sink")
        .toPandas()
        .sort_values(["symbol", "bar_seq"])
        .reset_index(drop=True)
    )
    assert len(got) > 0, "no bars formed at threshold=0.5"

    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "ts", "event_id", "value")
        .toPandas()
    )
    rows = []
    for sym, grp in events.groupby("event_type"):
        vals = grp.sort_values(["ts", "event_id"])["value"].astype(float).tolist()
        for seq, o, h, lo, c, n in build_bars_batch(vals, 0.5):
            rows.append((sym, seq, o, h, lo, c, n))
    want = (
        pd.DataFrame(rows, columns=list(got.columns))
        .sort_values(["symbol", "bar_seq"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stateful_range_bars_carry_state_across_micro_batches(spark, tmp_path):
    """Split the event file into three time-contiguous files and force
    one micro-batch per file (maxFilesPerTrigger=1): a bar that opens in
    one batch must close in a later one, so this fails if the
    applyInPandasWithState kernel drops or misrestores state between
    batches — single-batch runs (the twin test above) can't catch that."""
    import os

    events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    # split on distinct ts boundaries so no timestamp spans two files
    cut = events["ts"].quantile([1 / 3, 2 / 3]).tolist()
    parts = [
        events[events["ts"] <= cut[0]],
        events[(events["ts"] > cut[0]) & (events["ts"] <= cut[1])],
        events[events["ts"] > cut[1]],
    ]
    assert all(len(p) > 0 for p in parts)
    for i, p in enumerate(parts):
        f = tmp_path / f"events_{i}.parquet"
        p.to_parquet(f, index=False)
        # the file source orders batches by (modification time, path):
        # make both ascending so arrival order == event-time order
        os.utime(f, (1_000_000 + i, 1_000_000 + i))

    progress: list = []
    got = (
        range_bars_stateful(
            spark,
            str(tmp_path),
            threshold=0.5,
            sink_name="rb_multibatch_sink",
            glob="events_*.parquet",
            stream_options={"maxFilesPerTrigger": "1"},
            progress_out=progress,
        )
        .toPandas()
        .sort_values(["symbol", "bar_seq"])
        .reset_index(drop=True)
    )
    batches_with_rows = [p for p in progress if p.numInputRows > 0]
    assert len(batches_with_rows) == 3, (
        f"expected 3 micro-batches, saw {len(batches_with_rows)}"
    )

    rows = []
    for sym, grp in events.groupby("event_type"):
        vals = grp.sort_values(["ts", "event_id"])["value"].astype(float).tolist()
        for seq, o, h, lo, c, n in build_bars_batch(vals, 0.5):
            rows.append((sym, seq, o, h, lo, c, n))
    want = (
        pd.DataFrame(rows, columns=list(got.columns))
        .sort_values(["symbol", "bar_seq"])
        .reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_hourly_matches_batch(spark, duck):
    from rangebar_patterns_spark.plans.catalog import ORACLES, QUERIES

    from conftest import compare_frames

    sp = QUERIES["streaming_hourly_counts"](spark, SF_DIR)
    du = duck.execute(ORACLES["streaming_hourly_counts"]).df()
    compare_frames(sp, du)


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data semantics of the shared windowed aggregation: an event
    older than the advanced watermark is DROPPED (its window finalizes
    without it), while windows the watermark hasn't passed stay open.
    Three micro-batches through a real file-source stream in append mode:

      batch 1: 01:30, 05:30  -> watermark advances to 04:30; the 01:00
               window finalizes with 1 event
      batch 2: 02:10 (late, < watermark -> dropped), 05:10 (kept)
      batch 3: 23:00         -> watermark passes everything; 02:00 window
               must NOT appear (the late event is gone), 05:00 window
               finalizes with BOTH batch-1 and batch-2 events
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F
    from rangebar_patterns_spark.streaming.events_stream import (
        windowed_event_counts,
    )

    src = tmp_path / "src"
    src.mkdir()
    day = "2024-01-01 "

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime([day + t for t, _ in rows]),
                "event_type": ["E" for _ in rows],
                "value": [v for _, v in rows],
            }
        )
        # microsecond timestamps: the session reads TIMESTAMP(NANOS) as
        # raw int64 (nanosAsLong for the driver testdata), which would
        # clash with the declared timestamp schema here
        pq.write_table(
            pa.Table.from_pandas(pdf), src / name, coerce_timestamps="us"
        )

    write_batch("b1.parquet", [("01:30:00", 1.0), ("05:30:00", 2.0)])
    schema = "ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(str(src))
        .withColumn("event_time", F.col("ts"))
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("late_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch("b2.parquet", [("02:10:00", 4.0), ("05:10:00", 8.0)])
        q.processAllAvailable()
        write_batch("b3.parquet", [("23:00:00", 16.0)])
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.window_start_ms: r.n_events
        for r in spark.table("late_sink").collect()
    }
    h = lambda hh: int(pd.Timestamp(day + hh).timestamp() * 1000)  # noqa: E731
    assert got[h("01:00:00")] == 1
    assert h("02:00:00") not in got, "late event must be dropped"
    assert got[h("05:00:00")] == 2, "in-watermark batch-2 event must count"


def test_checkpoint_replay_is_idempotent(spark, tmp_path):
    """Exactly-once under replay (the production concern the watermark
    test doesn't cover): a checkpointed query is stopped and RESTARTED
    over a source directory whose already-processed files are still
    present — the restarted query must not re-aggregate them (the file
    source's committed offsets live in the checkpoint), and new files
    arriving after the restart increment counts exactly once."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F
    from rangebar_patterns_spark.streaming.events_stream import (
        windowed_event_counts,
    )

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    day = "2024-01-01 "

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime([day + t for t, _ in rows]),
                "event_type": ["E" for _ in rows],
                "value": [v for _, v in rows],
            }
        )
        pq.write_table(
            pa.Table.from_pandas(pdf), src / name, coerce_timestamps="us"
        )

    schema = "ts timestamp, event_type string, value double"

    def start(sink):
        stream = (
            spark.readStream.schema(schema)
            .format("parquet")
            .load(str(src))
            .withColumn("event_time", F.col("ts"))
        )
        return (
            windowed_event_counts(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )

    write_batch("b1.parquet", [("01:30:00", 1.0), ("01:45:00", 2.0)])
    q = start("replay_sink_a")
    try:
        q.processAllAvailable()
        first = {
            r.window_start_ms: r.n_events
            for r in spark.table("replay_sink_a").collect()
        }
    finally:
        q.stop()
    assert list(first.values()) == [2]

    # restart over the SAME directory (b1 still present) — a naive
    # restart would double-count it
    q = start("replay_sink_b")
    try:
        q.processAllAvailable()
        replayed = {
            r.window_start_ms: r.n_events
            for r in spark.table("replay_sink_b").collect()
        }
        # the restarted memory sink only materializes on its next
        # batch: either nothing triggered (committed offsets cover b1)
        # or the recovered state reproduces the first run exactly —
        # never a recount
        assert replayed in ({}, first), (first, replayed)
        # new data after the restart counts exactly once: window-01
        # becomes 3 (2 recovered + 1 new).  5 would mean b1 was re-read
        # (double-count), 1 would mean the checkpoint state was lost
        write_batch("b2.parquet", [("01:50:00", 4.0), ("03:30:00", 8.0)])
        q.processAllAvailable()
        final = {
            r.window_start_ms: r.n_events
            for r in spark.table("replay_sink_b").collect()
        }
    finally:
        q.stop()
    w1 = min(first)
    assert final[w1] == 3, final
    assert len(final) == 2 and set(final.values()) == {3, 1}, final


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Ingest dedup semantics: an event id re-delivered in a later
    micro-batch (with a re-stamped event time, as a retrying producer
    would) is dropped as long as it arrives within the watermark
    horizon; distinct ids all pass.  Append-mode file stream, memory
    sink — the same harness as the late-data test."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F
    from rangebar_patterns_spark.streaming import dedup_events_stream

    src = tmp_path / "src"
    src.mkdir()
    day = "2024-01-01 "

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            {
                "event_id": [i for i, _, _ in rows],
                "ts": pd.to_datetime([day + t for _, t, _ in rows]),
                "event_type": ["E" for _ in rows],
                "value": [v for _, _, v in rows],
            }
        )
        pq.write_table(
            pa.Table.from_pandas(pdf), src / name, coerce_timestamps="us"
        )

    write_batch("b1.parquet", [(1, "01:00:00", 1.0), (2, "01:10:00", 2.0)])
    schema = "event_id bigint, ts timestamp, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(str(src))
        .withColumn("event_time", F.col("ts"))
    )
    q = (
        dedup_events_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # id 2 re-delivered 5 minutes later (re-stamped), id 3 is new
        write_batch("b2.parquet", [(2, "01:15:00", 2.0), (3, "01:20:00", 3.0)])
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(r.event_id for r in spark.table("dedup_sink").collect())
    assert got == [1, 2, 3], f"each id exactly once, got {got}"


def test_streaming_bloom_guard_matches_batch_twin(spark, tmp_path):
    """Round-12 streaming decontamination: split the documents file into
    three files, force one micro-batch per file, and compare the
    streamed output to a sequential replay of the SAME pure ingest
    function — state (the Bloom bit array + benchmark counter) must
    carry across micro-batches, and the emitted n_bench_seen column
    must show the filter evolving (early corpus docs scored against a
    smaller benchmark than later ones)."""
    import os

    from rangebar_patterns_spark.streaming import (
        bloom_guard_batch,
        decontamination_guard_stateful,
    )
    from rangebar_patterns_spark.streaming.decon_stream import (
        BLOOM_STREAM_WORDS,
    )

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = len(docs)
    parts = [docs.iloc[: n // 3], docs.iloc[n // 3 : 2 * n // 3],
             docs.iloc[2 * n // 3 :]]
    assert all(len(p) > 0 for p in parts)
    # every part must contain at least one benchmark doc so each batch
    # actually grows the filter
    for p in parts:
        assert (p["doc_id"] % 100 == 7).any()
    for i, p in enumerate(parts):
        f = tmp_path / f"documents_{i}.parquet"
        p.to_parquet(f, index=False)
        os.utime(f, (1_000_000 + i, 1_000_000 + i))

    got = [
        tuple(r)
        for r in decontamination_guard_stateful(
            spark,
            str(tmp_path),
            glob="documents_*.parquet",
            sink_name="decon_multibatch_sink",
            stream_options={"maxFilesPerTrigger": "1"},
        ).collect()
    ]

    words, n_bench = [0] * BLOOM_STREAM_WORDS, 0
    expect: list = []
    for p in parts:
        out, words, n_bench = bloom_guard_batch(
            list(zip((int(d) for d in p["doc_id"]), p["text"])),
            words,
            n_bench,
        )
        expect.extend(out)

    assert sorted(got) == sorted(expect)
    # the guard evolved: distinct filter versions were observed, ending
    # at the full benchmark count
    versions = sorted({r[5] for r in got})
    assert len(versions) == 3
    assert versions[-1] == n_bench
    # monotone one-sidedness: any doc with a bloom hit against an early
    # filter would also hit the final filter (bits only ever set) —
    # spot-check by rescoring everything against the final filter
    final_scores = {
        r[0]: r[2]
        for r in bloom_guard_batch(
            [
                (int(d), t)
                for d, t in zip(docs["doc_id"], docs["text"])
            ],
            [0] * BLOOM_STREAM_WORDS,
            0,
        )[0]
    }
    for doc_id, _ns, n_bloom, *_rest in got:
        assert n_bloom <= final_scores[doc_id]
