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


def test_streaming_hourly_matches_batch(spark, duck):
    from rangebar_patterns_spark.plans.catalog import ORACLES, QUERIES

    from conftest import compare_frames

    sp = QUERIES["streaming_hourly_counts"](spark, SF_DIR)
    du = duck.execute(ORACLES["streaming_hourly_counts"]).df()
    compare_frames(sp, du)
