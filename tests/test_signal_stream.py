"""Streaming champion-signal detector vs the batch engine: the stateful
stream must reproduce the batch `with_bar_features` + `champion_signal`
decisions bit-for-bit, including when the rolling threshold window spans
micro-batch boundaries."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from rangebar_patterns_spark.operators.signals import champion_signal, eligibility
from rangebar_patterns_spark.operators.windows import with_bar_features
from rangebar_patterns_spark.sources.bars import bars_from_events
from rangebar_patterns_spark.streaming.signal_stream import (
    champion_signals_stateful,
)

from conftest import SF_DIR, compare_frames

LOOKBACK = 999
WARMUP = 100
COLS = ["symbol", "rn", "direction", "dir_1", "trade_intensity",
        "ti_p95_prior", "is_signal"]


def _batch_twin(spark, bars):
    feat = with_bar_features(bars, p=0.95, rolling_window=LOOKBACK)
    return feat.select(
        "symbol",
        "rn",
        F.col("direction").cast("long").alias("direction"),
        F.col("dir_1").cast("long").alias("dir_1"),
        "trade_intensity",
        "ti_p95_prior",
        F.coalesce(champion_signal() & eligibility(WARMUP), F.lit(False)).alias(
            "is_signal"
        ),
    )


def test_stream_matches_batch_single_batch(spark, tmp_path):
    bars = bars_from_events(spark, SF_DIR)
    bars.write.parquet(str(tmp_path / "bars"))
    got = champion_signals_stateful(
        spark, str(tmp_path / "bars"), lookback=LOOKBACK, warmup=WARMUP,
        sink_name="sig_stream_single",
    )
    compare_frames(got, _batch_twin(spark, bars).toPandas())
    assert got.filter("is_signal").count() > 0  # signals actually fire


def test_stream_carries_window_state_across_micro_batches(spark, tmp_path):
    """Split the bars into three rn-contiguous slices, one micro-batch
    each: every threshold after the first slice is a quantile over a
    window that spans batches, so this fails if the sorted-buffer state
    is dropped or misrestored between batches."""
    bars_pd = bars_from_events(spark, SF_DIR).toPandas()
    cuts = bars_pd["rn"].quantile([1 / 3, 2 / 3]).astype(int).tolist()
    parts = [
        bars_pd[bars_pd["rn"] <= cuts[0]],
        bars_pd[(bars_pd["rn"] > cuts[0]) & (bars_pd["rn"] <= cuts[1])],
        bars_pd[bars_pd["rn"] > cuts[1]],
    ]
    assert all(len(pt) > 0 for pt in parts)
    for i, pt in enumerate(parts):
        f = tmp_path / f"bars_{i}.parquet"
        pt.to_parquet(f, index=False)
        # file source orders batches by (modification time, path)
        os.utime(f, (1_000_000 + i, 1_000_000 + i))

    progress: list = []
    got = champion_signals_stateful(
        spark, str(tmp_path), lookback=LOOKBACK, warmup=WARMUP,
        glob="bars_*.parquet", sink_name="sig_stream_multi",
        stream_options={"maxFilesPerTrigger": "1"}, progress_out=progress,
    )
    assert len([p for p in progress if p.numInputRows > 0]) == 3
    bars = bars_from_events(spark, SF_DIR)
    compare_frames(got, _batch_twin(spark, bars).toPandas())
