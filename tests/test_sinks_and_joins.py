"""Sink round-trips (S3/S5/S9) and the J1 range-join ↔ W5 window-array
equivalence."""

from __future__ import annotations

import pyspark.sql.functions as F

from rangebar_patterns_spark.operators.joins import forward_range_join
from rangebar_patterns_spark.sources.bars import bars_from_events
from rangebar_patterns_spark.sources.sinks import (
    append_results,
    overwrite_partitions,
    read_telemetry_ndjson,
    write_telemetry_ndjson,
)

from conftest import SF_DIR


def test_append_and_dynamic_overwrite(spark, tmp_path):
    path = str(tmp_path / "results")
    bars = bars_from_events(spark, SF_DIR).select("symbol", "rn", "close")
    append_results(bars, path, partition_by=["symbol"])
    n0 = spark.read.parquet(path).count()
    assert n0 == bars.count()
    # S5: rerun ONE symbol with halved rows; only that partition replaced
    one = bars.filter("symbol = 'click' AND rn % 2 = 0")
    overwrite_partitions(one, path, partition_by=["symbol"])
    after = spark.read.parquet(path)
    assert after.filter("symbol = 'click'").count() == one.count()
    assert (
        after.filter("symbol != 'click'").count()
        == bars.filter("symbol != 'click'").count()
    )


def test_ndjson_telemetry_roundtrip(spark, tmp_path):
    path = str(tmp_path / "telemetry")
    df = spark.createDataFrame(
        [("c1", 0.5, None), ("c2", None, 3)],
        "config_id string, hit_rate double, n int",
    )
    write_telemetry_ndjson(df, path)
    back = read_telemetry_ndjson(spark, path)
    assert back.count() == 2
    assert back.filter("config_id = 'c2'").first().n == 3


def test_range_join_matches_entry_forward_arrays(spark):
    """J1 (range self-join) and the window path the simulator consumes
    (``with_entry_and_forward``) must produce identical forward arrays —
    the two physical strategies for one logical op.  Pinned against the
    simulator contract (forward bars signal+2 .. signal+1+cap), NOT the
    entry-bar-inclusive W5 variant."""
    from rangebar_patterns_spark.operators.barriers import with_entry_and_forward

    bars = bars_from_events(spark, SF_DIR)
    cap = 15
    sigs = bars.filter(F.col("rn") % 53 == 0)
    via_join = forward_range_join(sigs, bars, cap).toPandas()
    via_window = (
        with_entry_and_forward(bars, cap)
        .filter(F.col("rn") % 53 == 0)
        .select("symbol", "rn", "fwd_highs", "fwd_lows", "fwd_opens", "fwd_closes")
        .toPandas()
    )
    # the window path emits short/empty arrays at the series tail; the join
    # path emits rows only when at least one forward bar exists
    via_window = via_window[via_window.fwd_highs.map(len) > 0].reset_index(drop=True)
    a = via_join.sort_values(["symbol", "rn"]).reset_index(drop=True)
    b = via_window.sort_values(["symbol", "rn"]).reset_index(drop=True)
    assert len(a) == len(b)
    for c in ["fwd_highs", "fwd_lows", "fwd_opens", "fwd_closes"]:
        assert all(list(x) == list(y) for x, y in zip(a[c], b[c])), c


def test_asof_join_fuzz_vs_pandas_merge_asof(spark):
    """Fuzz the union-merge as-of join against pandas.merge_asof
    (direction='backward', allow_exact_matches=True — the same
    at-or-before semantics) over seeded random bar/probe timestamp
    sets, including exact-tie timestamps and probes before any bar."""
    import numpy as np
    import pandas as pd

    from rangebar_patterns_spark.operators.joins import asof_join_bars

    rng = np.random.default_rng(77)
    bars_rows, probe_rows = [], []
    pid = 0
    for sym in ["A", "B", "C"]:
        bts = np.unique(rng.integers(0, 5000, size=60))
        for t in bts:
            bars_rows.append((sym, int(t), float(rng.normal())))
        # probes: random, plus exact bar-timestamp ties, plus one before
        # every bar
        pts = list(rng.integers(-100, 5100, size=40)) + list(bts[:5])
        for t in pts:
            probe_rows.append((pid, sym, int(t)))
            pid += 1

    bars = spark.createDataFrame(
        bars_rows, "symbol string, close_time_ms long, close double"
    )
    probes = spark.createDataFrame(
        probe_rows, "probe_id long, symbol string, ts_ms long"
    )
    got = (
        asof_join_bars(probes, bars, ["close"])
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )

    bpd = pd.DataFrame(bars_rows, columns=["symbol", "close_time_ms", "close"])
    ppd = pd.DataFrame(probe_rows, columns=["probe_id", "symbol", "ts_ms"])
    want = pd.merge_asof(
        ppd.sort_values("ts_ms"),
        bpd.sort_values("close_time_ms"),
        left_on="ts_ms",
        right_on="close_time_ms",
        by="symbol",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("probe_id").reset_index(drop=True)

    assert len(got) == len(want)
    g = got.set_index("probe_id")["bar_close"]
    w = want.set_index("probe_id")["close"]
    for k in w.index:
        gv, wv = g.get(k), w[k]
        if pd.isna(wv):
            assert pd.isna(gv), f"probe {k}: expected no match, got {gv}"
        else:
            assert gv == wv, f"probe {k}: {gv} != {wv}"
