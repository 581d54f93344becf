"""The driver captures only a ~2000-char stdout TAIL of bench.py; round 5
lost its performance record when the single JSON line outgrew that window
(BENCH_r05.json "parsed": null).  Pin the transport contract so the class
of regression can't recur: the driver-facing line must parse as one JSON
object and stay under the budget FOR THE LIVE CATALOG (worst-case value
widths), and the degradation ladder must keep any future, larger catalog
parseable too."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import bench
from rangebar_patterns_spark.plans.catalog import QUERIES, RESTORED_QUERIES


def _line_for(names, val):
    out = {
        "bench_version": bench.BENCH_VERSION,
        "metric": "catalog_total_wall",
        "value": 99999.999,
        "unit": "sec",
        "runs": 3,
        "queries": {n: val for n in names},
        "sf": 0.1,
        "demo_total": 99999.999,
        "unrated_n": 50,
        "detail": "BENCH_DETAIL.json",
        "sf1_total": 99999.999,
        "sf1_unrated_n": 50,
    }
    return bench.driver_line(out)


def test_driver_line_fits_live_catalog():
    # worst-case per-query width: hundreds of seconds with 3 decimals;
    # the timed tier = gate window + the r13-restored bench-only entries
    names = sorted(set(QUERIES) | set(RESTORED_QUERIES))
    line = _line_for(names, 999.999)
    assert len(line) <= bench.LINE_BUDGET, (
        f"driver line is {len(line)} bytes for {len(names)} queries — "
        "over the stdout-tail budget; shrink keys or raise the degradation"
    )
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(names)
    assert parsed["metric"] == "catalog_total_wall"


def test_driver_line_degrades_not_truncates():
    # a hypothetical 400-query catalog must still emit a parseable line
    names = [f"operator_with_a_long_descriptive_name_{i:03d}" for i in range(400)]
    line = _line_for(names, 999.999)
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)  # still one valid JSON object
    assert parsed["value"] == 99999.999
    assert "queries" not in parsed and parsed["queries_in"] == "BENCH_DETAIL.json"


def test_stdout_is_exactly_one_json_line_after_stateful_streaming(tmp_path):
    """Round 8's record loss: the JVM's StateStore maintenance thread —
    spawned by the streaming entry's state store, sharing our stdout fd —
    logged AFTER Python exited and displaced the head of the final JSON
    line out of the driver's end-anchored ~2000-char tail
    (BENCH_r08.json ``parsed: null``).  Run the real bench entrypoint
    end-to-end over the stateful-streaming entry and assert the process
    stdout is EXACTLY the one driver line — nothing before, nothing
    after, even from the JVM."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_ONLY="streaming_hourly_counts",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_BENCH_DEMO_RUNS="0",
        SPARK_GRAFT_BENCH_SF1="0",
        SPARK_GRAFT_BENCH_WARMUP="0",
        SPARK_GRAFT_BENCH_DETAIL_PATH=str(tmp_path / "detail.json"),
    )
    env.pop("SPARK_GRAFT_BENCH_INNER", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(bench.__file__), "bench.py")],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        timeout=600,
    )
    assert proc.returncode == 0
    lines = proc.stdout.decode().splitlines()
    assert len(lines) == 1, f"stdout must be ONE line, got {len(lines)}: {lines[:3]}"
    parsed = json.loads(lines[0])
    assert parsed["metric"] == "catalog_total_wall"
    assert set(parsed["queries"]) == {"streaming_hourly_counts"}
    assert (tmp_path / "detail.json").exists()


def test_medians_and_spreads_skip_nan():
    s = {"q1": [1.0, 2.0, 100.0], "q2": [float("nan"), 3.0, 5.0]}
    assert bench.medians(s) == {"q1": 2.0, "q2": 4.0}
    assert bench.spreads(s) == {"q1": [1.0, 100.0], "q2": [3.0, 5.0]}


def test_noise_rating_helpers():
    """r10 noise machinery: IQR degrades honestly at tiny n, the
    unrated flag fires exactly on spreads beyond +/-50% of the median,
    and the cpu/wall ratio uses medians of both series."""
    samples = {
        "steady": [10.0, 10.5, 11.0, 10.2],
        "noisy": [10.0, 10.5, 22.0, 10.2],   # max > 1.5x median
        "dipper": [10.0, 10.5, 4.0, 10.2],   # min < 0.5x median
        "pair": [9.0, 11.0],
        "tiny": [0.2, 0.45],  # >50% relative but under the 0.5s floor
        "failed": [float("nan")],
    }
    assert bench.unrated(samples) == ["dipper", "noisy"]
    iqr = bench.iqrs(samples)
    assert iqr["pair"] == [9.0, 11.0]  # <3 samples -> [min, max]
    q1, q3 = iqr["steady"]
    assert 10.0 <= q1 <= q3 <= 11.0
    assert "failed" not in iqr
    ratio = bench.cpu_wall_ratio({"steady": [20.0, 21.0, 20.5, 20.2]}, samples)
    assert ratio == {"steady": round(20.35 / 10.35, 2)}


def test_tree_cpu_sees_child_processes():
    """The per-entry CPU column must include descendant processes (the
    local-mode JVM), not just the python driver.  Polls with a generous
    deadline (ADVICE r10: on the documented 2-4x co-tenant-steal hosts a
    single fixed 1.2s sleep could catch the child before it was ever
    scheduled)."""
    import time as _time

    c0 = bench.tree_cpu_snapshot()
    assert sum(c0.values()) > 0.0
    p = subprocess.Popen(
        [sys.executable, "-c",
         "t=0\nfor i in range(3*10**7): t+=i*i"],
    )
    try:
        deadline = _time.monotonic() + 10.0
        delta = 0.0
        while _time.monotonic() < deadline:
            delta = bench.tree_cpu_delta(c0, bench.tree_cpu_snapshot())
            if delta > 0.1:
                break
            _time.sleep(0.2)
        assert delta > 0.1  # the child's burn is visible while it lives
    finally:
        p.kill()
        p.wait()


def test_tree_cpu_delta_vanished_pid_never_negative():
    """VERDICT r10 #1 regression pin: a descendant that exits between the
    two snapshots (taking its accumulated CPU out of the end walk) must
    contribute 0 — never drive the whole delta negative the way the old
    total-minus-total arithmetic did (BENCH_DETAIL r10 committed
    cpu/wall = -29.1 for dedup_neardup_pairs sf1)."""
    start = {1000: 5.0, 2000: 120.0, 3000: 0.5}   # 2000 = a worker daemon
    end = {1000: 7.5, 3000: 0.5}                   # ...that died mid-entry
    delta = bench.tree_cpu_delta(start, end)
    assert delta == 2.5  # pid 1000's burn only; nothing negative

    # a pid born inside the window counts its whole (in-window) CPU
    assert bench.tree_cpu_delta({1000: 5.0}, {1000: 5.0, 4000: 3.0}) == 3.0

    # pid reuse (same pid, smaller cumulative CPU) clamps at 0
    assert bench.tree_cpu_delta({5000: 9.0}, {5000: 1.0}) == 0.0

    # the failure shape itself: every surviving pid idle, one big exit
    assert bench.tree_cpu_delta({1: 1.0, 2: 300.0}, {1: 1.0}) == 0.0


def test_unrated_trims_single_outlier_at_five_samples():
    """r12 rating refinement: with >= 5 samples the single sample
    farthest from the median is dropped before the min/max rule — one
    co-tenant epoch can't permanently flag an entry four agreeing
    passes cleared, while two outliers (or genuine spread) still flag.
    The adaptive retry passes exist to push entries over this
    threshold."""
    # 4 samples, one epoch outlier -> still flagged (not enough evidence)
    assert bench.unrated({"q": [10.0, 10.5, 26.0, 10.2]}) == ["q"]
    # a 5th agreeing sample clears it (outlier trimmed from the verdict)
    assert bench.unrated({"q": [10.0, 10.5, 26.0, 10.2, 10.4]}) == []
    # two outliers survive the single-sample trim -> stays flagged
    assert bench.unrated({"q": [10.0, 10.5, 26.0, 10.2, 25.0]}) == ["q"]
    # genuine wide spread (no single outlier) stays flagged
    assert bench.unrated({"q": [5.0, 30.0, 10.0, 28.0, 4.0]}) == ["q"]
    # the quoted median itself is never trimmed
    assert bench.medians({"q": [10.0, 10.5, 26.0, 10.2, 10.4]}) == {
        "q": 10.4
    }
