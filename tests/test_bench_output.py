"""The driver captures only a ~2000-char stdout TAIL of bench.py; round 5
lost its performance record when the single JSON line outgrew that window
(BENCH_r05.json "parsed": null).  Pin the transport contract so the class
of regression can't recur: the driver-facing line must parse as one JSON
object and stay under the budget FOR THE LIVE CATALOG (worst-case value
widths), and the degradation ladder must keep any future, larger catalog
parseable too."""

from __future__ import annotations

import json

import bench
from rangebar_patterns_spark.plans.catalog import QUERIES


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
        "detail": "BENCH_DETAIL.json",
        "sf1_total": 99999.999,
    }
    return bench.driver_line(out)


def test_driver_line_fits_live_catalog():
    # worst-case per-query width: hundreds of seconds with 3 decimals
    line = _line_for(sorted(QUERIES), 999.999)
    assert len(line) <= bench.LINE_BUDGET, (
        f"driver line is {len(line)} bytes for {len(QUERIES)} queries — "
        "over the stdout-tail budget; shrink keys or raise the degradation"
    )
    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(QUERIES)
    assert parsed["metric"] == "catalog_total_wall"


def test_driver_line_degrades_not_truncates():
    # a hypothetical 400-query catalog must still emit a parseable line
    names = [f"operator_with_a_long_descriptive_name_{i:03d}" for i in range(400)]
    line = _line_for(names, 999.999)
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)  # still one valid JSON object
    assert parsed["value"] == 99999.999
    assert "queries" not in parsed and parsed["queries_in"] == "BENCH_DETAIL.json"


def test_medians_and_spreads_skip_nan():
    s = {"q1": [1.0, 2.0, 100.0], "q2": [float("nan"), 3.0, 5.0]}
    assert bench.medians(s) == {"q1": 2.0, "q2": 4.0}
    assert bench.spreads(s) == {"q1": [1.0, 100.0], "q2": [3.0, 5.0]}
