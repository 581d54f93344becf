#!/usr/bin/env python
"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"bench_version": 3, "metric": "...", "value": N, "unit": "sec",
     "runs": R, "queries": {...}, "spread": {...}, "demo_total": N,
     "sf1": {...}, "sf": ...}

Timing convention: each query is planned AND fully executed (count() of the
result — forces the whole DAG, no collect of wide rows to the driver).  The
session is built once; first query pays JVM/codegen warmup, so we run a tiny
pre-warm query first.

Schema history ("bench_version"):
  (absent) r1-r3 — "value" summed every query incl. demo grids, single run.
  2 (implicit, r4) — "value" = the 50 gate entries only; demo grids under
    "demo_total".  Not comparable to r1-r3 "value".
  3 — "queries" holds per-query MEDIANS over ``runs`` cold-cache passes of
    the gate catalog ("spread" = [min, max] per query; "value" = sum of
    medians); demos stay single-run; optional "sf1" block = one catalog
    pass at scale-factor 1 (tools/gen_sf1.py fixtures, generated under
    .scratch/sf1 on first use; skip with SPARK_GRAFT_BENCH_SF1=0).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

BENCH_VERSION = 3


def time_queries(spark, qs, sf_dir, timings):
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            n = fn(spark, sf_dir).count()
        except Exception as exc:  # record failures, don't kill the bench
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings.setdefault(name, []).append(float("nan"))
            continue
        dt = round(time.perf_counter() - t0, 3)
        timings.setdefault(name, []).append(dt)
        print(f"bench: {name}: {dt}s ({n} rows)", file=sys.stderr)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from rangebar_patterns_spark.session import get_spark

    spark = get_spark("bench")

    import __spark_entry__ as entrymod

    qs = dict(entrymod.queries())
    # demonstration-scale bench-only workloads (full-width gen600 grids):
    # timed here, correctness-pinned in the pytest oracle suite
    from rangebar_patterns_spark.plans.catalog import (
        BENCH_QUERIES,
        reset_plan_caches,
    )

    # pre-warm: JVM classloading + codegen on a trivial plan
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # single-run wall-clock swings 2-4x on this host from co-tenant CPU
    # steal: run the gate catalog n_runs times cold (plan caches dropped
    # between passes) and report per-query medians + [min, max] spread
    samples: dict[str, list[float]] = {}
    for r in range(n_runs):
        print(f"bench: === catalog pass {r + 1}/{n_runs} ===", file=sys.stderr)
        time_queries(spark, qs, sf_dir, samples)
        reset_plan_caches(spark)

    def med(v):
        clean = [x for x in v if x == x]
        return round(statistics.median(clean), 3) if clean else float("nan")

    queries = {n: med(v) for n, v in samples.items()}
    spread = {
        n: [round(min(v), 3), round(max(v), 3)]
        for n, v in ((n, [x for x in v if x == x]) for n, v in samples.items())
        if v
    }
    total = round(sum(t for t in queries.values() if t == t), 3)

    # the demonstration grids are measured standalone (single run: the
    # catalog spread above already characterizes host noise) with the
    # catalog's persisted relations dropped first, so the wide grids
    # aren't competing with them for executor memory
    demo_t: dict[str, list[float]] = {}
    time_queries(spark, BENCH_QUERIES, sf_dir, demo_t)
    demos = {n: v[0] for n, v in demo_t.items()}
    demo_total = round(sum(t for t in demos.values() if t == t), 3)

    out = {
        "bench_version": BENCH_VERSION,
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "runs": n_runs,
        "queries": queries,
        "spread": spread,
        "demos": demos,
        "demo_total": demo_total,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    # sf1 section: one cold catalog pass at ~10x the default bench SF
    # (50 symbols, ~1M events) — the scale validation the README claims,
    # driver-recorded.  Fixtures are tiled from sf0.1 on first use.
    if os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") != "0" and sf == "0.1":
        sf1_dir = os.environ.get(
            "SPARK_GRAFT_SF1_DIR", "/root/repo/.scratch/sf1"
        )
        if not os.path.exists(os.path.join(sf1_dir, "events.parquet")):
            print("bench: generating sf1 fixtures...", file=sys.stderr)
            # keep stdout clean — this process prints ONE JSON line, so the
            # generator's progress output must land on stderr
            subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__), "tools", "gen_sf1.py"), sf1_dir],
                check=True,
                stdout=sys.stderr,
            )
        reset_plan_caches(spark)
        print("bench: === sf1 catalog pass ===", file=sys.stderr)
        sf1_t: dict[str, list[float]] = {}
        time_queries(spark, qs, sf1_dir, sf1_t)
        sf1_q = {n: v[0] for n, v in sf1_t.items()}
        out["sf1"] = {
            "queries": sf1_q,
            "total": round(sum(t for t in sf1_q.values() if t == t), 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
