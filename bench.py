#!/usr/bin/env python
"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing convention: each query is planned AND fully executed (count() of the
result — forces the whole DAG, no collect of wide rows to the driver).  The
session is built once; first query pays JVM/codegen warmup, so we run a tiny
pre-warm query first.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from rangebar_patterns_spark.session import get_spark

    spark = get_spark("bench")

    import __spark_entry__ as entrymod

    qs = dict(entrymod.queries())
    # demonstration-scale bench-only workloads (full-width gen600 grid):
    # timed here, correctness-pinned in the pytest oracle suite
    from rangebar_patterns_spark.plans.catalog import BENCH_QUERIES

    # pre-warm: JVM classloading + codegen on a trivial plan
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}

    def run(name, fn):
        t0 = time.perf_counter()
        try:
            n = fn(spark, sf_dir).count()
        except Exception as exc:  # record failures, don't kill the bench
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = float("nan")
            return
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"bench: {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    for name, fn in qs.items():
        run(name, fn)
    # "catalog_total_wall" covers exactly the 50 driver-gate entries —
    # the demonstration grids are timed separately below so the headline
    # metric stays comparable across rounds
    total = round(sum(t for t in timings.values() if t == t), 3)
    # the demonstration grids are measured standalone: drop the catalog's
    # ~50 persisted relations first so the wide grid isn't competing with
    # them for executor memory (matches how a dedicated cluster run would
    # schedule it)
    spark.catalog.clearCache()
    for name, fn in BENCH_QUERIES.items():
        run(name, fn)
    demo_total = round(
        sum(t for n, t in timings.items() if n in BENCH_QUERIES and t == t), 3
    )
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "demo_total": demo_total,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
