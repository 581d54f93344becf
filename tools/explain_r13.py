#!/usr/bin/env python
"""Dump .explain("formatted") for every declared catalog query to
plans/r13/<query>_<tag>.txt (tag = before/after, argv[1]).

Usage: python tools/explain_r13.py before [query ...]

Runs at $SPARK_GRAFT_SF_DIR (default sf0.1) so plan shapes match the
bench tier.  Explain only — no execution — except that catalog side
caches (persisted bars/features) are built lazily by the query
constructors themselves; constructors that materialize side state
(k-means centroids, BPE merges) do run that bounded training step.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)

    from rangebar_patterns_spark.session import get_spark

    spark = get_spark("explain_r13")
    import __spark_entry__ as entrymod

    qs = dict(entrymod.queries())
    from rangebar_patterns_spark.plans.catalog import RESTORED_QUERIES

    qs.update(RESTORED_QUERIES)
    if names:
        qs = {n: qs[n] for n in names}
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # keep going; record the failure
            plan = f"EXPLAIN FAILED: {exc}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        joins = sum(
            plan.count(j)
            for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                      "BroadcastNestedLoopJoin", "CartesianProduct")
        )
        n_py = sum(plan.count(p) for p in (
            "BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
            "MapInPandas", "PythonMapInArrow", "MapInArrow"))
        print(f"{name}: exchanges={n_ex} joins={joins} python={n_py} -> {path}",
              file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
