#!/usr/bin/env python
"""Profile the sweep_gen600_complete_matrix demo: run it once at the given
SF dir with the Spark UI enabled and print the top stages by task time,
with shuffle read/write and input sizes — attribution for the demo's wall
clock.

Usage: python tools/profile_fullmatrix.py [sf_dir] [query_name]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request


def stages(ui_port: int = 4040) -> list[dict]:
    base = f"http://localhost:{ui_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    qname = sys.argv[2] if len(sys.argv) > 2 else "sweep_gen600_complete_matrix"
    sys.path.insert(0, "/root/repo")
    from rangebar_patterns_spark.plans.catalog import BENCH_QUERIES, QUERIES
    from rangebar_patterns_spark.session import get_spark

    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    fn = BENCH_QUERIES.get(qname) or QUERIES[qname]
    t0 = time.perf_counter()
    n = fn(spark, sf_dir).count()
    wall = round(time.perf_counter() - t0, 1)
    print(f"{qname}: {wall}s ({n} rows)", file=sys.stderr)

    rows = []
    for s in stages():
        rows.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:80],
                "task_time_s": round(s.get("executorRunTime", 0) / 1e3, 1),
                "tasks": s.get("numCompleteTasks"),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "records_out": s.get("outputRecords", 0)
                or s.get("shuffleWriteRecords", 0),
            }
        )
    rows.sort(key=lambda r: -r["task_time_s"])
    total_task = sum(r["task_time_s"] for r in rows)
    print(json.dumps({"wall_s": wall, "total_task_time_s": round(total_task, 1)}))
    for r in rows[:20]:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
