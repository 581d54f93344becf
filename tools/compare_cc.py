#!/usr/bin/env python
"""Compare the two connected-components implementations (min-label
propagation vs alternating star contraction) on the MinHash-LSH near-dup
pairs: wall time, convergence rounds, edge rows joined per round, and the
actual shuffle bytes each run wrote (Spark REST API, UI-enabled session).

Usage: python tools/compare_cc.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line per implementation plus a summary line.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request


def shuffle_totals(ui_port: int = 4040) -> tuple[int, int]:
    """(shuffle_write_bytes, shuffle_read_bytes) summed over all stages."""
    base = f"http://localhost:{ui_port}/api/v1/applications"
    apps = json.load(urllib.request.urlopen(base))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{base}/{app_id}/stages"))
    w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return w, r


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sys.path.insert(0, "/root/repo")
    from rangebar_patterns_spark.operators import dedup
    from rangebar_patterns_spark.plans.catalog import _minhash_pairs
    from rangebar_patterns_spark.session import get_spark

    spark = get_spark("compare_cc", extra_conf={"spark.ui.enabled": "true"})
    pairs = _minhash_pairs(spark, sf_dir)
    n_pairs = pairs.count()
    print(f"pairs: {n_pairs}", file=sys.stderr)

    results = {}
    for name, fn in (
        ("propagate", dedup.duplicate_clusters),
        ("star", dedup.duplicate_clusters_star),
    ):
        spark.catalog.clearCache()
        pairs.persist().count()
        w0, r0 = shuffle_totals()
        stats: dict = {}
        t0 = time.perf_counter()
        out = fn(pairs, stats_out=stats).orderBy("doc_id").collect()
        wall = round(time.perf_counter() - t0, 3)
        w1, r1 = shuffle_totals()
        results[name] = {
            "wall_s": wall,
            "rounds": stats.get("rounds"),
            "edge_rows_per_round": stats.get("edge_rows_per_round"),
            "edge_rows_total": sum(stats.get("edge_rows_per_round", [])),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 2),
            "shuffle_read_mb": round((r1 - r0) / 1e6, 2),
            "n_rows": len(out),
            "checksum": sum(r.doc_id * 31 + r.cluster_rep for r in out) % 10**9,
        }
        print(json.dumps({name: results[name]}))

    same = (
        results["propagate"]["n_rows"] == results["star"]["n_rows"]
        and results["propagate"]["checksum"] == results["star"]["checksum"]
    )
    print(json.dumps({"pairs": n_pairs, "outputs_identical": same}))


if __name__ == "__main__":
    main()
