"""Replicate the driver's correctness gate for selected queries at sf0.01.

Usage: python tools/compare_sf001.py [query ...]   (default: all with oracles)
Prints per-query rows/schema/exact-value-match, exits nonzero on any mismatch.
"""

from __future__ import annotations

import sys

import duckdb

SF_DIR = "/root/testdata/sf0.01"


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from rangebar_patterns_spark.plans.catalog import (
        BENCH_ORACLES,
        BENCH_QUERIES,
        ORACLES,
        QUERIES,
    )
    from rangebar_patterns_spark.session import get_spark
    from rangebar_patterns_spark.sources.tables import TABLES

    spark = get_spark("compare-sf001", master="local[8]", shuffle_partitions=8)
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'")

    # bench-tier workloads with oracle twins (e.g. the full-width gen600
    # panel) are addressable by name for one-shot certifications, but
    # only gate entries run by default
    qs = {**QUERIES, **BENCH_QUERIES}
    oracles = {**ORACLES, **BENCH_ORACLES}
    names = sys.argv[1:] or [n for n in sorted(QUERIES) if n in ORACLES]
    bad = 0
    for name in names:
        sp = qs[name](spark, SF_DIR).toPandas()
        if name not in oracles:
            print(f"{name}: rows={len(sp)} (no_oracle)")
            continue
        du = con.execute(oracles[name]).df()
        cols = sorted(sp.columns)
        ok_schema = cols == sorted(du.columns)
        ok_rows = len(sp) == len(du)
        ok_vals = False
        detail = ""
        if ok_schema and ok_rows:
            s = sp[cols].sort_values(cols).reset_index(drop=True)
            d = du[cols].sort_values(cols).reset_index(drop=True)
            ok_vals = True
            for c in cols:
                sc, dc = s[c], d[c]
                if sc.dtype.kind == "f" or dc.dtype.kind == "f":
                    import numpy as np

                    scf = sc.astype(float)
                    dcf = dc.astype(float)
                    # Bit-level equality replicates the driver's value-hash:
                    # two equal non-zero doubles share a bit pattern, so this
                    # only tightens the check for -0.0 vs 0.0 (distinct bits,
                    # equal floats) while both-NaN/NULL still count as equal.
                    bits_eq = (
                        scf.values.view("uint64") == dcf.values.view("uint64")
                    )
                    eq = bits_eq | (scf.isna() & dcf.isna()).values
                else:
                    eq = (sc.values == dc.values) | (sc.isna() & dc.isna()).values
                if not eq.all():
                    ok_vals = False
                    i = int((~eq).argmax())
                    detail += f" [{c}@{i}: spark={s[c].iloc[i]!r} duck={d[c].iloc[i]!r}]"
        status = "OK" if (ok_schema and ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            bad += 1
        print(
            f"{name}: {status} rows={len(sp)}/{len(du)} schema={ok_schema} "
            f"vals={ok_vals}{detail}"
        )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
