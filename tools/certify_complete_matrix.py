"""Hash-certify the COMPLETE 30,096-config gen600 per-asset matrix against
the bulk DuckDB twin at an arbitrary scale factor.

The pytest tier pins this at sf0.001 (tests/test_complete_matrix.py,
~75 s); this tool runs the identical compare at driver scale or above —
the 30k-config DuckDB oracle is ~linear in configs x rows, so sf0.01
takes tens of minutes and is kept out of the suite.

Usage: python tools/certify_complete_matrix.py [sf_dir]   (default sf0.01)
Prints one line: rows / schema / exact-value verdict; exit 0 iff all match.
"""

from __future__ import annotations

import os
import sys

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from rangebar_patterns_spark.operators.crossfeatures import (
        CROSS_FEATURES,
        cross_feat_cte,
    )
    from rangebar_patterns_spark.operators.sweep import gen600_full_grid
    from rangebar_patterns_spark.plans.catalog import (
        BARS_DUCKDB_CTE,
        GEN600_BAR9_FEATURES,
        WARMUP,
        _featg_ctes,
        _materialize,
        q_sweep_gen600_complete_matrix,
    )
    from rangebar_patterns_spark.plans.sweep_oracle import (
        sweep_funnel_oracle_bulk,
    )
    from rangebar_patterns_spark.session import get_spark
    from rangebar_patterns_spark.sources.tables import TABLES

    grid = gen600_full_grid(GEN600_BAR9_FEATURES)
    sql = _materialize(
        f"""
WITH {BARS_DUCKDB_CTE},
{_featg_ctes()},
{cross_feat_cte(source="featg", name="featx")},
{sweep_funnel_oracle_bulk(
    grid,
    WARMUP,
    sorted({*GEN600_BAR9_FEATURES, *CROSS_FEATURES}),
    feat_relation="featx",
)}
""",
        "bars", "feat", "featg",
    )

    spark = get_spark("certify-complete-matrix")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    sp = q_sweep_gen600_complete_matrix(spark, sf_dir).toPandas()

    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_cm_spill'")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    du = con.execute(sql).df()

    cols = sorted(sp.columns)
    ok_schema = cols == sorted(du.columns)
    ok_rows = len(sp) == len(du)
    ok_vals = False
    if ok_schema and ok_rows:
        a = sp[cols].sort_values(cols).reset_index(drop=True)
        b = du[cols].sort_values(cols).reset_index(drop=True)
        ok_vals = all(
            (a[c].astype(float).fillna(-1) == b[c].astype(float).fillna(-1)).all()
            if a[c].dtype.kind in "fiu" or b[c].dtype.kind in "fiu"
            else (a[c] == b[c]).all()
            for c in cols
        )
    ok = ok_schema and ok_rows and ok_vals
    print(
        f"complete_matrix@{sf_dir}: configs={len(grid)} "
        f"rows={len(sp)}/{len(du)} schema={ok_schema} vals={ok_vals} "
        f"{'OK' if ok else 'MISMATCH'}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
