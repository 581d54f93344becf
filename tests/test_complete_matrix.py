"""Hash-certify the COMPLETE reference per-asset gen600 matrix — all
22 templates × 9 bar features × 38 cross features × 4 quantile combos =
30,096 configs (scripts/gen600/generate.sh:58-175) — against the bulk
DuckDB twin at sf0.001.

Tiering: the driver gate certifies the 6,688-config 2-bar-feature slice
at sf0.01 (`sweep_gen600_fullgrid`); this test closes the remaining
width — the full 9-bar-feature matrix, same one plan the bench demo
times at sf0.1 — at the local fixture scale where the 30,096-config
oracle stays tractable (~2-3 min at 4 DuckDB threads)."""

from __future__ import annotations

from conftest import SF_DIR, compare_frames


def test_complete_matrix_matches_bulk_oracle(spark, duck):
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

    grid = gen600_full_grid(GEN600_BAR9_FEATURES)
    assert len(grid) == 30_096
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
    sp = q_sweep_gen600_complete_matrix(spark, SF_DIR)
    du = duck.execute(sql).df()
    compare_frames(sp, du)
