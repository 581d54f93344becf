"""Hash-certify the full-width gen600 PANEL — the gate entry's funnel
(22 templates × 2 bar features × 38 cross features × 4 quantile combos)
LEFT JOINed to per-(config, symbol, barrier) trade metrics over every
surviving signal — against the bulk DuckDB panel twin at sf0.001.

Tiering (VERDICT r6/r7 "missing": the panel was the last §2.9-family
plan never hash-checked): the driver gate certifies the funnel at this
width at sf0.01 (`sweep_gen600_fullgrid`) and the panel JOIN shape +
barrier arithmetic on the faithful 44-config twin (`sweep_panel`); this
test closes the remaining combination — barrier metrics AT full grid
width — at the local fixture scale where the 3,344-config trades-chain
oracle stays tractable.  tools/compare_sf001.py sweep_gen600_fullgrid_panel
reruns the same compare at sf0.01 (one-shot certification recorded in
FIXTURES.md).
"""

from __future__ import annotations

from conftest import SF_DIR, compare_frames


def test_fullgrid_panel_matches_bulk_panel_oracle(spark, duck):
    from rangebar_patterns_spark.config import gen600_profiles
    from rangebar_patterns_spark.operators.crossfeatures import cross_feat_cte
    from rangebar_patterns_spark.operators.sweep import gen600_full_grid
    from rangebar_patterns_spark.plans.catalog import (
        _FULLGRID_FEATURES,
        BARS_DUCKDB_CTE,
        GEN600_FULL_BAR_FEATURES,
        WARMUP,
        _featg_ctes,
        _materialize,
        q_sweep_gen600_full_panel,
    )
    from rangebar_patterns_spark.plans.sweep_oracle import (
        sweep_panel_oracle_bulk,
    )

    grid = gen600_full_grid(GEN600_FULL_BAR_FEATURES)
    sql = _materialize(
        f"""
WITH {BARS_DUCKDB_CTE},
{_featg_ctes()},
{cross_feat_cte(source="featg", name="featx")},
{sweep_panel_oracle_bulk(
    grid,
    gen600_profiles(),
    WARMUP,
    _FULLGRID_FEATURES,
    feat_relation="featx",
)}
""",
        "bars", "feat", "featg", "fwdarr",
    )
    sp = q_sweep_gen600_full_panel(spark, SF_DIR)
    du = duck.execute(sql).df()
    compare_frames(sp, du)
