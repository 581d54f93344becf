"""Round-13 bench-pairing restore (VERDICT r12 "What's wrong #1").

The r11-sanctioned merge of ``cutoff_grid_search`` + ``eval_ou_calibration``
into ``cutoff_ou_panel`` broke the driver's round-over-round bench pairing:
PERF r12 counts both names dropped_from_bench.  The names are restored as
bench-timed entries OUTSIDE the 50-entry correctness window
(plans/catalog.RESTORED_QUERIES); this module is their correctness record:

- each restored entry matches its r11 DuckDB oracle (same check the
  driver's gate would run);
- each restored entry equals its stage slice of the gate-certified
  ``cutoff_ou_panel`` union (so the restored numbers can never drift from
  the certified panel);
- the restored dict never collides with the gate window.
"""

from __future__ import annotations

import pytest

from rangebar_patterns_spark.plans.catalog import (
    QUERIES,
    RESTORED_ORACLES,
    RESTORED_QUERIES,
)

from conftest import SF_DIR, compare_frames


def test_restored_set_is_exactly_the_r12_dropped_pair():
    assert set(RESTORED_QUERIES) == {"cutoff_grid_search", "eval_ou_calibration"}
    assert set(RESTORED_ORACLES) == set(RESTORED_QUERIES)
    assert not set(RESTORED_QUERIES) & set(QUERIES)


@pytest.mark.parametrize("name", sorted(RESTORED_QUERIES))
def test_restored_entry_matches_oracle(name, spark, duck):
    sp = RESTORED_QUERIES[name](spark, SF_DIR)
    du = duck.execute(RESTORED_ORACLES[name]).df()
    compare_frames(sp, du)


def test_restored_entries_equal_their_panel_slices(spark):
    from pyspark.sql import functions as F

    panel = QUERIES["cutoff_ou_panel"](spark, SF_DIR)

    cut = RESTORED_QUERIES["cutoff_grid_search"](spark, SF_DIR)
    cut_cols = ["cand_id", "cut_omega", "cut_cdar_inv", "n_survivors",
                "avg_quality", "mean_cutoff", "objective"]
    got = sorted(
        panel.filter(F.col("stage") == "cutoff").select(*cut_cols).collect()
    )
    want = sorted(
        cut.select(*[F.col(c).cast("long") if c in cut_cols[:4] else F.col(c)
                     for c in cut_cols]).collect()
    )
    assert got == want

    ou = RESTORED_QUERIES["eval_ou_calibration"](spark, SF_DIR)
    ou_cols = ["symbol", "mu_dt", "sigma_dt", "half_life", "optimal_tp_frac"]
    got = sorted(
        panel.filter(F.col("stage") == "ou").select(*ou_cols).collect()
    )
    want = sorted(ou.select(*ou_cols).collect())
    assert got == want


def test_bench_times_the_restored_entries():
    """bench.py must merge the restored dict into the timed catalog tier
    so the driver line's ``queries`` carries the historical names again."""
    import inspect

    import bench

    src = inspect.getsource(bench.main)
    assert "RESTORED_QUERIES" in src and "qs.update(RESTORED_QUERIES)" in src
