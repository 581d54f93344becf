"""E29 cutoff search: population evaluation semantics and deterministic
evolution (operators/cutoff_search.py).  The grid entry's cross-engine
parity is covered by the catalog oracle gate (cutoff_grid_search); these
tests pin the search driver itself.
"""

from __future__ import annotations

import pytest

from rangebar_patterns_spark.operators.cutoff_search import (
    evaluate_cutoffs,
    evolve_cutoffs,
    grid_candidates,
)


@pytest.fixture(scope="module")
def metrics_df(spark):
    # 10 configs; metric m1 ranks them 0..9, m2 ranks them in reverse —
    # so tight cutoffs on both can only be satisfied by nothing, and
    # cutoff (100, 100) keeps everything.
    rows = [("s", f"b{i:02d}", float(i), float(9 - i)) for i in range(10)]
    return spark.createDataFrame(
        rows, "symbol string, barrier_id string, m1 double, m2 double"
    )


def test_evaluate_cutoffs_counts(spark, metrics_df):
    out = {
        (r["cut_m1"], r["cut_m2"]): r
        for r in evaluate_cutoffs(
            metrics_df, ["m1", "m2"], [(100, 100), (50, 50), (10, 10)]
        ).collect()
    }
    assert out[(100, 100)]["n_survivors"] == 10
    # top 50% on m1 = ranks {5..9}, on m2 = {0..4} (reversed) -> pctrank
    # >= 0.5 on both: percent_rank 0.5 is attained by index 5 of 0..9 ->
    # m1 keeps i>=5 (rank 5/9...9/9 >= 0.5 -> i in 5..9), m2 keeps i<=4;
    # intersection empty except... disjoint -> 0
    assert out[(50, 50)]["n_survivors"] == 0
    assert out[(10, 10)]["n_survivors"] == 0
    # uniform 100 cutoff: avg quality = mean over all of (r1+r2)/2 = 0.5
    assert out[(100, 100)]["avg_quality"] == pytest.approx(0.5)
    assert out[(100, 100)]["objective"] == pytest.approx(round(10 / 100.0, 6))


def test_objective_prefers_tight_nonempty(spark, metrics_df):
    # aligned metrics: m1 == m2 ordering -> survivors shrink smoothly;
    # objective n/mean_cut should prefer a tighter-than-100 cutoff
    rows = [("s", f"b{i:02d}", float(i), float(i)) for i in range(10)]
    df = spark.createDataFrame(
        rows, "symbol string, barrier_id string, m1 double, m2 double"
    )
    scored = evaluate_cutoffs(df, ["m1", "m2"], grid_candidates(2)).collect()
    best = scored[0]
    assert best["objective"] > round(10 / 100.0, 6)
    assert best["n_survivors"] > 0
    # ordering is best-first
    objs = [r["objective"] for r in scored]
    assert objs == sorted(objs, reverse=True)


def test_evolve_deterministic(spark, metrics_df):
    rows = [("s", f"b{i:02d}", float(i), float(i)) for i in range(10)]
    df = spark.createDataFrame(
        rows, "symbol string, barrier_id string, m1 double, m2 double"
    )
    a = evolve_cutoffs(df, ["m1", "m2"], pop_size=8, generations=3, seed=42)
    b = evolve_cutoffs(df, ["m1", "m2"], pop_size=8, generations=3, seed=42)
    assert a == b
    assert a["n_survivors"] > 0
    # the best-so-far objective never regresses across generations
    hist = a["history"]
    assert max(hist) == pytest.approx(a["best_objective"])
