"""E23 Vorob'ev stability geometry: exact hypervolume, attainment level
sets, and the threshold/deviation summary (operators/stability.py).

All checks are exact or invariant-based — no moocore to compare against
in this environment, so correctness rests on (a) voxel-exact hypervolume
on integer lattices, (b) the EAF counting identity
Σ_k HV(L_k) = Σ_i HV(A_i), and (c) hand-derived tiny cases.
"""

from __future__ import annotations

import random

import pytest

from rangebar_patterns_spark.operators.stability import (
    attainment_levels,
    hypervolume_3d,
    vorob_stability,
)

REF = (0.0, 0.0, 0.0)


def _voxel_hv(points, lo=-6, ref=REF):
    """Brute-force unit-voxel count of ∪ [p, ref] for integer points."""
    n = 0
    for x in range(lo, 0):
        for y in range(lo, 0):
            for z in range(lo, 0):
                # voxel [x, x+1]×[y, y+1]×[z, z+1] lies inside some [p, ref]
                if any(
                    p[0] <= x and p[1] <= y and p[2] <= z and ref >= (x + 1, y + 1, z + 1)
                    for p in points
                ):
                    n += 1
    return float(n)


def _rand_points(rng, n, lo=-6):
    return [
        (rng.randint(lo, -1), rng.randint(lo, -1), rng.randint(lo, -1))
        for _ in range(n)
    ]


def test_hv_single_box():
    assert hypervolume_3d([(-2.0, -3.0, -1.0)], REF) == pytest.approx(6.0)


def test_hv_dominated_point_adds_nothing():
    base = hypervolume_3d([(-2.0, -2.0, -2.0)], REF)
    assert hypervolume_3d([(-2.0, -2.0, -2.0), (-1.0, -1.0, -1.0)], REF) == pytest.approx(base)


def test_hv_beyond_ref_discarded():
    assert hypervolume_3d([(-1.0, -1.0, 1.0)], REF) == 0.0


def test_hv_matches_voxel_count():
    rng = random.Random(42)
    for _ in range(25):
        pts = _rand_points(rng, rng.randint(1, 8))
        assert hypervolume_3d(pts, REF) == pytest.approx(_voxel_hv(pts)), pts


def test_attainment_sum_identity():
    # Σ_k HV(L_k) == Σ_i HV(A_i): every attained voxel counts once per
    # fold attaining it on the left (level sets are nested) and on the
    # right directly.
    rng = random.Random(7)
    for _ in range(10):
        folds = [_rand_points(rng, rng.randint(1, 5)) for _ in range(rng.randint(2, 5))]
        levels = attainment_levels(folds)
        lhs = sum(hypervolume_3d(lv, REF) for lv in levels)
        rhs = sum(hypervolume_3d(f, REF) for f in folds)
        assert lhs == pytest.approx(rhs), folds


def test_attainment_levels_nested():
    rng = random.Random(11)
    folds = [_rand_points(rng, 4) for _ in range(4)]
    levels = attainment_levels(folds)
    hvs = [hypervolume_3d(lv, REF) for lv in levels]
    assert hvs == sorted(hvs, reverse=True)
    # L_1 is the union, L_n the intersection
    assert hvs[0] >= max(hypervolume_3d(f, REF) for f in folds)
    assert hvs[-1] <= min(hypervolume_3d(f, REF) for f in folds)


def test_vorob_identical_folds_zero_deviation():
    # benefit rows (fold_id, omega, rachev, total_return), 3 equal folds
    rows = [(f, 2.0, 1.5, 0.1) for f in range(3)]
    out = vorob_stability(rows)
    assert out["vorob_deviation"] == pytest.approx(0.0)
    assert out["vorob_threshold"] == pytest.approx(1.0)
    assert out["avg_hyp"] == pytest.approx(2.0 * 1.5 * 0.1)
    assert out["hv_cv"] == pytest.approx(0.0)


def test_vorob_hand_case_two_folds():
    # fold 0 attains a 2×2×2 box (HV 8), fold 1 a 1×1×1 box nested inside
    # (HV 1).  avg = 4.5; L_1 = union (HV 8), L_2 = intersection (HV 1)
    # -> k* = 1, Q = the big box; VD = mean(|QΔA_0|, |QΔA_1|) = (0 + 7)/2.
    rows = [(0, 2.0, 2.0, 2.0), (1, 1.0, 1.0, 1.0)]
    out = vorob_stability(rows)
    assert out["avg_hyp"] == pytest.approx(4.5)
    assert out["vorob_threshold"] == pytest.approx(0.5)
    assert out["vorob_deviation"] == pytest.approx(3.5)
    assert out["hv_per_fold"] == pytest.approx([8.0, 1.0])


def test_vorob_nan_rows_dropped():
    rows = [(0, 2.0, 2.0, 2.0), (0, float("nan"), 1.0, 1.0), (1, 2.0, 2.0, 2.0)]
    out = vorob_stability(rows)
    assert out["hv_per_fold"] == pytest.approx([8.0, 8.0])
    assert out["vorob_deviation"] == pytest.approx(0.0)
