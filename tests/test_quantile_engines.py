"""The three quantile implementations (stream two-heap, Catalyst
expression, DuckDB oracle SQL) must agree bit-for-bit — plus a numpy
reference check of the streaming algorithm itself (sorted-slice per row).
"""

from __future__ import annotations

import numpy as np
import pytest

from rangebar_patterns_spark.functions.series_quantile import excl_quantile_stream


def _q6_ref(window: np.ndarray, p: float) -> float:
    s = np.sort(window[~np.isnan(window)])
    n = len(s)
    if n == 0:
        return np.nan
    h = p * (n + 1.0)
    if h <= 1.0:
        return s[0]
    if h >= n:
        return s[-1]
    k = int(h)
    lo = s[k - 1]
    return lo + (h - float(k)) * (s[k] - lo)


@pytest.mark.parametrize("p", [0.5, 0.75, 0.95, 0.99])
@pytest.mark.parametrize("lookback", [None, 1, 7, 50])
def test_stream_matches_bruteforce(p, lookback):
    rng = np.random.default_rng(42)
    vals = rng.normal(size=500)
    vals[rng.random(500) < 0.07] = np.nan  # NULL-skipping path
    vals[rng.integers(0, 500, 40)] = 1.25  # duplicates stress lazy deletion
    got = excl_quantile_stream(vals, p, lookback)
    for i in range(len(vals)):
        lo = 0 if lookback is None else max(0, i - lookback)
        exp = _q6_ref(vals[lo:i], p)
        if np.isnan(exp):
            assert np.isnan(got[i]), i
        else:
            assert got[i] == exp, (i, got[i], exp)


def test_stream_empty_and_allnan():
    assert excl_quantile_stream(np.array([]), 0.95).size == 0
    out = excl_quantile_stream(np.array([np.nan, np.nan, 1.0, 2.0]), 0.5)
    assert np.isnan(out[:3]).all() and out[3] == 1.0


def test_spark_engines_agree(spark):
    """stream (applyInPandas) vs expr (sort_array window) on real bars."""
    from rangebar_patterns_spark.operators.windows import with_bar_features
    from rangebar_patterns_spark.sources.bars import bars_from_events

    bars = bars_from_events(spark, "/root/testdata/sf0.001")
    for rolling in (None, 25):
        a = (
            with_bar_features(bars, p=0.95, rolling_window=rolling, quantile_engine="stream")
            .select("symbol", "rn", "ti_p95_prior")
            .toPandas()
            .sort_values(["symbol", "rn"])
            .reset_index(drop=True)
        )
        b = (
            with_bar_features(bars, p=0.95, rolling_window=rolling, quantile_engine="expr")
            .select("symbol", "rn", "ti_p95_prior")
            .toPandas()
            .sort_values(["symbol", "rn"])
            .reset_index(drop=True)
        )
        na, nb = a.ti_p95_prior.isna(), b.ti_p95_prior.isna()
        assert (na == nb).all()
        assert (a.ti_p95_prior[~na] == b.ti_p95_prior[~nb]).all(), f"rolling={rolling}"


def test_sorted_kernel_matches_two_heap():
    """The bounded-frame sorted-list kernel must be bit-equal to the
    two-heap kernel (same order statistics, same interpolation
    arithmetic) across NaN densities, frame widths, and quantiles —
    including frames wider than the series and duplicate-heavy data."""
    from rangebar_patterns_spark.functions.series_quantile import (
        _excl_quantile_rolling_sorted,
        excl_quantile_stream,
    )

    rng = np.random.default_rng(7)
    for size, nan_rate, lb in [
        (2000, 0.0, 999),
        (500, 0.3, 10),
        (300, 0.05, 1000),   # frame wider than the series
        (1000, 0.1, 1),
    ]:
        vals = rng.normal(size=size)
        vals[rng.random(size) < nan_rate] = np.nan
        dups = rng.integers(0, 5, size=size)
        vals = np.where(dups == 0, np.round(vals, 1), vals)  # duplicates
        for p in (0.05, 0.5, 0.7, 0.95):
            a = _excl_quantile_rolling_sorted(vals, p, lb)
            # force the two-heap path by calling with the dispatch
            # threshold exceeded is not possible per-call; exercise the
            # internals directly instead
            import rangebar_patterns_spark.functions.series_quantile as sq

            orig = sq._SORTED_KERNEL_MAX_LOOKBACK
            sq._SORTED_KERNEL_MAX_LOOKBACK = 0
            try:
                b = excl_quantile_stream(vals, p, lb)
            finally:
                sq._SORTED_KERNEL_MAX_LOOKBACK = orig
            assert np.array_equal(a, b, equal_nan=True), (size, nan_rate, lb, p)


def test_kernel_matches_naive_reference_property():
    """Property check of BOTH kernels against an independent naive
    implementation of the spec: for every row, sort the live frame and
    apply the Hyndman-Fan type-6 formula directly.  Catches algorithmic
    drift (heap/bisect bookkeeping bugs) that the kernel-vs-kernel
    equality test cannot, since that test shares no third opinion."""
    from hypothesis import given, settings, strategies as st

    from rangebar_patterns_spark.functions.series_quantile import (
        _excl_quantile_rolling_sorted,
        excl_quantile_stream,
    )

    def naive(values, p, lookback):
        out = np.full(len(values), np.nan)
        for i in range(len(values)):
            lo = 0 if lookback is None else max(0, i - lookback)
            frame = [v for v in values[lo:i] if not np.isnan(v)]
            n = len(frame)
            if n == 0:
                continue
            s = sorted(frame)
            h = p * (n + 1.0)
            if h <= 1.0:
                out[i] = s[0]
            elif h >= n:
                out[i] = s[-1]
            else:
                k = int(h)
                out[i] = s[k - 1] + (h - float(k)) * (s[k] - s[k - 1])
        return out

    floats = st.one_of(
        st.floats(-1e6, 1e6, allow_nan=False),
        st.just(float("nan")),
        st.integers(-5, 5).map(float),  # force duplicates
    )

    @settings(max_examples=150, deadline=None)
    @given(
        vals=st.lists(floats, min_size=0, max_size=60),
        p=st.sampled_from([0.05, 0.25, 0.5, 0.75, 0.95]),
        lookback=st.one_of(st.none(), st.integers(1, 40)),
    )
    def check(vals, p, lookback):
        arr = np.array(vals, dtype="float64")
        want = naive(arr, p, lookback)
        got = excl_quantile_stream(arr, p, lookback)
        assert np.array_equal(got, want, equal_nan=True)
        if lookback is not None:
            got2 = _excl_quantile_rolling_sorted(arr, p, lookback)
            assert np.array_equal(got2, want, equal_nan=True)

    check()


def test_multi_q_kernel_bit_equal_to_singles():
    """excl_quantile_stream_multi shares one pass of window maintenance
    across its q-list; every output array must be BIT-equal to the
    corresponding single-q stream (same picks, same IEEE interpolation),
    across NaN mixes, frame widths (incl. the two-heap fallback), and
    duplicate-heavy values."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rangebar_patterns_spark.functions.series_quantile import (
        _SORTED_KERNEL_MAX_LOOKBACK,
        excl_quantile_stream,
        excl_quantile_stream_multi,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        vals=st.lists(
            st.one_of(
                st.floats(-100, 100, allow_nan=False),
                st.just(float("nan")),
                st.integers(-3, 3).map(float),  # force duplicates
            ),
            min_size=0,
            max_size=120,
        ),
        ps=st.lists(
            st.floats(0.01, 0.99, allow_nan=False), min_size=1, max_size=4
        ),
        lookback=st.one_of(
            st.none(),
            st.integers(1, 40),
            st.just(_SORTED_KERNEL_MAX_LOOKBACK + 1),  # two-heap fallback
        ),
    )
    def check(vals, ps, lookback):
        arr = np.array(vals, dtype="float64")
        multi = excl_quantile_stream_multi(arr, tuple(ps), lookback)
        assert len(multi) == len(ps)
        for p, got in zip(ps, multi):
            want = excl_quantile_stream(arr, p, lookback)
            assert np.array_equal(got, want, equal_nan=True)

    check()
