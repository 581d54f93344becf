"""E12 signal temporal regularity (reference eval/signal_regularity.py:26-116).

Per config: Gaussian-KDE the signal timestamps (Scott/4 bandwidth), find
density peaks (prominence >= 10% of max density), and report the CV of
inter-peak distances, the raw inter-arrival CV, and 20-bin temporal
coverage.

The reference uses ``scipy.stats.gaussian_kde`` + ``scipy.signal.
find_peaks``; scipy is unavailable here, and more importantly a scipy call
per config would put Python on the hot path.  This implementation expresses
the *same math* as Catalyst array expressions — density evaluated on the
same grid (``min(1000, max(200, 2n))`` points), peaks as strict local
maxima with the scipy prominence definition (min of the valley floors
toward the nearest higher sample on each side, toward the array edge when
none) — so the whole operator is JVM-side and engine-exact against the
DuckDB twin.  The only transcendental is ``exp``; densities are rounded to
9 decimals before any comparison so libm ulp differences between engines
cannot flip a peak decision.

Scott bandwidth for d=1: factor = n^(-1/5); the reference divides by 4
(signal_regularity.py:57-59) and the kernel width is
``factor * std(ts_norm, ddof=1)`` (gaussian_kde covariance convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KEYS = ["symbol", "barrier_id"]

MIN_TRADES_REGULARITY = 10  # reference config.py:60
PROMINENCE_FRAC = 0.10
N_COVERAGE_BINS = 20
BW_SCALE = 0.25  # Scott/4
SQRT_2PI = 2.5066282746310002


def _fold(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def signal_regularity(trades: DataFrame, keys: list[str] | None = None) -> DataFrame:
    g = keys or KEYS
    t = trades.groupBy(*g).agg(
        F.sort_array(F.collect_list(F.col("signal_ts_ms").cast("double"))).alias("_ts"),
        F.count("*").cast("long").alias("n_trades"),
    )
    n = F.col("n_trades")
    nd = n.cast("double")
    ts = F.col("_ts")
    rng = F.element_at(ts, F.size(ts)) - F.element_at(ts, 1)
    ok = (n >= MIN_TRADES_REGULARITY) & (rng > 0)
    t = t.withColumn("_ok", ok).withColumn("_rng", rng)

    # raw inter-arrival CV: population std / mean of diffs (np.std ddof=0).
    # Guard: Spark's sequence(1, 0) is a *descending* sequence, so the
    # diff construction must be gated on n >= 2 (DuckDB's generate_series
    # is naturally empty there).
    iats = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), (n - F.lit(1)).cast("int")),
            lambda i: F.element_at(ts, i + F.lit(1)) - F.element_at(ts, i),
        ),
    ).otherwise(F.array().cast("array<double>"))
    kd = (nd - F.lit(1.0))
    i1 = _fold(iats) / kd
    i2 = _fold(F.transform(iats, lambda x: x * x)) / kd
    iat_cv = F.when(
        i1 > 0, F.sqrt(F.greatest(i2 - i1 * i1, F.lit(0.0))) / i1
    )

    # normalized timestamps and kernel width
    tsn = F.transform(ts, lambda x: (x - F.element_at(ts, 1)) / F.col("_rng"))
    t = t.withColumn("_tsn", tsn)
    tsn = F.col("_tsn")
    s1 = _fold(tsn)
    s2 = _fold(F.transform(tsn, lambda x: x * x))
    std1 = F.sqrt(
        F.greatest(s2 - s1 * s1 / nd, F.lit(0.0)) / (nd - F.lit(1.0))
    )
    factor = F.pow(nd, F.lit(-0.2)) * F.lit(BW_SCALE)
    h = factor * std1
    t = t.withColumn("_h", h).withColumn("_factor", factor)

    # KDE density on the grid, rounded to 9 dp (see module docstring)
    n_grid = F.least(F.lit(1000), F.greatest(F.lit(200), (n * 2).cast("int")))
    t = t.withColumn("_ng", n_grid)
    ng = F.col("_ng")
    gridpos = lambda j: (j - F.lit(1)).cast("double") / (ng - F.lit(1)).cast("double")  # noqa: E731
    hcol = F.col("_h")
    dens = F.transform(
        F.sequence(F.lit(1), ng),
        lambda j: F.round(
            _fold(
                F.transform(
                    F.col("_tsn"),
                    lambda x: F.exp(
                        ((gridpos(j) - x) / hcol) * ((gridpos(j) - x) / hcol) * F.lit(-0.5)
                    ),
                )
            )
            / (F.col("n_trades").cast("double") * hcol * F.lit(SQRT_2PI)),
            9,
        ),
    )
    t = t.withColumn("_d", F.when(F.col("_ok") & (hcol > 0), dens))
    d = F.col("_d")

    # strict local maxima, then the scipy prominence filter
    cand = F.filter(
        F.sequence(F.lit(2), ng - F.lit(1)),
        lambda j: (F.element_at(d, j) > F.element_at(d, j - F.lit(1)))
        & (F.element_at(d, j) > F.element_at(d, j + F.lit(1))),
    )
    dmax = F.array_max(d)

    def _prom(j: Column) -> Column:
        dj = F.element_at(d, j)
        lhi = F.coalesce(
            F.array_max(F.filter(F.sequence(F.lit(1), j - F.lit(1)), lambda i: F.element_at(d, i) > dj)),
            F.lit(0),
        )
        lmin = F.array_min(F.slice(d, lhi + F.lit(1), j - F.lit(1) - lhi))
        rhi = F.coalesce(
            F.array_min(F.filter(F.sequence(j + F.lit(1), ng), lambda i: F.element_at(d, i) > dj)),
            ng + F.lit(1),
        )
        rmin = F.array_min(F.slice(d, j + F.lit(1), rhi - F.lit(1) - j))
        return dj - F.greatest(lmin, rmin)

    peaks = F.filter(cand, lambda j: _prom(j) >= F.lit(PROMINENCE_FRAC) * dmax)
    t = t.withColumn("_pk", peaks)
    pk = F.col("_pk")
    n_peaks = F.size(pk)
    ppos = F.transform(pk, lambda j: (j - F.lit(1)).cast("double") / (ng - F.lit(1)).cast("double"))
    ipd = F.when(
        n_peaks >= 2,
        F.transform(
            F.sequence(F.lit(1), (n_peaks - F.lit(1)).cast("int")),
            lambda i: F.element_at(ppos, i + F.lit(1)) - F.element_at(ppos, i),
        ),
    ).otherwise(F.array().cast("array<double>"))
    kp = (n_peaks - F.lit(1)).cast("double")
    p1 = _fold(ipd) / kp
    p2 = _fold(F.transform(ipd, lambda x: x * x)) / kp
    peak_cv = F.when(
        (n_peaks >= 2) & (p1 > 0),
        F.sqrt(F.greatest(p2 - p1 * p1, F.lit(0.0))) / p1,
    )

    # 20-bin temporal coverage over the raw timestamp span (np.histogram:
    # right edge closed on the last bin)
    bins = F.transform(
        ts,
        lambda x: F.least(
            F.lit(N_COVERAGE_BINS - 1),
            F.floor(
                (x - F.element_at(ts, 1)) / F.col("_rng") * F.lit(N_COVERAGE_BINS)
            ).cast("int"),
        ),
    )
    coverage = F.size(F.array_distinct(bins)).cast("double") / F.lit(
        float(N_COVERAGE_BINS)
    )

    okc = F.col("_ok")
    return t.select(
        *g,
        F.col("n_trades"),
        F.round(F.when(okc, peak_cv), 6).alias("kde_peak_cv"),
        F.when(okc, n_peaks.cast("long")).alias("n_peaks"),
        F.round(F.when(okc, iat_cv), 6).alias("raw_iat_cv"),
        F.round(F.when(okc, coverage), 4).alias("temporal_coverage"),
        F.round(F.when(okc, F.col("_factor")), 6).alias("kde_bandwidth"),
    )
