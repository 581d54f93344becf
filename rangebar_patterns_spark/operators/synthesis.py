"""Cross-metric synthesis operators (SURVEY.md §2.10 E10/E14): Romano–Wolf
max-t FWER control and the Spearman rank-correlation matrix of metric
rankings.

Reference: eval/synthesis.py:61-117 (``romano_wolf_stepdown``: bootstrap
max-t, B=1000, centered resampling, critical value = 95th percentile of the
bootstrap max-t distribution) and synthesis.py:119-215
(``cross_metric_comparison``: pairwise Spearman rho between metric
rankings).

Determinism: the reference draws bootstrap indices from
``np.random.default_rng(42)`` — not reproducible outside numpy.  We keep the
*procedure* (centered resampling, studentized t, max-t critical value) but
generate resample indices with an explicit integer LCG evaluated identically
in Spark and the DuckDB oracle, so the whole operator is engine-exact.
Spearman ranks use average-tie ranks held in *doubled-integer* form
(2·rank + ties − 1), making every sum integer-exact and association-order
free — no deterministic-fold machinery needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KEYS = ["symbol", "barrier_id"]

RW_ALPHA = 0.05
RW_MIN_TRADES = 10  # synthesis.py:70 n_trades >= 10
RW_B = 1000  # reference depth (eval/synthesis.py:23 n_bootstrap=1000)

# LCG mixing constants (Knuth multiplicative + small primes for the axes)
_LCG_B = 1_000_003
_LCG_I = 7_919
_LCG_K = 104_729
_LCG_MUL = 2_654_435_761
_LCG_MOD = 2_147_483_648  # 2^31


def _lcg_idx(b: Column, i: Column, k: Column, n: Column) -> Column:
    """Deterministic pseudo-random 1-based index into an n-vector.

    All-integer arithmetic (max intermediate < 2^63), identical in the
    DuckDB twin (:data:`plans.synthesis_oracle`)."""
    seed = (
        b.cast("long") * F.lit(_LCG_B)
        + i.cast("long") * F.lit(_LCG_I)
        + k.cast("long") * F.lit(_LCG_K)
    )
    x = F.pmod(seed * F.lit(_LCG_MUL), F.lit(_LCG_MOD))
    return F.pmod(x, n.cast("long")) + F.lit(1)


def _fold(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def romano_wolf(
    trades: DataFrame,
    n_bootstrap: int = RW_B,
    keys: list[str] | None = None,
) -> DataFrame:
    """Single-step Romano–Wolf max-t (synthesis.py:61-117 — despite the
    step-down name the reference computes one max-t critical value).

    Per config: t = mean/se (se = std(ddof=1)/sqrt(n), t=0 when se=0).
    Bootstrap: B resamples of the *centered* return vector via the LCG;
    critical value = type-7 95th percentile of per-resample max-t.
    """
    g = keys or KEYS
    r = F.col("return_pct")
    # per-config return vector ordered by signal time (collect order must
    # match the oracle's list(... ORDER BY signal_ts_ms) exactly)
    vecs = (
        trades.groupBy(*g)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("signal_ts_ms").alias("o"), r.alias("v")))
                ),
                lambda s: s["v"],
            ).alias("_rs")
        )
        .withColumn("_n", F.size("_rs").cast("long"))
        .filter(F.col("_n") >= RW_MIN_TRADES)
    )
    # stable integer config id for the LCG's k-axis: rank in key order
    wk = Window.orderBy(*[F.col(c) for c in g])
    vecs = vecs.withColumn("_k", F.row_number().over(wk).cast("long"))
    nd = F.col("_n").cast("double")
    s1 = _fold(F.col("_rs"))
    s2 = _fold(F.transform(F.col("_rs"), lambda x: x * x))
    mean = s1 / nd
    var1 = F.greatest(s2 - s1 * s1 / nd, F.lit(0.0)) / (nd - F.lit(1.0))
    se = F.sqrt(var1) / F.sqrt(nd)
    t_obs = F.when(se > 0, mean / se).otherwise(F.lit(0.0))
    vecs = (
        vecs.withColumn("_mean", mean)
        .withColumn("_t_obs", t_obs)
        .withColumn("_centered", F.transform(F.col("_rs"), lambda x: x - F.col("_mean")))
    )
    # B resamples per config: one row per (config, b), the resampled vector
    # built by LCG-indexing into the centered vector
    boots = vecs.select(
        *g, "_k", "_n", "_centered", F.explode(F.sequence(F.lit(1), F.lit(n_bootstrap))).alias("_b")
    )
    picked = F.transform(
        F.sequence(F.lit(1), F.col("_n").cast("int")),
        lambda i: F.element_at(
            F.col("_centered"),
            _lcg_idx(F.col("_b"), i, F.col("_k"), F.col("_n")).cast("int"),
        ),
    )
    boots = boots.withColumn("_bs", picked)
    b1 = _fold(F.col("_bs"))
    b2 = _fold(F.transform(F.col("_bs"), lambda x: x * x))
    bnd = F.col("_n").cast("double")
    bmean = b1 / bnd
    bvar1 = F.greatest(b2 - b1 * b1 / bnd, F.lit(0.0)) / (bnd - F.lit(1.0))
    bse = F.sqrt(bvar1) / F.sqrt(bnd)
    bt = F.when(bse > 0, bmean / bse).otherwise(F.lit(0.0))
    max_t = boots.withColumn("_bt", bt).groupBy("_b").agg(F.max("_bt").alias("_max_t"))
    # type-7 (numpy default) 95th percentile of the B max-t values
    p = 1.0 - RW_ALPHA
    sorted_mt = F.sort_array(F.collect_list("_max_t"))
    nB = F.size(sorted_mt)
    h = (nB - F.lit(1)).cast("double") * F.lit(p) + F.lit(1.0)
    kq = F.floor(h).cast("int")
    frac = h - F.floor(h)
    crit = (
        F.when(nB == 0, F.lit(None).cast("double"))
        .when(kq >= nB, F.element_at(sorted_mt, nB))
        .otherwise(
            F.element_at(sorted_mt, kq)
            + frac * (F.element_at(sorted_mt, kq + F.lit(1)) - F.element_at(sorted_mt, kq))
        )
    )
    critical = max_t.agg(crit.alias("_critical"))
    out = vecs.crossJoin(F.broadcast(critical))
    return out.select(
        *g,
        F.col("_n").alias("n_trades"),
        F.round(F.col("_t_obs"), 4).alias("t_stat"),
        F.round(F.col("_critical"), 4).alias("critical_value"),
        (F.col("_t_obs") > F.col("_critical")).alias("is_discovery"),
        F.lit(n_bootstrap).cast("long").alias("n_bootstrap"),
    )


def spearman_matrix(
    metrics: DataFrame,
    metric_cols: list[str],
    keys: list[str] | None = None,
) -> DataFrame:
    """E14 pairwise Spearman rho between metric rankings
    (synthesis.py:119-215 ``cross_metric_comparison``).

    Per unordered pair (a, b): drop configs where either metric is NULL,
    average-tie-rank both metrics over the remaining configs, Pearson on the
    ranks.  Ranks are carried as ``2·rank + ties − 1`` (doubled average
    ranks → integers), so every aggregate is an exact integer sum and the
    result is engine- and order-exact; metrics are rounded to 6 decimals
    first (cross-engine ranking convention, plans/catalog.py).
    """
    g = keys or KEYS
    rounded = metrics.select(
        *g, *[F.round(F.col(c), 6).alias(c) for c in metric_cols]
    )
    pieces: list[DataFrame] = []
    for ai in range(len(metric_cols)):
        for bi in range(ai + 1, len(metric_cols)):
            a, b = metric_cols[ai], metric_cols[bi]
            sub = rounded.filter(F.col(a).isNotNull() & F.col(b).isNotNull())

            def dr2(c: str) -> Column:
                rk = F.rank().over(Window.orderBy(F.col(c)))
                ties = F.count("*").over(Window.partitionBy(F.col(c)))
                return (F.lit(2) * rk + ties - F.lit(1)).cast("long")

            ranked = sub.select(dr2(a).alias("_ra"), dr2(b).alias("_rb"))
            n = F.count("*").cast("long")
            sx, sy = F.sum("_ra"), F.sum("_rb")
            sxy = F.sum(F.col("_ra") * F.col("_rb"))
            sxx = F.sum(F.col("_ra") * F.col("_ra"))
            syy = F.sum(F.col("_rb") * F.col("_rb"))
            num = (n * sxy - sx * sy).cast("double")
            den = F.sqrt((n * sxx - sx * sx).cast("double")) * F.sqrt(
                (n * syy - sy * sy).cast("double")
            )
            pieces.append(
                ranked.agg(
                    F.lit(a).alias("metric_a"),
                    F.lit(b).alias("metric_b"),
                    n.alias("n_configs"),
                    F.round(num / F.nullif(den, F.lit(0.0)), 6).alias("spearman_rho"),
                )
            )
    out = pieces[0]
    for p_ in pieces[1:]:
        out = out.unionByName(p_)
    return out


def _round6_half_up(x):
    """Exact twin of Spark's ``F.round(col, 6)`` over DoubleType: Spark
    routes the double through its shortest decimal representation
    (Scala ``BigDecimal.decimal`` == ``Double.toString``) and rounds
    HALF_UP; ``repr`` of a Python float is the same shortest form.
    Property-pinned against F.round in tests/test_knee_driver.py."""
    if x is None or x != x or x in (float("inf"), float("-inf")):
        return x
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def knee_points(
    metrics: DataFrame,
    metric_cols: list[str],
    keys: list[str] | None = None,
) -> DataFrame:
    """E17 knee detection (ranking.py:390-472): tradeoff-outlier analysis
    on the Pareto front.

    Reference semantics (Deb & Gupta 2010 via pymoo): flip benefit metrics
    to minimization, normalize per column to [0,1], per-point tradeoff
    mu_i = min over neighbors of sacrifice/gain, knees = points with
    mu >= mean + 2*std.  pymoo's epsilon-radius neighborhood is replaced by
    the all-points neighborhood (epsilon = inf) — exact for the
    driver-scale fronts the reference feeds this (<= hundreds of
    candidates), deterministic, and SQL-expressible; pairs with gain = 0
    are excluded from the min (numpy's inf/nan tradeoffs never win the
    nanmin unless all are invalid).  Restricted to the Pareto front
    (dominated points get on_front = false and no mu).  All metric_cols
    are treated as benefit (higher = better), pre-rounded to 6 decimals
    (cross-engine ranking convention).

    Execution: the candidate matrix is config-grain — its size is set by
    the grid, never the data — so, exactly like the reference
    (eval/ranking.py:390-470 runs this step in the driver process on the
    collected metric matrix), the final knee step collects the matrix and
    evaluates the all-pairs math driver-side.  The former all-Spark plan
    spent ~6-8 s of pure per-plan/interpreted-HOF overhead on a 90-row
    result at ANY scale factor; this path is ~0.1 s and bit-identical
    (same expression forms, same key-sorted summation order, HALF_UP
    shortest-repr rounding — fuzz-pinned against
    :func:`knee_points_distributed`, which remains the spill-over path
    for fronts too large to collect)."""
    g = keys or KEYS
    spark = metrics.sparkSession
    collected = metrics.select(*g, *metric_cols).collect()
    pts = []
    for r in collected:
        vals = [_round6_half_up(r[c]) for c in metric_cols]
        if any(v is not None and v != v for v in vals):
            # a NaN metric would need Spark SQL's NaN ordering (NaN ==
            # NaN, NaN greater than every number) replicated through the
            # whole dominance/min/max chain — route through the
            # distributed twin, which evaluates with exactly those
            # semantics.  Real metric layers emit NULL (nullif guards),
            # never NaN, so this path is a correctness backstop.
            return knee_points_distributed(metrics, metric_cols, keys)
        if any(v is None for v in vals):
            continue
        pts.append((tuple(r[k] for k in g), vals))
    # key order: deterministic output AND the threshold fold's sort order
    pts.sort(key=lambda t: t[0])
    m = len(metric_cols)

    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        StructField,
        StructType,
    )

    key_fields = [metrics.schema[k] for k in g]
    schema = StructType(
        [StructField(f.name, f.dataType, f.nullable) for f in key_fields]
        + [
            StructField("on_front", BooleanType(), False),
            StructField("tradeoff_mu", DoubleType(), True),
            StructField("is_knee", BooleanType(), True),
        ]
    )
    n = len(pts)
    if n < 2:  # the pair relation is empty — same contract as the join
        return spark.createDataFrame([], schema)

    # per-column [0,1] normalization over the flipped (minimized) range
    hi = [max(p[1][j] for p in pts) for j in range(m)]
    lo = [min(p[1][j] for p in pts) for j in range(m)]
    rng = [hi[j] - lo[j] for j in range(m)]
    norm = [
        [((hi[j] - p[1][j]) / rng[j]) if rng[j] > 0 else 0.0 for j in range(m)]
        for p in pts
    ]

    on_front = [True] * n
    mu: list[float | None] = [None] * n
    for i in range(n):
        a = norm[i]
        best = None
        for k2 in range(n):
            if k2 == i:
                continue
            b = norm[k2]
            dom_le = True
            dom_lt = False
            sac = 0.0
            gain = 0.0
            for j in range(m):
                d = b[j] - a[j]
                if d > 0.0:
                    sac += d
                else:
                    dom_lt = dom_lt or d < 0.0
                    gain += -d
                dom_le = dom_le and d <= 0.0
            if dom_le and dom_lt:
                on_front[i] = False
            if gain > 0.0:
                tr = sac / gain
                if best is None or tr < best:
                    best = tr
        mu[i] = best

    # outlier threshold over front mus: mean + 2*std (population), folded
    # in key-sorted order (pts is key-sorted already)
    mus = [mu[i] for i in range(n) if on_front[i] and mu[i] is not None]
    if mus:
        s1 = 0.0
        for x in mus:
            s1 += x
        s2 = 0.0
        for x in mus:
            s2 += x * x
        nn = float(len(mus))
        mean = s1 / nn
        var = s2 / nn - mean * mean
        import math

        thresh = mean + 2.0 * math.sqrt(var if var > 0.0 else 0.0)
    else:
        thresh = float("nan")  # comparisons below stay False, as in Spark

    rows = [
        (
            *pts[i][0],
            on_front[i],
            _round6_half_up(mu[i]),
            bool(on_front[i] and mu[i] is not None and mu[i] >= thresh),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, schema)


def knee_points_distributed(
    metrics: DataFrame,
    metric_cols: list[str],
    keys: list[str] | None = None,
) -> DataFrame:
    """Distributed (all-pairs self-join) twin of :func:`knee_points` for
    fronts too large to collect — the O(n^2) pair relation is spread
    across partitions instead of one driver.  Arithmetic is identical;
    equivalence is fuzz-pinned in tests/test_knee_driver.py.

    Reference semantics (Deb & Gupta 2010 via pymoo): flip benefit metrics
    to minimization, normalize per column to [0,1], per-point tradeoff
    mu_i = min over neighbors of sacrifice/gain, knees = points with
    mu >= mean + 2*std.  pymoo's epsilon-radius neighborhood is replaced by
    the all-points neighborhood (epsilon = inf) — exact for the
    driver-scale fronts the reference feeds this (<= hundreds of
    candidates), deterministic, and SQL-expressible; pairs with gain = 0
    are excluded from the min (numpy's inf/nan tradeoffs never win the
    nanmin unless all are invalid).  Restricted to the Pareto front
    (dominated points get on_front = false and no mu).  All metric_cols
    are treated as benefit (higher = better), pre-rounded to 6 decimals
    (cross-engine ranking convention)."""
    g = keys or KEYS
    m = metrics.select(*g, *[F.round(F.col(c), 6).alias(c) for c in metric_cols])
    for c in metric_cols:
        m = m.filter(F.col(c).isNotNull())
    # flip to minimization + per-column [0,1] normalization
    bounds = m.agg(
        *[F.max(c).alias(f"_hi_{c}") for c in metric_cols],
        *[F.min(c).alias(f"_lo_{c}") for c in metric_cols],
    )
    m = m.crossJoin(F.broadcast(bounds))
    for c in metric_cols:
        rngc = F.col(f"_hi_{c}") - F.col(f"_lo_{c}")
        # minimized = -metric; normalized over the flipped range
        m = m.withColumn(
            f"_v_{c}",
            F.when(rngc > 0, (F.col(f"_hi_{c}") - F.col(c)) / rngc).otherwise(
                F.lit(0.0)
            ),
        )
    a = m.select(*g, *[F.col(f"_v_{c}").alias(f"_a_{c}") for c in metric_cols])
    b = m.select(
        *[F.col(k).alias(f"_b_{k}") for k in g],
        *[F.col(f"_v_{c}").alias(f"_bv_{c}") for c in metric_cols],
    )
    neq = None
    for k in g:
        cnd = F.col(k) != F.col(f"_b_{k}")
        neq = cnd if neq is None else (neq | cnd)
    pairs = a.join(b, neq)
    # dominance: b <= a in every minimized dim, < in at least one
    dom_le = None
    dom_lt = None
    for c in metric_cols:
        le = F.col(f"_bv_{c}") <= F.col(f"_a_{c}")
        lt = F.col(f"_bv_{c}") < F.col(f"_a_{c}")
        dom_le = le if dom_le is None else (dom_le & le)
        dom_lt = lt if dom_lt is None else (dom_lt | lt)
    dominated = F.max(F.when(dom_le & dom_lt, 1).otherwise(0))
    # tradeoff vs each neighbor: sacrifice = sum max(0, b-a), gain = sum max(0, a-b)
    sac = None
    gain = None
    for c in metric_cols:
        d = F.col(f"_bv_{c}") - F.col(f"_a_{c}")
        s_ = F.greatest(d, F.lit(0.0))
        g_ = F.greatest(-d, F.lit(0.0))
        sac = s_ if sac is None else (sac + s_)
        gain = g_ if gain is None else (gain + g_)
    tr = F.when(gain > 0, sac / gain)
    per_pt = pairs.groupBy(*g).agg(
        dominated.alias("_dominated"),
        F.min(tr).alias("_mu"),
    )
    front = per_pt.withColumn("on_front", F.col("_dominated") == 0)
    # outlier threshold over front mus: mean + 2*std (population, numpy
    # default), deterministic fold in key order
    mus = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("on_front") & F.col("_mu").isNotNull(),
                    F.struct(*[F.col(c) for c in g], F.col("_mu").alias("m")),
                )
            )
        ),
        lambda s: s["m"],
    )
    nn = F.size(mus).cast("double")
    s1 = F.aggregate(mus, F.lit(0.0), lambda acc, x: acc + x)
    s2 = F.aggregate(
        F.transform(mus, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )
    mean = s1 / nn
    std = F.sqrt(F.greatest(s2 / nn - mean * mean, F.lit(0.0)))
    thresh = front.agg((mean + F.lit(2.0) * std).alias("_thresh"))
    out = front.crossJoin(F.broadcast(thresh))
    return out.select(
        *g,
        F.col("on_front"),
        F.round(F.col("_mu"), 6).alias("tradeoff_mu"),
        (
            F.col("on_front")
            & F.col("_mu").isNotNull()
            & (F.col("_mu") >= F.col("_thresh"))
        ).alias("is_knee"),
    )


BCA_ALPHA = 0.05
BCA_B = 200  # catalog default; reference uses 10,000 (configurable)
BCA_MIN_TRADES = 10  # walk_forward.py:549 degenerate below this


BCA_ALPHA = 0.05
BCA_B = 200  # catalog default; reference uses 10,000 (configurable)
BCA_MIN_TRADES = 10  # walk_forward.py:549 degenerate below this
OMEGA_CI_REJECT = 1.0  # Stage-3 gate: reject if omega CI low < 1.0


def bca_omega_ci(
    trades: DataFrame,
    n_bootstrap: int = BCA_B,
    keys: list[str] | None = None,
) -> DataFrame:
    """E21 BCa bootstrap CI on Omega(0) (walk_forward.py:507-709 Stage 3):
    bias-corrected accelerated interval over bootstrap replicates, with the
    reference's rejection gate (omega_ci_low < 1.0).

    The reference uses ``arch`` IID/MBB resampling with seed 42 — replaced
    by the same deterministic LCG as :func:`romano_wolf` so both engines
    draw identical resamples (IID variant; the MBB twin lives in
    operators/wfo.py).  z0 from the fraction of replicates below the point
    estimate (clamped to (0,1)); acceleration from the jackknife, which for
    Omega is O(1) per leave-one-out given the gain/loss totals; interval
    endpoints are type-7 quantiles of the replicate distribution at the
    BCa-adjusted levels.  n < 10 degenerates to a point interval
    (reference "degenerate" method)."""
    from ..functions.stats import norm_cdf_col, norm_ppf_col, python_norm_ppf

    g = keys or KEYS
    r = F.col("return_pct")
    vecs = (
        trades.groupBy(*g)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("signal_ts_ms").alias("o"), r.alias("v")))
                ),
                lambda s: s["v"],
            ).alias("_rs")
        )
        .withColumn("_n", F.size("_rs").cast("long"))
    )
    wk = Window.orderBy(*[F.col(c) for c in g])
    vecs = vecs.withColumn("_k", F.row_number().over(wk).cast("long"))
    gains = _fold(F.transform(F.col("_rs"), lambda x: F.greatest(x, F.lit(0.0))))
    losses = _fold(F.transform(F.col("_rs"), lambda x: F.greatest(-x, F.lit(0.0))))
    vecs = (
        vecs.withColumn("_gains", gains)
        .withColumn("_losses", losses)
        .withColumn("_omega", F.col("_gains") / F.nullif(F.col("_losses"), F.lit(0.0)))
    )
    # jackknife: LOO omega from totals; acceleration a
    loo = F.transform(
        F.col("_rs"),
        lambda x: (F.col("_gains") - F.greatest(x, F.lit(0.0)))
        / F.nullif(F.col("_losses") - F.greatest(-x, F.lit(0.0)), F.lit(0.0)),
    )
    # NB: every stage lands in a named column — re-inlining these Column
    # trees (folds nested in transforms nested in folds) makes Catalyst
    # analysis super-linear; the un-checkpointed form took 146 s to *plan*
    vecs = vecs.withColumn("_loo", F.filter(loo, lambda v: v.isNotNull()))
    nl = F.size(F.col("_loo")).cast("double")
    vecs = vecs.withColumn(
        "_loo_mean", _fold(F.col("_loo")) / F.nullif(nl, F.lit(0.0))
    )
    lm = F.col("_loo_mean")
    vecs = vecs.withColumn(
        "_d2", _fold(F.transform(F.col("_loo"), lambda v: (lm - v) * (lm - v)))
    ).withColumn(
        "_d3",
        _fold(F.transform(F.col("_loo"), lambda v: (lm - v) * (lm - v) * (lm - v))),
    )
    accel = F.col("_d3") / F.nullif(
        F.lit(6.0) * F.pow(F.col("_d2"), F.lit(1.5)), F.lit(0.0)
    )
    vecs = vecs.withColumn("_a", F.coalesce(accel, F.lit(0.0)))
    # bootstrap replicates via the shared LCG
    boots = vecs.select(
        *g, "_k", "_n", "_rs",
        F.explode(F.sequence(F.lit(1), F.lit(n_bootstrap))).alias("_b"),
    )
    picked = F.transform(
        F.sequence(F.lit(1), F.col("_n").cast("int")),
        lambda i: F.element_at(
            F.col("_rs"), _lcg_idx(F.col("_b"), i, F.col("_k"), F.col("_n")).cast("int")
        ),
    )
    boots = boots.withColumn("_bsv", picked)
    bg = _fold(F.transform(F.col("_bsv"), lambda x: F.greatest(x, F.lit(0.0))))
    bl = _fold(F.transform(F.col("_bsv"), lambda x: F.greatest(-x, F.lit(0.0))))
    boots = boots.withColumn("_bo", bg / F.nullif(bl, F.lit(0.0)))
    stats = boots.groupBy(*g).agg(
        F.sort_array(
            F.collect_list(F.when(F.col("_bo").isNotNull(), F.col("_bo")))
        ).alias("_bos")
    )
    j = vecs.join(stats, g)
    beff = F.size(F.col("_bos")).cast("double")
    frac = (
        F.size(F.filter(F.col("_bos"), lambda v: v < F.col("_omega"))).cast("double")
        + F.lit(0.5)
    ) / (beff + F.lit(1.0))
    j = j.withColumn("_z0", norm_ppf_col(frac))
    z0 = F.col("_z0")
    za_lo = F.lit(python_norm_ppf(BCA_ALPHA / 2.0))
    za_hi = -za_lo
    a_ = F.col("_a")
    j = j.withColumn(
        "_p_lo", norm_cdf_col(z0 + (z0 + za_lo) / (F.lit(1.0) - a_ * (z0 + za_lo)))
    ).withColumn(
        "_p_hi", norm_cdf_col(z0 + (z0 + za_hi) / (F.lit(1.0) - a_ * (z0 + za_hi)))
    )

    def _q7_h(pcol):
        return (F.size(F.col("_bos")) - F.lit(1)).cast("double") * pcol + F.lit(1.0)

    j = j.withColumn("_h_lo", _q7_h(F.col("_p_lo"))).withColumn(
        "_h_hi", _q7_h(F.col("_p_hi"))
    )

    def _q7(hname):
        parr = F.col("_bos")
        h = F.col(hname)
        nq = F.size(parr)
        kq = F.floor(h).cast("int")
        fr = h - F.floor(h)
        return (
            F.when(nq == 0, F.lit(None).cast("double"))
            .when(kq >= nq, F.element_at(parr, nq))
            .otherwise(
                F.element_at(parr, kq)
                + fr * (F.element_at(parr, kq + F.lit(1)) - F.element_at(parr, kq))
            )
        )

    ci_lo = _q7("_h_lo")
    ci_hi = _q7("_h_hi")
    degen = F.col("_n") < BCA_MIN_TRADES
    out_lo = F.when(degen, F.col("_omega")).otherwise(ci_lo)
    out_hi = F.when(degen, F.col("_omega")).otherwise(ci_hi)
    return j.select(
        *g,
        F.col("_n").alias("n_trades"),
        F.round(F.col("_omega"), 6).alias("omega"),
        F.round(out_lo, 6).alias("omega_ci_low"),
        F.round(out_hi, 6).alias("omega_ci_high"),
        F.when(degen, F.lit("degenerate")).otherwise(F.lit("bca_iid")).alias("method"),
        (out_lo < OMEGA_CI_REJECT).alias("rejected"),
    )
