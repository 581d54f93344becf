"""Walk-forward / CPCV / bootstrap layer (SURVEY.md §2.10 E18-E25) as
relational plans over the per-trade long format.

The reference drives these from Python (skfolio WalkForward,
CombinatorialPurgedCV, arch MovingBlockBootstrap — eval/walk_forward.py).
Here fold membership is *arithmetic over the per-config trade index* and
split grids are broadcast literal tables, so the whole layer stays inside
Catalyst; the bootstrap uses md5-derived deterministic block starts, which
makes resampling reproducible AND oracle-checkable (a seeded RNG never
is, across engines).

Deviations from the reference, documented: purge/embargo are measured in
*trades* (the long format's native index), not bars (walk_forward.py:68
purges 100 bars); bootstrap is B=100 × block=10 (arch defaults 10000×20)
— same estimator shape, test-scale constants.

Scale: everything is per-(symbol, barrier_id) group math; fold/split
explosion multiplies rows by K (4) or C(6,2)=15 — linear fan-out on a
long format that is already small relative to bars.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.detsum import fold_sum

KEYS = ["symbol", "barrier_id"]
N_FOLDS = 4
PURGE_TRADES = 5
CPCV_BLOCKS = 6
CPCV_EMBARGO = 2
MBB_B = 100
MBB_BLOCK = 10
MDD_CAP = 0.25  # GT-composite drawdown cap (walk_forward.py:963-988 shape)


def _with_tn(trades: DataFrame) -> DataFrame:
    w = Window.partitionBy(*KEYS).orderBy("signal_ts_ms")
    return trades.withColumn("tn", F.row_number().over(w)).withColumn(
        "n_total", F.count("*").over(Window.partitionBy(*KEYS))
    )


def _sorted_median(arr: Column) -> Column:
    """np.median twin: midpoint of the two central order statistics."""
    s = F.sort_array(arr)
    n = F.size(s)
    mid = (n / 2).cast("int")
    return F.when(n == 0, F.lit(None).cast("double")).when(
        n % 2 == 1, F.element_at(s, mid + 1)
    ).otherwise((F.element_at(s, mid) + F.element_at(s, mid + 1)) / 2.0)


def _omega0(rs_sorted: Column) -> Column:
    gains = fold_sum(F.transform(rs_sorted, lambda x: F.greatest(x, F.lit(0.0))))
    losses = fold_sum(F.transform(rs_sorted, lambda x: F.greatest(-x, F.lit(0.0))))
    return gains / F.nullif(losses, F.lit(0.0))


def wf_fold_metrics(trades: DataFrame, k: int = N_FOLDS, purge: int = PURGE_TRADES) -> DataFrame:
    """E18 + E22: K-fold walk-forward with expanding train and trade-level
    purge gap; per-(config, fold) train/test omega, test max drawdown and
    underwater run stats."""
    t = _with_tn(trades).withColumn(
        "fold",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(k - 1).cast("long"))),
    )
    tsz = (F.col("n_total") / k).cast("int")
    test_lo = F.col("fold") * tsz  # exclusive
    test_hi = F.when(F.col("fold") == k - 1, F.col("n_total")).otherwise(
        (F.col("fold") + 1) * tsz
    )
    is_test = (F.col("tn") > test_lo) & (F.col("tn") <= test_hi)
    is_train = F.col("tn") <= test_lo - purge
    t = t.filter(is_test | is_train).withColumn(
        "split", F.when(is_test, "test").otherwise("train")
    )
    # underwater runs need the in-fold test equity curve
    wseq = Window.partitionBy(*KEYS, "fold", "split").orderBy("tn")
    wcum = wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = (
        t.withColumn("_cum", F.sum("return_pct").over(wcum))
        .withColumn("_dd", F.max("_cum").over(wcum) - F.col("_cum"))
        .withColumn("_uw", (F.col("_dd") > 1e-12).cast("int"))
        .withColumn("_uw_prev", F.coalesce(F.lag("_uw", 1).over(wseq), F.lit(0)))
        .withColumn(
            "_run_start", ((F.col("_uw") == 1) & (F.col("_uw_prev") == 0)).cast("int")
        )
        .withColumn("_run_id", F.sum("_run_start").over(wcum))
    )
    per_split = t.groupBy(*KEYS, "fold", "split").agg(
        F.count("*").cast("long").alias("n"),
        F.sort_array(F.collect_list("return_pct")).alias("_rs"),
        F.round(F.max("_dd"), 6).alias("max_drawdown"),
        F.max(F.when(F.col("_uw") == 1, F.col("_run_id"))).alias("_n_runs"),
        F.sum("_uw").cast("long").alias("_uw_total"),
    )
    per_split = per_split.withColumn("omega", F.round(_omega0(F.col("_rs")), 6)).drop(
        "_rs"
    )
    wide = (
        per_split.groupBy(*KEYS, "fold")
        .pivot("split", ["train", "test"])
        .agg(
            F.first("n").alias("n"),
            F.first("omega").alias("omega"),
            F.first("max_drawdown").alias("mdd"),
            F.first("_n_runs").alias("nruns"),
            F.first("_uw_total").alias("uw"),
        )
    )
    return wide.select(
        *KEYS,
        "fold",
        F.coalesce(F.col("train_n"), F.lit(0)).alias("train_n"),
        F.col("train_omega"),
        F.coalesce(F.col("test_n"), F.lit(0)).alias("test_n"),
        F.col("test_omega"),
        F.col("test_mdd").alias("test_max_drawdown"),
        F.coalesce(F.col("test_nruns"), F.lit(0)).cast("long").alias("test_underwater_runs"),
        F.coalesce(F.col("test_uw"), F.lit(0)).cast("long").alias("test_underwater_trades"),
    ).filter(F.col("train_n") > 0)
    # ^ folds with an empty train partition (fold 0: tn <= -purge matches
    # nothing) are never scored OOS in the reference — build_wfo_folds keeps
    # only folds with len(train) >= test_size*min_train_splits
    # (walk_forward.py:99); their test omega must not feed wf_topk's median.


def wf_topk(fold_metrics: DataFrame, top_k: int = 5) -> DataFrame:
    """Stage-1 selection (walk_forward.py:243-259): rank configs per symbol
    by median OOS omega (desc, NULLs last, barrier_id tie-break)."""
    # NB: medians of 6-decimal-rounded inputs land exactly on .5 at the 7th
    # decimal; F.round (half-up) and DuckDB round disagree there, so use an
    # explicit sign-safe half-up in both engines
    med_raw = _sorted_median(F.collect_list("test_omega"))
    halfup6 = (
        F.signum(med_raw) * F.floor(F.abs(med_raw) * 1e6 + F.lit(0.5)) / F.lit(1e6)
    )
    med = fold_metrics.groupBy(*KEYS).agg(
        halfup6.alias("median_test_omega"),
        F.count("*").cast("long").alias("n_folds"),
    )
    w = Window.partitionBy("symbol").orderBy(
        F.col("median_test_omega").desc_nulls_last(), F.col("barrier_id").asc()
    )
    return (
        med.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("selected", F.col("rank") <= top_k)
    )


def cpcv_splits(spark: SparkSession, n_blocks: int = CPCV_BLOCKS):
    """C(N,2) test-pair split grid as a broadcast literal table."""
    rows = [
        (i, b1, b2)
        for i, (b1, b2) in enumerate(combinations(range(n_blocks), 2))
    ]
    return spark.createDataFrame(rows, "split_id int, tb1 int, tb2 int")


def cpcv_pbo(
    trades: DataFrame,
    spark: SparkSession,
    n_blocks: int = CPCV_BLOCKS,
    embargo: int = CPCV_EMBARGO,
) -> DataFrame:
    """E19 + E20: combinatorial purged CV over trade-index blocks with
    trade-level embargo; per symbol, PBO = fraction of splits where the
    IS-best barrier config falls below the OOS median (cscv.py logic on
    CPCV splits).  Output one row per symbol."""
    t = _with_tn(trades)
    bsz = F.ceil(F.col("n_total") / n_blocks).cast("int")
    t = t.withColumn("block", F.least(((F.col("tn") - 1) / bsz).cast("int"), F.lit(n_blocks - 1)))
    t = t.crossJoin(F.broadcast(cpcv_splits(spark, n_blocks)))
    in_test = (F.col("block") == F.col("tb1")) | (F.col("block") == F.col("tb2"))
    # embargo: first `embargo` trades of the block right after a test block
    # are excluded from train
    after1 = (F.col("block") == F.col("tb1") + 1) & (
        F.col("tn") - (F.col("tb1") + 1) * bsz <= embargo
    )
    after2 = (F.col("block") == F.col("tb2") + 1) & (
        F.col("tn") - (F.col("tb2") + 1) * bsz <= embargo
    )
    t = t.filter(in_test | ~(after1 | after2)).withColumn(
        "split", F.when(in_test, "test").otherwise("train")
    )
    perf = t.groupBy("symbol", "barrier_id", "split_id", "split").agg(
        F.sort_array(F.collect_list("return_pct")).alias("_rs")
    )
    perf = perf.withColumn("omega", F.round(_omega0(F.col("_rs")), 6)).drop("_rs")
    wide = (
        perf.groupBy("symbol", "barrier_id", "split_id")
        .pivot("split", ["train", "test"])
        .agg(F.first("omega"))
    )
    w_is = Window.partitionBy("symbol", "split_id").orderBy(
        F.col("train").desc_nulls_last(), F.col("barrier_id").asc()
    )
    ranked = wide.withColumn("is_rank", F.row_number().over(w_is))
    med_oos = wide.groupBy("symbol", "split_id").agg(
        _sorted_median(F.collect_list("test")).alias("oos_median")
    )
    winners = ranked.filter(F.col("is_rank") == 1).join(
        med_oos, ["symbol", "split_id"]
    )
    return winners.groupBy("symbol").agg(
        F.count("*").cast("long").alias("n_splits"),
        F.sum(
            F.when(
                F.col("test").isNull() | (F.col("test") < F.col("oos_median")), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_underperform"),
        F.round(
            F.sum(
                F.when(
                    F.col("test").isNull() | (F.col("test") < F.col("oos_median")), 1
                ).otherwise(0)
            ).cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("pbo"),
    )


def mbb_bootstrap_ci(
    trades: DataFrame,
    b_reps: int = MBB_B,
    block: int = MBB_BLOCK,
    alpha: float = 0.05,
) -> DataFrame:
    """E21: moving-block bootstrap CI of the mean trade return, with
    md5-deterministic block starts (resample r, slot j -> start =
    hexint(md5(key|r|j)) % (n - block + 1)) — reproducible and
    cross-engine exact, unlike a seeded RNG.  CI = empirical type-6
    quantiles of the resample means."""
    from ..functions.quantiles import q6_from_sorted_array

    base = _with_tn(trades).groupBy(*KEYS).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("tn").alias("o"), F.col("return_pct").alias("v")))
            ),
            lambda s: s["v"],
        ).alias("rs"),
        F.count("*").cast("int").alias("n"),
    ).filter(F.col("n") >= block)
    nblocks = F.ceil(F.col("n") / block).cast("int")
    grid = base.withColumn("rep", F.explode(F.sequence(F.lit(1), F.lit(b_reps))))
    seedkey = F.concat_ws("|", *KEYS, F.col("rep").cast("string"))
    # one resample mean per (config, rep): sequential fold over its blocks
    starts = F.transform(
        F.sequence(F.lit(1), nblocks),
        lambda j: F.conv(
            F.substring(F.md5(F.concat(seedkey, F.lit("#"), j.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % (F.col("n") - block + 1).cast("long")
        + 1,
    )
    sampled = F.flatten(
        F.transform(starts, lambda s: F.slice(F.col("rs"), s.cast("int"), block))
    )
    resample_mean = fold_sum(sampled) / F.size(sampled).cast("double")
    means = grid.select(*KEYS, "n", F.col("rep"), resample_mean.alias("mean_r"))
    agg = means.groupBy(*KEYS).agg(
        F.max("n").alias("n_trades"),
        F.sort_array(F.collect_list("mean_r")).alias("_ms"),
    )
    return agg.select(
        *KEYS,
        F.col("n_trades").cast("long").alias("n_trades"),
        F.lit(b_reps).cast("long").alias("b_reps"),
        F.round(q6_from_sorted_array(F.col("_ms"), alpha / 2.0), 8).alias("ci_low"),
        F.round(q6_from_sorted_array(F.col("_ms"), 1.0 - alpha / 2.0), 8).alias("ci_high"),
        F.round(_sorted_median(F.col("_ms")), 8).alias("boot_median"),
    )


def gt_composite(
    tail: DataFrame, dsr: DataFrame, pbo: DataFrame, fold_metrics: DataFrame
) -> DataFrame:
    """E25 (walk_forward.py:963-988): GT = Omega * min(1, |DSR|) *
    (1 - PBO) * max(0, 1 - MDD / cap), joined from the other layers."""
    mdd = fold_metrics.groupBy(*KEYS).agg(
        F.max("test_max_drawdown").alias("worst_mdd")
    )
    j = (
        tail.select(*KEYS, "_omega_raw")
        .join(dsr.select(*KEYS, "dsr"), KEYS)
        .join(mdd, KEYS)
        .join(F.broadcast(pbo.select("symbol", "pbo")), "symbol")
    )
    gt = (
        F.col("_omega_raw")
        * F.least(F.lit(1.0), F.abs(F.col("dsr")))
        * (F.lit(1.0) - F.col("pbo"))
        * F.greatest(F.lit(0.0), F.lit(1.0) - F.col("worst_mdd") / F.lit(MDD_CAP))
    )
    return j.select(
        *KEYS,
        F.round(F.col("_omega_raw"), 6).alias("omega"),
        F.col("dsr"),
        F.col("pbo"),
        F.round(F.col("worst_mdd"), 6).alias("worst_mdd"),
        F.round(gt, 6).alias("gt_composite"),
    )
