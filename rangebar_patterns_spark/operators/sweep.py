"""The sweep engine: (formation × feature-filter × quantile × barrier)
configs as *data*, one parameterized plan (SURVEY.md §7.1 step 5).

The reference instantiates 301,040 sed-substituted SQL files
(scripts/gen600/generate.sh:104-175) — 22 formation templates × 9 bar
features × 38 cross features × 4 quantile combos × 10 asset/thresholds —
and schedules them 16-wide through pueue.  Here the same sweep is ONE
DataFrame pipeline: the config grid is a broadcast DataFrame, the feature
dimension becomes a map lookup (feature name → column value), and every
config shares a single bar scan + window stack instead of recomputing it
301K times.  That shared-scan amortization is the headline Spark win
(BASELINE.md: 1,008 configs × 8 s serial vs one shared pass).

Per-config semantics (sql/gen600_2down_template.sql:66-138):

1. candidate = formation bars with trade_intensity above the rolling
   (999 PRECEDING .. 1 PRECEDING) no-lookahead p95, positive Kyle lambda,
   warmup passed, valid entry, both feature values non-NULL;
2. feature1/feature2 rolling signal-set quantiles (W7 — computed over the
   *candidate sequence*, not the bar sequence: the "Feature Quantile
   Trap", semantic not optimizable); both quantiles run over the SAME
   candidate set, filters apply afterwards;
3. signal = candidate passing ``feature_i <dir_i> q_i`` for both features;
4. signals × barrier profiles → trades → per-config metrics.

Scale notes: the exploded candidate stream is (configs × candidate rate ×
bars) rows but only ~10 narrow columns — filters and the formation
explode run JVM-side; the per-(config, symbol) W7 quantile pass reuses the
streaming two-heap kernel (functions/series_quantile.py).  Forward OHLC
arrays are attached to *surviving* signals only, by an equi-join back to
the bar table (AP-01 signals-first discipline: reference anti-patterns.md
documents a 2.36 GB → 1.6 MB difference).
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import chain

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from ..functions.series_quantile import excl_quantile_stream
from .signals import FORMATIONS, base_eligibility

#: W7 rolling window over the candidate sequence (gen600: 999 PRECEDING .. 1 PRECEDING)
SIGNALSET_LOOKBACK = 999


@dataclass(frozen=True)
class SweepConfig:
    formation: str
    feature1: str
    q1: float
    dir1: str  # ">" or "<"
    feature2: str
    q2: float
    dir2: str

    @property
    def config_id(self) -> str:
        d = {">": "gt", "<": "lt"}
        return (
            f"{self.formation}_{self.feature1}_{d[self.dir1]}{int(self.q1 * 100):02d}"
            f"_{self.feature2}_{d[self.dir2]}{int(self.q2 * 100):02d}"
        )


def default_sweep_grid() -> list[SweepConfig]:
    """Demo-scale grid with the reference's combinatorial shape
    (generate.sh:104-175), now spanning ALL 22 gen600 formation templates
    including the 11 SHORT ones (generate.sh runs every template through
    the same feature × quantile substitutions): 22 formations × 1 feature
    pair × 2 quantile combos = 44 configs.  Production grids just pass
    longer lists."""
    combos = [
        (0.75, ">", 0.75, ">"),
        (0.25, "<", 0.75, ">"),
    ]
    return [
        SweepConfig(f, f1, q1, d1, f2, q2, d2)
        for f in FORMATIONS
        for f1, f2 in (("ofi", "price_impact"),)
        for q1, d1, q2, d2 in combos
    ]


def gen500_grid() -> list[SweepConfig]:
    """The reference's gen500-scale sweep: 1,008 configs (6 formations ×
    12 ordered feature pairs × 14 quantile combos) — the workload
    BASELINE.md prices at 1,008 queries × (1-8)s / 16-way on ClickHouse.
    Here it is one shared plan (see ``with_signalset_quantiles`` for the
    threshold dedup that makes the Python pass O(formations × features ×
    qs), not O(configs))."""
    from .signals import SWEEP_FORMATION_NAMES

    feats = ["ofi", "price_impact", "turnover_imbalance", "aggression_ratio"]
    qc = [
        (q1, d1, q2, d2)
        for q1 in (0.25, 0.5, 0.75)
        for d1 in (">", "<")
        for q2 in (0.25, 0.5, 0.75)
        for d2 in (">", "<")
    ][:14]
    return [
        SweepConfig(f, f1, q1, d1, f2, q2, d2)
        for f in SWEEP_FORMATION_NAMES
        for f1 in feats
        for f2 in feats
        if f1 != f2
        for q1, d1, q2, d2 in qc
    ]


SWEEP_GRID_SCHEMA = (
    "config_id string, formation string, feature1 string, q1 double, dir1 string, "
    "feature2 string, q2 double, dir2 string, side string"
)


def sweep_grid_to_spark(spark: SparkSession, grid: list[SweepConfig]) -> DataFrame:
    rows = [
        (
            c.config_id,
            c.formation,
            c.feature1,
            c.q1,
            c.dir1,
            c.feature2,
            c.q2,
            c.dir2,
            FORMATIONS[c.formation].side,
        )
        for c in grid
    ]
    return spark.createDataFrame(rows, SWEEP_GRID_SCHEMA)


def grid_formations(grid: list[SweepConfig]) -> tuple[str, ...]:
    """Formation names a grid actually sweeps — pass to
    :func:`sweep_candidates` so the explode only evaluates predicates the
    config join can keep (broadcast-join semantics drop the rest anyway,
    but not exploding them saves the intermediate rows)."""
    return tuple(sorted({c.formation for c in grid}))


def base_candidate_filter(warmup: int) -> F.Column:
    """The gate-INDEPENDENT part of every gen600 config's candidate
    predicate: warmup passed and a valid next-bar entry.  Entry gates (ti
    above rolling p95 + Kyle sign, exhaustion/volume/VWAP thresholds, or
    none for ``_ng``/wickless formations) are per-formation and applied in
    the formation explode — the reference's wl1d/wl2d templates carry NO
    ti/kyle gate (sql/gen600_wl1d_template.sql champion_signals WHERE)."""
    return base_eligibility(warmup)


_CAND_COLUMNS = [
    "config_id",
    "formation",
    "feature1",
    "q1",
    "dir1",
    "feature2",
    "q2",
    "dir2",
    "side",
    "symbol",
    "rn",
    "close_time_ms",
    "threshold_decimal_bps",
    "entry_price",
    "next_dir",
    "f1_val",
    "f2_val",
]


def sweep_candidates(
    feat: DataFrame,
    configs: DataFrame,
    feature_cols: list[str],
    warmup: int,
    formations: tuple[str, ...] | None = None,
) -> DataFrame:
    """Candidate rows per config: formation-explode × config-join × feature
    map lookup, all JVM-side.  ``feat`` is ``with_bar_features(...,
    rolling_window=...)`` output (plus ``with_gate_quantiles`` when a swept
    formation's gate needs non-ti thresholds).  Each formation's full
    signal predicate (pattern ∧ its own gate) decides membership.
    ``formations`` defaults to ALL 22 registry formations (safe: the
    config join drops unswept ones); pass :func:`grid_formations` to skip
    evaluating predicates the grid can't keep."""
    if formations is None:
        formations = tuple(FORMATIONS)
    formation_arr = F.array(
        *[F.when(FORMATIONS[name].signal(), F.lit(name)) for name in formations]
    )
    cand = (
        feat.filter(base_candidate_filter(warmup))
        .withColumn(
            "formation",
            F.explode(F.filter(formation_arr, lambda x: x.isNotNull())),
        )
        .join(F.broadcast(configs), "formation")
    )
    fmap = F.create_map(*chain.from_iterable((F.lit(c), F.col(c)) for c in feature_cols))
    cand = (
        cand.withColumn("f1_val", F.element_at(fmap, F.col("feature1")))
        .withColumn("f2_val", F.element_at(fmap, F.col("feature2")))
        .filter(F.col("f1_val").isNotNull() & F.col("f2_val").isNotNull())
    )
    return cand.select(*_CAND_COLUMNS)


def with_signalset_quantiles(
    cand: DataFrame, lookback: int = SIGNALSET_LOOKBACK
) -> DataFrame:
    """W7: rolling exclusive quantiles of feature1/feature2 over the
    per-config candidate sequence.

    Key sweep-scale property: a config's *candidate set* is fully
    determined by (formation, feature pair) — the base filter and the
    formation predicate don't involve the paired features, but candidate
    membership does require BOTH features non-NULL (sweep_candidates), so
    two configs share a candidate sequence iff they share the formation
    and the (unordered) feature pair.  The dedup key therefore includes
    the *partner* feature: thresholds run once per distinct
    (formation, feature, q, partner, symbol) group —
    O(formations × feature-pairs × qs) Python groups instead of
    O(configs) — and remain bit-identical to the per-config computation
    even when a feature has post-warmup NULLs (the "Feature Quantile
    Trap" this module documents: dropping a row for one config but not
    another shifts the rolling-999 window contents).  At the reference's
    301K-config scale this is still a ~100× reduction in streaming
    quantile passes; values are verified by the oracle suite, which
    models the per-config semantics."""
    thr_schema = StructType(
        [
            StructField("formation", cand.schema["formation"].dataType),
            StructField("feature", cand.schema["feature1"].dataType),
            StructField("q", DoubleType()),
            StructField("partner", cand.schema["feature2"].dataType),
            StructField("symbol", cand.schema["symbol"].dataType),
            StructField("rn", cand.schema["rn"].dataType),
            StructField("thr", DoubleType()),
        ]
    )

    def compute(pdf):
        pdf = pdf.sort_values("rn", kind="mergesort").reset_index(drop=True)
        pdf["thr"] = excl_quantile_stream(
            pdf["val"].to_numpy("float64", na_value=np.nan),
            float(pdf["q"].iloc[0]),
            lookback,
        )
        return pdf[["formation", "feature", "q", "partner", "symbol", "rn", "thr"]]

    sides = [
        cand.select(
            "formation",
            F.col(f"feature{i}").alias("feature"),
            F.col(f"q{i}").alias("q"),
            F.col(f"feature{3 - i}").alias("partner"),
            "symbol",
            "rn",
            F.col(f"f{i}_val").alias("val"),
        )
        for i in (1, 2)
    ]
    thr_input = sides[0].unionByName(sides[1]).dropDuplicates(
        ["formation", "feature", "q", "partner", "symbol", "rn"]
    )
    # referenced by both join sides below — persist so the Arrow quantile
    # pass runs once (the relation is small: one row per deduped
    # (formation, feature, q, partner) candidate)
    thr = (
        thr_input.groupBy("formation", "feature", "q", "partner", "symbol")
        .applyInPandas(compute, thr_schema)
        .persist()
    )
    out = cand.join(
        thr.withColumnsRenamed(
            {"feature": "feature1", "q": "q1", "partner": "feature2", "thr": "f1_thr"}
        ),
        ["formation", "feature1", "q1", "feature2", "symbol", "rn"],
    ).join(
        thr.withColumnsRenamed(
            {"feature": "feature2", "q": "q2", "partner": "feature1", "thr": "f2_thr"}
        ),
        ["formation", "feature2", "q2", "feature1", "symbol", "rn"],
    )
    return out.select(*_CAND_COLUMNS, "f1_thr", "f2_thr")


def _passes(val: str, direction: str, thr: str) -> F.Column:
    return F.when(F.col(direction) == ">", F.col(val) > F.col(thr)).otherwise(
        F.col(val) < F.col(thr)
    )


def signal_pass_col() -> F.Column:
    """Final gen600 signal gate: both thresholds warmed and both
    directional feature conditions hold."""
    return (
        F.col("f1_thr").isNotNull()
        & F.col("f2_thr").isNotNull()
        & _passes("f1_val", "dir1", "f1_thr")
        & _passes("f2_val", "dir2", "f2_thr")
    )


def sweep_funnel(cand_q: DataFrame) -> DataFrame:
    """Per-(config, symbol) funnel + next-bar hit metrics (the gen01-style
    hypothesis row, per config): candidates → signals → hits.  A hit is
    the next bar moving in the config's trade direction — up (next_dir=1)
    for LONG formations, down (next_dir=0) for SHORT ones (the reference's
    SHORT templates trade the downside: gen600_2up_s_template.sql barrier
    geometry)."""
    passed = signal_pass_col()
    want_dir = F.when(F.col("side") == "short", F.lit(0)).otherwise(F.lit(1))
    hit = passed & (F.col("next_dir") == want_dir)
    n_sig = F.sum(F.when(passed, 1).otherwise(0))
    n_hit = F.sum(F.when(hit, 1).otherwise(0))
    sc = F.nullif(n_sig.cast("double"), F.lit(0.0))
    hit_rate = n_hit / sc
    return cand_q.groupBy("config_id", "symbol").agg(
        F.count("*").alias("n_candidates"),
        n_sig.alias("n_signals"),
        n_hit.alias("hits"),
        hit_rate.alias("hit_rate"),
        (hit_rate - 0.5).alias("edge_pct"),
        ((hit_rate - 0.5) / F.sqrt(F.lit(0.25) / sc)).alias("z_score"),
    )


def sweep_signals(cand_q: DataFrame) -> DataFrame:
    """Surviving signal keys per config (input to the barrier stage);
    ``side`` rides along so SHORT configs get inverted barrier geometry."""
    return cand_q.filter(signal_pass_col()).select(
        "config_id",
        "symbol",
        "rn",
        "close_time_ms",
        "threshold_decimal_bps",
        "entry_price",
        "side",
    )


# ---------------------------------------------------------------------------
# gen400 n-feature conjunction sweep: the (feature1, feature2) pair shape
# generalized to feature-LIST configs (reference gen400_3feature_template.sql
# / gen400_4feature_template.sql: champion pattern + N simultaneous
# rolling-quantile feature filters + fixed 2:1 R:R barriers)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class NFeatureConfig:
    """One gen400-style config: N simultaneous feature filters over the
    champion candidate stream."""

    features: tuple[str, ...]
    qs: tuple[float, ...]
    dirs: tuple[str, ...]  # ">" / "<" per slot

    @property
    def config_id(self) -> str:
        d = {">": "gt", "<": "lt"}
        parts = [
            f"{f}_{d[dr]}{int(q * 100):02d}"
            for f, q, dr in zip(self.features, self.qs, self.dirs)
        ]
        return f"nf{len(self.features)}_" + "_".join(parts)


def nfeature_grid() -> list[NFeatureConfig]:
    """Demo grid with the reference's 3- and 4-feature shapes (the
    production sweep substitutes longer feature lists the same way)."""
    return [
        NFeatureConfig(
            ("ofi", "price_impact", "turnover_imbalance"),
            (0.5, 0.75, 0.5), (">", ">", "<"),
        ),
        NFeatureConfig(
            ("aggression_ratio", "ofi", "price_impact"),
            (0.25, 0.5, 0.5), ("<", ">", ">"),
        ),
        NFeatureConfig(
            ("ofi", "price_impact", "turnover_imbalance", "aggression_ratio"),
            (0.5, 0.5, 0.5, 0.5), (">", ">", "<", ">"),
        ),
        NFeatureConfig(
            ("ofi", "price_impact", "turnover_imbalance", "aggression_ratio"),
            (0.75, 0.25, 0.5, 0.5), (">", "<", ">", "<"),
        ),
    ]


def nfeature_signals(
    feat: DataFrame,
    spark: SparkSession,
    grid: list[NFeatureConfig],
    warmup: int,
    lookback: int = SIGNALSET_LOOKBACK,
) -> DataFrame:
    """Surviving signals of every n-feature config (gen400 semantics):

    1. candidates = champion signal ∧ eligibility ∧ entry valid ∧ ALL
       config features non-NULL (candidate membership depends on the full
       feature list — the same Feature Quantile Trap rule as the pair
       sweep, so thresholds run per (config, slot));
    2. per-slot rolling exclusive quantile over the candidate sequence;
    3. signal = candidate whose every slot passes its directional filter.

    The config and slot tables are broadcast; the per-(config, slot,
    symbol) Arrow threshold pass scales with the config grid exactly like
    the reference's per-template expansion (configs sharing a feature SET
    could dedup further; the demo grid is small enough not to bother)."""
    from .signals import base_eligibility as _belig
    from .signals import champion_signal, eligibility

    feature_cols = sorted({f for c in grid for f in c.features})
    fmap = F.create_map(
        *chain.from_iterable((F.lit(c), F.col(c)) for c in feature_cols)
    )
    cfgs = spark.createDataFrame(
        [(c.config_id, list(c.features)) for c in grid],
        "config_id string, features array<string>",
    )
    slots = spark.createDataFrame(
        [
            (c.config_id, i, f, q, d)
            for c in grid
            for i, (f, q, d) in enumerate(zip(c.features, c.qs, c.dirs))
        ],
        "config_id string, slot int, feature string, q double, dir string",
    )
    base = feat.filter(
        champion_signal() & eligibility(warmup) & _belig(warmup)
    ).select(
        "symbol", "rn", "close_time_ms", "threshold_decimal_bps",
        "entry_price", "next_dir", *feature_cols,
    )
    cand = (
        base.crossJoin(F.broadcast(cfgs))
        .filter(F.forall(F.col("features"), lambda f: F.element_at(fmap, f).isNotNull()))
        .drop("features")
    )
    sl = cand.join(F.broadcast(slots), "config_id").withColumn(
        "val", F.element_at(fmap, F.col("feature"))
    )

    thr_schema = StructType(
        [
            StructField("config_id", sl.schema["config_id"].dataType),
            StructField("slot", sl.schema["slot"].dataType),
            StructField("symbol", sl.schema["symbol"].dataType),
            StructField("rn", sl.schema["rn"].dataType),
            StructField("thr", DoubleType()),
        ]
    )

    def compute(pdf):
        pdf = pdf.sort_values("rn", kind="mergesort").reset_index(drop=True)
        pdf["thr"] = excl_quantile_stream(
            pdf["val"].to_numpy("float64", na_value=np.nan),
            float(pdf["q"].iloc[0]),
            lookback,
        )
        return pdf[["config_id", "slot", "symbol", "rn", "thr"]]

    thr = sl.groupBy("config_id", "slot", "symbol").applyInPandas(
        compute, thr_schema
    )
    sl2 = sl.join(thr, ["config_id", "slot", "symbol", "rn"])
    slot_pass = F.col("thr").isNotNull() & F.when(
        F.col("dir") == ">", F.col("val") > F.col("thr")
    ).otherwise(F.col("val") < F.col("thr"))
    rows = (
        sl2.withColumn("_p", slot_pass.cast("int"))
        .groupBy(
            "config_id", "symbol", "rn", "close_time_ms",
            "threshold_decimal_bps", "entry_price",
        )
        .agg(F.min("_p").alias("_all"))
    )
    return (
        rows.filter(F.col("_all") == 1)
        .drop("_all")
        .withColumn("side", F.lit("long"))
    )


def sweep_trades(
    signals: DataFrame, fwd_bars: DataFrame, grid: DataFrame
) -> DataFrame:
    """Attach forward arrays to surviving signals (signals-first, AP-01)
    and run the shared barrier simulator per (config × profile)."""
    from .barriers import simulate_barriers

    joined = signals.join(
        fwd_bars.select("symbol", "rn", "fwd_highs", "fwd_lows", "fwd_opens", "fwd_closes"),
        ["symbol", "rn"],
    )
    # simulate_barriers reads the per-row ``side`` column carried from the
    # config grid: SHORT configs scan TP in forward lows / SL in highs
    return simulate_barriers(joined, grid, id_cols=("config_id",))
