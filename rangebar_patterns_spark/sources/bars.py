"""events -> range-bar adapter, deterministic and cross-engine exact.

The reference engine's primary input is a range-bar fact table
(``opendeviationbar_cache.open_deviation_bars``; schema assembled in
SURVEY.md §1.2 from reference sql/gen600_2down_template.sql:31-64 and
eval/extraction.py:30-33).  The driver's testdata has no bars table, so we
derive one from ``events`` with a transform that is:

  * **deterministic** — pure function of (event_id, ts, event_type, value);
  * **cross-engine bit-exact** — only integer modular arithmetic, IEEE-exact
    double ops (+,-,*,/ of exact inputs, floor, greatest/least) and
    row_number over a unique ordering key.  No transcendentals, no float
    accumulation (window "lookback" features sum *integer-scaled* values so
    segment-tree summation in DuckDB and sliding summation in Spark agree
    exactly);
  * **expressed twice** — as a DataFrame transform (``bars_from_events``)
    and as a DuckDB SQL CTE (``BARS_DUCKDB_CTE``) for the oracle side.
    ``tests/test_bars_parity.py`` pins bit-equality between the two.

Column semantics follow FIXTURES.md §1: strictly increasing close_time_ms
ordering within (symbol, threshold) via the bar index ``rn``; OHLC
coherence (high >= max(open, close) >= min(open, close) >= low);
signed/positive feature distributions so p95 thresholds and ``> 0``
predicates are meaningful; NULL bands in intra_* features to exercise
NULL-skipping quantile semantics.

At scale this adapter is a stand-in for the upstream range-bar
constructor; the engine proper only assumes the FIXTURES.md §1 schema with
data partitioned by (symbol, threshold_decimal_bps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# One shared prime modulus; per-feature multiplier/offset pairs.  Products
# stay < 1e6 * 3.3e9 ≈ 3.3e15 << 2^63, so no overflow in either engine.
_P = 999983
_FEATURE_HASHES = {
    # name: (multiplier, offset)
    "u1": (2654435761, 7919),
    "u2": (2246822519, 15838),
    "u3": (3266489917, 23757),
    "u4": (668265263, 31676),
    "u5": (374761393, 39595),
    "u6": (1103515245, 47514),
    "u7": (1299709, 55433),
    "u8": (15485863, 63352),
    "u9": (32452843, 71271),
    "u10": (49979687, 79190),
}

LOOKBACK_WINDOW = 20  # bars, frame [-20, -1]
_LOOKBACK_SCALE = 1_000_000  # integer scaling for exact cross-engine sums


def bars_from_events(spark_or_df, sf_dir: str | None = None) -> DataFrame:
    """Build the bars DataFrame.

    Accepts either (spark, sf_dir) or an events DataFrame directly.
    """
    if isinstance(spark_or_df, DataFrame):
        events = spark_or_df
    else:
        events = spark_or_df.read.parquet(f"{sf_dir}/events.parquet")

    w = Window.partitionBy("event_type").orderBy("ts", "event_id")

    # ts arrives as raw int64 nanoseconds (TIMESTAMP(NANOS) parquet via
    # spark.sql.legacy.parquet.nanosAsLong).  Integer floor-division to ms —
    # ns magnitudes (~1.7e18) exceed double precision, so this must stay in
    # integer arithmetic.  DuckDB's epoch_ms(ts) truncates ns->us->ms the
    # same way for positive epochs.
    ts_field = dict(events.dtypes)["ts"]
    if ts_field == "bigint":
        close_ms = F.expr("ts div 1000000")
    else:
        close_ms = F.unix_millis(F.col("ts").cast("timestamp"))

    # rn as BIGINT to match DuckDB's row_number type in oracle schemas
    df = events.withColumn("rn", F.row_number().over(w).cast("long")).select(
        F.col("event_type").alias("symbol"),
        close_ms.alias("close_time_ms"),
        F.col("event_id"),
        F.col("user_id"),
        F.col("value"),
        F.col("rn"),
    )

    # deterministic uniforms in [0, 1)
    for name, (mult, off) in _FEATURE_HASHES.items():
        h = (F.col("event_id") % _P * F.lit(mult) + F.lit(off)) % _P
        df = df.withColumn(name, h.cast("double") / F.lit(float(_P)))

    # price path: bounded multi-period *triangle* waves + hash jitter —
    # balanced up/down with genuine runs in both directions, and no float
    # accumulation so each row is exact in both engines
    wiggle = (
        (F.abs(F.col("rn") % 64 - 32) - 16) * F.lit(0.01)
        + (F.abs(F.col("rn") % 18 - 9) - 4) * F.lit(0.02)
        + (F.abs(F.col("rn") % 6 - 3) - 1) * F.lit(0.01)
    )
    df = df.withColumn("close", F.lit(100.0) + wiggle + (F.col("u1") - 0.5) * F.lit(0.01))

    # ~10% of bars are wickless on each side so wickless-formation
    # predicates (wl1d/wl2d, opposite_wick_pct < 0.001) have a population
    wb = Window.partitionBy("symbol").orderBy("rn")
    up_wick = F.when(F.col("u2") < 0.1, F.lit(0.0)).otherwise(F.col("u2") * F.lit(0.03))
    dn_wick = F.when(F.col("u3") < 0.1, F.lit(0.0)).otherwise(F.col("u3") * F.lit(0.03))
    df = (
        df.withColumn("open", F.coalesce(F.lag("close", 1).over(wb), F.lit(100.0)))
        .withColumn("high", F.greatest("open", "close") + up_wick)
        .withColumn("low", F.least("open", "close") - dn_wick)
    )

    df = (
        df.withColumn("threshold_decimal_bps", F.lit(250))
        .withColumn("ouroboros_mode", F.lit("month"))
        .withColumn("volume", F.col("value") * 10.0 + 1.0)
        .withColumn(
            "duration_us", (F.floor(F.col("u4") * F.lit(999999.0)) + F.lit(1)).cast("long")
        )
        .withColumn("trade_intensity", F.col("u5") * 10.0)
        .withColumn("kyle_lambda_proxy", F.col("u6") - 0.5)
        .withColumn("ofi", F.col("u7") - 0.5)
        .withColumn("aggression_ratio", F.col("u8") * 0.98 + 0.01)
        .withColumn("turnover_imbalance", F.col("u9") - 0.5)
        .withColumn("price_impact", F.col("u10") * 0.5)
        .withColumn("vwap_close_deviation", (F.col("u1") - 0.5) * 0.001)
        .withColumn("volume_per_trade", F.col("u2") * 100.0 + 1.0)
        .withColumn("aggregation_density", F.col("u3") * 50.0 + 1.0)
    )

    # lookback_* features: exact integer-scaled rolling means over the prior
    # LOOKBACK_WINDOW bars (frame [-20,-1]); integer sums are associative so
    # DuckDB's segment-tree and Spark's sliding aggregation agree bit-exactly.
    frame = wb.rowsBetween(-LOOKBACK_WINDOW, -1)
    for src, dst in [("ofi", "lookback_ofi"), ("trade_intensity", "lookback_trade_intensity")]:
        scaled = F.floor(F.col(src) * F.lit(float(_LOOKBACK_SCALE))).cast("long")
        df = df.withColumn(
            dst,
            (F.sum(scaled).over(frame)).cast("double")
            / (F.count(scaled).over(frame) * F.lit(float(_LOOKBACK_SCALE))),
        )

    # intra_* features with NULL bands (FIXTURES.md: 10-35% NULLs to
    # exercise NULL-skipping quantile semantics).  intra_mdd / intra_mru
    # (intra-bar max drawdown / max run-up) feed the exhaustion-formation
    # gates (reference gen600_exh_l_template.sql:75-95: intra_max_drawdown
    # vs its rolling p75; gen600_exh_s_template.sql twin on max run-up).
    df = (
        df.withColumn(
            "intra_hurst",
            F.when(F.col("u9") < 0.25, F.lit(None).cast("double")).otherwise(
                F.col("u6") * 0.5 + 0.25
            ),
        )
        .withColumn(
            "intra_permutation_entropy",
            F.when(F.col("u10") < 0.15, F.lit(None).cast("double")).otherwise(
                F.col("u7") + 0.5
            ),
        )
        .withColumn(
            "intra_mdd",
            F.when(F.col("u5") < 0.2, F.lit(None).cast("double")).otherwise(
                F.col("u8") * 0.05
            ),
        )
        .withColumn(
            "intra_mru",
            F.when(F.col("u4") < 0.2, F.lit(None).cast("double")).otherwise(
                F.col("u7") * 0.05
            ),
        )
    )

    return df.drop("event_id", "user_id", "value", *list(_FEATURE_HASHES))


def _duck_uniform(mult: int, off: int) -> str:
    return f"CAST((event_id % {_P} * {mult} + {off}) % {_P} AS DOUBLE) / {float(_P)}"


def _bars_duckdb_sql() -> str:
    u = {name: _duck_uniform(m, o) for name, (m, o) in _FEATURE_HASHES.items()}
    lb = LOOKBACK_WINDOW
    sc = float(_LOOKBACK_SCALE)
    lookback = ",\n        ".join(
        f"CAST(sum(CAST(floor({src} * {sc}) AS BIGINT)) OVER lbw AS DOUBLE)"
        f" / (count(CAST(floor({src} * {sc}) AS BIGINT)) OVER lbw * {sc}) AS {dst}"
        for src, dst in [
            ("ofi", "lookback_ofi"),
            ("trade_intensity", "lookback_trade_intensity"),
        ]
    )
    return f"""
base_bars0 AS (
    SELECT
        event_type AS symbol,
        epoch_ms(ts) AS close_time_ms,
        row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn,
        event_id,
        value
    FROM events
),
base_bars1 AS (
    SELECT symbol, close_time_ms, rn,
        100.0 + ((abs(rn % 64 - 32) - 16) * 0.01 + (abs(rn % 18 - 9) - 4) * 0.02 + (abs(rn % 6 - 3) - 1) * 0.01)
              + ({u['u1']} - 0.5) * 0.01 AS close,
        {u['u1']} AS u1, {u['u2']} AS u2, {u['u3']} AS u3, {u['u4']} AS u4,
        {u['u5']} AS u5, {u['u6']} AS u6, {u['u7']} AS u7, {u['u8']} AS u8,
        {u['u9']} AS u9, {u['u10']} AS u10,
        value
    FROM base_bars0
),
base_bars2 AS (
    SELECT *, coalesce(lag(close, 1) OVER (PARTITION BY symbol ORDER BY rn), 100.0) AS open
    FROM base_bars1
),
base_bars3 AS (
    SELECT *,
        greatest(open, close) + CASE WHEN u2 < 0.1 THEN 0.0 ELSE u2 * 0.03 END AS high,
        least(open, close) - CASE WHEN u3 < 0.1 THEN 0.0 ELSE u3 * 0.03 END AS low,
        250 AS threshold_decimal_bps,
        'month' AS ouroboros_mode,
        value * 10.0 + 1.0 AS volume,
        CAST(floor(u4 * 999999.0) + 1 AS BIGINT) AS duration_us,
        u5 * 10.0 AS trade_intensity,
        u6 - 0.5 AS kyle_lambda_proxy,
        u7 - 0.5 AS ofi,
        u8 * 0.98 + 0.01 AS aggression_ratio,
        u9 - 0.5 AS turnover_imbalance,
        u10 * 0.5 AS price_impact,
        (u1 - 0.5) * 0.001 AS vwap_close_deviation,
        u2 * 100.0 + 1.0 AS volume_per_trade,
        u3 * 50.0 + 1.0 AS aggregation_density,
        CASE WHEN u9 < 0.25 THEN NULL ELSE u6 * 0.5 + 0.25 END AS intra_hurst,
        CASE WHEN u10 < 0.15 THEN NULL ELSE u7 + 0.5 END AS intra_permutation_entropy,
        CASE WHEN u5 < 0.2 THEN NULL ELSE u8 * 0.05 END AS intra_mdd,
        CASE WHEN u4 < 0.2 THEN NULL ELSE u7 * 0.05 END AS intra_mru
    FROM base_bars2
),
bars AS (
    SELECT symbol, close_time_ms, rn, close, open, high, low,
        threshold_decimal_bps, ouroboros_mode, volume, duration_us,
        trade_intensity, kyle_lambda_proxy, ofi, aggression_ratio,
        turnover_imbalance, price_impact, vwap_close_deviation,
        volume_per_trade, aggregation_density, intra_hurst,
        intra_permutation_entropy, intra_mdd, intra_mru,
        {lookback}
    FROM base_bars3
    WINDOW lbw AS (PARTITION BY symbol ORDER BY rn ROWS BETWEEN {lb} PRECEDING AND 1 PRECEDING)
)"""


#: DuckDB CTE chain defining a ``bars`` relation from the ``events`` view.
#: Prepend as ``WITH {BARS_DUCKDB_CTE}, ...`` in oracle SQL.
BARS_DUCKDB_CTE = _bars_duckdb_sql()

BAR_COLUMNS = [
    "symbol",
    "close_time_ms",
    "rn",
    "close",
    "open",
    "high",
    "low",
    "threshold_decimal_bps",
    "ouroboros_mode",
    "volume",
    "duration_us",
    "trade_intensity",
    "kyle_lambda_proxy",
    "ofi",
    "aggression_ratio",
    "turnover_imbalance",
    "price_impact",
    "vwap_close_deviation",
    "volume_per_trade",
    "aggregation_density",
    "intra_hurst",
    "intra_permutation_entropy",
    "intra_mdd",
    "intra_mru",
    "lookback_ofi",
    "lookback_trade_intensity",
]
