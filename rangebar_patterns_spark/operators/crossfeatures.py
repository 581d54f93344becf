"""The gen600 38-column cross-feature surface (lookback_* / intra_*).

The reference's full hybrid sweep pairs each bar-level feature with 38
"cross" features — 16 lookback aggregates and 22 intra-bar microstructure
statistics (scripts/gen600/generate.sh:68-107 CROSS_FEATURES).  Those
columns live on the reference's bar fact table; the driver's synthetic
``events`` table has no microstructure payload, so — exactly like the bars
adapter (sources/bars.py) — the missing columns are derived
deterministically with integer modular hashes that are bit-exact across
Spark and DuckDB.  Columns the bars adapter already materializes for real
(``lookback_ofi`` rolling mean, ``intra_hurst``,
``intra_permutation_entropy``) are passed through untouched.

Scale note: every generated column is a handful of integer ops on ``rn``
inside whole-stage codegen — no shuffle, no window.  The cross surface is
only attached on the full-grid sweep path (plans/catalog.q_sweep_gen600 /
bench), keeping the shared ``bars``/``featg`` relations narrow for every
other query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: shared prime modulus (sources/bars.py convention)
_P = 999983

#: the reference's 38 cross features: 16 lookback + 22 intra
#: (scripts/gen600/generate.sh:68-107, order preserved)
CROSS_FEATURES = [
    "lookback_ofi",
    "lookback_intensity",
    "lookback_hurst",
    "lookback_permutation_entropy",
    "lookback_garman_klass_vol",
    "lookback_kaufman_er",
    "lookback_burstiness",
    "lookback_volume_skew",
    "lookback_volume_kurt",
    "lookback_price_range",
    "lookback_vwap_raw",
    "lookback_vwap_position",
    "lookback_count_imbalance",
    "lookback_kyle_lambda",
    "lookback_trade_count",
    "lookback_duration_us",
    "intra_bull_epoch_density",
    "intra_bear_epoch_density",
    "intra_bull_excess_gain",
    "intra_bear_excess_gain",
    "intra_bull_cv",
    "intra_bear_cv",
    "intra_max_drawdown",
    "intra_max_runup",
    "intra_trade_count",
    "intra_ofi",
    "intra_duration_us",
    "intra_intensity",
    "intra_vwap_position",
    "intra_count_imbalance",
    "intra_kyle_lambda",
    "intra_burstiness",
    "intra_volume_skew",
    "intra_volume_kurt",
    "intra_kaufman_er",
    "intra_garman_klass_vol",
    "intra_hurst",
    "intra_permutation_entropy",
]

#: columns the bars adapter materializes for real — never regenerated
_PASSTHROUGH = {"lookback_ofi", "intra_hurst", "intra_permutation_entropy"}

#: intra_* columns carry NULL bands (FIXTURES.md: 10-35% NULLs exercise
#: NULL-skipping signal-set quantile semantics); every 3rd generated
#: intra feature gets a 20% band
_NULL_RATE = 0.2


def _hash_params(k: int) -> tuple[int, int]:
    """Deterministic (multiplier, offset) per feature index; P is prime so
    any multiplier not ≡ 0 (mod P) permutes residues."""
    return 2654435761 + 1000003 * k, 7919 * (k + 1)


def _uniform(mult: int, off: int) -> F.Column:
    """Deterministic uniform in [0, 1): pure integer modular arithmetic on
    (rn, first-char-of-symbol) — identical in DuckDB (ascii())."""
    h = (
        F.col("rn") % _P * F.lit(mult) + F.ascii(F.col("symbol")) * F.lit(7919)
        + F.lit(off)
    ) % _P
    return h.cast("double") / F.lit(float(_P))


def _uniform_sql(mult: int, off: int) -> str:
    return (
        f"CAST((rn % {_P} * {mult} + ascii(symbol) * 7919 + {off}) % {_P}"
        f" AS DOUBLE) / {float(_P)}"
    )


def _generated() -> list[tuple[str, int, int, bool]]:
    """(name, mult, off, has_null_band) for every generated column."""
    out = []
    gen_idx = 0
    for name in CROSS_FEATURES:
        if name in _PASSTHROUGH:
            continue
        mult, off = _hash_params(gen_idx)
        nullable = name.startswith("intra_") and gen_idx % 3 == 0
        out.append((name, mult, off, nullable))
        gen_idx += 1
    return out


def with_cross_features(df: DataFrame) -> DataFrame:
    """Attach the 38-column cross surface; passthrough columns must already
    exist on ``df`` (they do for any bars-derived relation)."""
    cols = {}
    for name, mult, off, nullable in _generated():
        val = (_uniform(mult, off) - F.lit(0.5)).alias(name)
        if nullable:
            # independent multiplier for the NULL gate: offset-shifted
            # hashes are fully correlated mod P, multiplier-shifted ones
            # are not (difference spreads with rn)
            gate = _uniform(mult + 7, off)
            val = F.when(gate < F.lit(_NULL_RATE), F.lit(None).cast("double")).otherwise(
                _uniform(mult, off) - F.lit(0.5)
            )
        cols[name] = val
    return df.withColumns(cols)


def cross_feat_cte(source: str = "featg", name: str = "featx") -> str:
    """DuckDB twin: ``featx AS (SELECT source.*, <38-col surface> ...)``."""
    exprs = []
    for col, mult, off, nullable in _generated():
        u = f"{_uniform_sql(mult, off)} - 0.5"
        if nullable:
            gate = _uniform_sql(mult + 7, off)
            exprs.append(f"CASE WHEN {gate} < {_NULL_RATE} THEN NULL ELSE {u} END AS {col}")
        else:
            exprs.append(f"{u} AS {col}")
    body = ",\n        ".join(exprs)
    return f"""{name} AS (
    SELECT {source}.*,
        {body}
    FROM {source}
)"""
