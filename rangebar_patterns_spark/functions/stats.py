"""Normal-distribution helpers expressed twice (Spark Column + DuckDB SQL)
with identical coefficients and operation order, so eval metrics match the
oracle bit-for-bit (up to libm exp/log/sqrt ulp noise, masked by the
6-decimal output rounding convention).

CDF: Abramowitz & Stegun 7.1.26 erf polynomial (|eps| < 1.5e-7), the
textbook approximation — public-domain constants.
PPF: Acklam's rational approximation (|rel eps| < 1.15e-9), the standard
SQL-portable inverse-normal algorithm.

The reference gets these from scipy (eval/dsr.py:14 ``from scipy.stats
import norm``); scipy is not available here and the polynomial forms keep
the two engines honest anyway.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- A&S 7.1.26 erf ---------------------------------------------------------
_ERF_P = 0.3275911
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def norm_cdf_col(z: Column) -> Column:
    """Phi(z) = 0.5 * (1 + erf(z / sqrt(2))) via A&S 7.1.26."""
    x = F.abs(z) / F.lit(math.sqrt(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_ERF_P) * x)
    a1, a2, a3, a4, a5 = _ERF_A
    poly = (
        F.lit(a1) * t
        + F.lit(a2) * t * t
        + F.lit(a3) * t * t * t
        + F.lit(a4) * t * t * t * t
        + F.lit(a5) * t * t * t * t * t
    )
    erf_abs = F.lit(1.0) - poly * F.exp(-x * x)
    erf = F.when(z < 0, -erf_abs).otherwise(erf_abs)
    return F.lit(0.5) * (F.lit(1.0) + erf)


def norm_cdf_sql(z: str) -> str:
    a1, a2, a3, a4, a5 = _ERF_A
    x = f"(abs({z}) / {math.sqrt(2.0)!r})"
    t = f"(1.0 / (1.0 + {_ERF_P!r} * {x}))"
    poly = (
        f"({a1!r} * {t} + {a2!r} * {t} * {t} + {a3!r} * {t} * {t} * {t}"
        f" + {a4!r} * {t} * {t} * {t} * {t}"
        f" + {a5!r} * {t} * {t} * {t} * {t} * {t})"
    )
    erf_abs = f"(1.0 - {poly} * exp(-{x} * {x}))"
    erf = f"(CASE WHEN {z} < 0 THEN -{erf_abs} ELSE {erf_abs} END)"
    return f"(0.5 * (1.0 + {erf}))"


# --- Acklam inverse normal CDF ---------------------------------------------
_PPF_A = (-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
          1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00)
_PPF_B = (-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
          6.680131188771972e01, -1.328068155288572e01)
_PPF_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
          -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00)
_PPF_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
          3.754408661907416e00)
_PPF_PLOW = 0.02425


def python_norm_ppf(p: float) -> float:
    """Pure-python Acklam PPF — for embedding constant quantiles (e.g.
    z_alpha for Cornish–Fisher) as literals in BOTH engines."""
    a, b, c, d = _PPF_A, _PPF_B, _PPF_C, _PPF_D
    if not 0.0 < p < 1.0:
        return math.nan
    if p < _PPF_PLOW:
        q = math.sqrt(-2.0 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0
        )
    if p > 1.0 - _PPF_PLOW:
        q = math.sqrt(-2.0 * math.log(1.0 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0
        )
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0
    )


def _horner_col(coeffs: tuple, x: Column) -> Column:
    acc: Column = F.lit(coeffs[0])
    for c in coeffs[1:]:
        acc = acc * x + F.lit(c)
    return acc


def norm_ppf_col(p: Column) -> Column:
    """Acklam PPF as a Column expression (data-dependent quantiles, e.g.
    expected-max-SR z values that depend on the trial count)."""
    a, b, c, d = _PPF_A, _PPF_B, _PPF_C, _PPF_D
    q_low = F.sqrt(F.lit(-2.0) * F.log(p))
    tail_low = _horner_col(c, q_low) / (_horner_col(d, q_low) * q_low + F.lit(1.0))
    q_high = F.sqrt(F.lit(-2.0) * F.log(F.lit(1.0) - p))
    tail_high = -(_horner_col(c, q_high)) / (
        _horner_col(d, q_high) * q_high + F.lit(1.0)
    )
    qc = p - F.lit(0.5)
    rc = qc * qc
    central = _horner_col(a, rc) * qc / (_horner_col(b, rc) * rc + F.lit(1.0))
    return (
        F.when((p <= 0) | (p >= 1), F.lit(None).cast("double"))
        .when(p < _PPF_PLOW, tail_low)
        .when(p > 1.0 - _PPF_PLOW, tail_high)
        .otherwise(central)
    )


def _horner_sql(coeffs: tuple, x: str) -> str:
    acc = repr(coeffs[0])
    for c in coeffs[1:]:
        acc = f"({acc} * {x} + {c!r})"
    return acc


def norm_ppf_sql(p: str) -> str:
    a, b, c, d = _PPF_A, _PPF_B, _PPF_C, _PPF_D
    q_low = f"sqrt(-2.0 * ln({p}))"
    tail_low = f"({_horner_sql(c, q_low)} / ({_horner_sql(d, q_low)} * {q_low} + 1.0))"
    q_high = f"sqrt(-2.0 * ln(1.0 - {p}))"
    tail_high = (
        f"(-({_horner_sql(c, q_high)}) / ({_horner_sql(d, q_high)} * {q_high} + 1.0))"
    )
    qc = f"({p} - 0.5)"
    rc = f"({qc} * {qc})"
    central = f"({_horner_sql(a, rc)} * {qc} / ({_horner_sql(b, rc)} * {rc} + 1.0))"
    return (
        f"(CASE WHEN {p} <= 0 OR {p} >= 1 THEN NULL"
        f" WHEN {p} < {_PPF_PLOW!r} THEN {tail_low}"
        f" WHEN {p} > {1.0 - _PPF_PLOW!r} THEN {tail_high}"
        f" ELSE {central} END)"
    )
