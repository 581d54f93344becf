"""Formation (pattern) predicates — SURVEY.md §2.2 P3, §2.10 E27.

Each formation is a pure boolean Column over the lag chain produced by
``with_bar_features`` (AP-15 convention: current row = last pattern bar).
Semantics mirror the reference's dual-engine definitions
(backtest/backtesting_py/gen600_strategy.py:61-148 and the gen600 SQL
templates); ``wickless`` means opposite_wick_pct < 0.001 with NULL wick
excluded.

Formations are *data*, not code, to the sweep engine: ``FORMATIONS`` keys
become rows of a config DataFrame (see operators/sweep.py), which is how
the reference's 22-template × sed-substitution harness collapses into one
parameterized plan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_WICKLESS_EPS = 0.001


def _d(i: int) -> Column:
    return F.col("direction") if i == 0 else F.col(f"dir_{i}")


def _wickless(i: int) -> Column:
    wick = F.col("opposite_wick_pct") if i == 0 else F.col(f"wick_{i}")
    return wick.isNotNull() & (wick < _WICKLESS_EPS)


def f_2down() -> Column:
    return (_d(1) == 0) & (_d(0) == 0)


def f_3down() -> Column:
    return (_d(2) == 0) & (_d(1) == 0) & (_d(0) == 0)


def f_udd() -> Column:
    return (_d(2) == 1) & (_d(1) == 0) & (_d(0) == 0)


def f_dud() -> Column:
    return (_d(2) == 0) & (_d(1) == 1) & (_d(0) == 0)


def f_wl1d() -> Column:
    return (_d(0) == 0) & _wickless(0)


def f_wl2d() -> Column:
    return (_d(1) == 0) & (_d(0) == 0) & _wickless(0) & _wickless(1)


FORMATIONS = {
    "2down": f_2down,
    "3down": f_3down,
    "udd": f_udd,
    "dud": f_dud,
    "wl1d": f_wl1d,
    "wl2d": f_wl2d,
}


def eligibility(warmup: int) -> Column:
    """Warmup/NULL eligibility gate applied before aggregation (P4):
    lag chain filled, no-lookahead threshold warmed up and positive,
    ``bar_count > warmup`` (gen111_true_nolookahead.sql:92-96)."""
    return (
        F.col("dir_1").isNotNull()
        & F.col("ti_p95_prior").isNotNull()
        & (F.col("ti_p95_prior") > 0)
        & (F.col("bar_count") > warmup)
    )


def champion_signal() -> Column:
    """The reference's champion predicate (gen111): 2-down formation +
    trade_intensity above the no-lookahead expanding p95 + positive Kyle
    lambda.  Apply together with :func:`eligibility`.

    Reference: sql/gen111_true_nolookahead.sql:80-96.
    """
    return (
        f_2down()
        & (F.col("trade_intensity") > F.col("ti_p95_prior"))
        & (F.col("kyle_lambda_proxy") > 0)
    )
