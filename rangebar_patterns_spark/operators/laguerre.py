"""E26 ATR-adaptive Laguerre RSI volatility regimes
(reference src/opendeviationbar_patterns/laguerre.py:42-97, which wraps the
public ``atr-adaptive-laguerre`` package; config defaults
atr_period=14, smoothing_period=5, level_down=0.15, level_up=0.85,
adaptive_offset=0.75).

The filter is a genuinely sequential IIR — each bar's Laguerre state
depends on the previous bar's — so this is one of the few operators where
Python is the right path (SURVEY.md §2.10: ``applyInPandas`` per ordered
(symbol) group).  Scale axis = symbol/threshold partition count; within a
partition the loop is O(n) over ≤ ~1.5M bars.

Algorithm (classic Ehlers adaptive Laguerre, fully specified here so the
DuckDB recursive-CTE twin can mirror it bit-for-bit; every recurrence is
plain +,−,×,÷,max,min on doubles, so identical association order gives
identical bits in both engines):

bar 1 seeds:  tr = high − low; atr = tr; ema = close; L0..L3 = ema;
rsi = 0.
bar t > 1:
    tr     = max(high, prev_close) − min(low, prev_close)
    atr    = (prev_atr · (P−1) + tr) / P                 (Wilder, P=14)
    amin/amax = min/max of the last P atr values (incl. current)
    coeff  = amax > amin ? (atr − amin)/(amax − amin) : 0.5
    period = P · (coeff + adaptive_offset)
    gamma  = 1 − 2/(period + 1)
    ema    = prev_ema + (2/(S+1)) · (close − prev_ema)    (S=5)
    L0 = (1−gamma)·ema + gamma·L0'        L1 = −gamma·L0 + L0' + gamma·L1'
    L2 = −gamma·L1 + L1' + gamma·L2'      L3 = −gamma·L2 + L2' + gamma·L3'
    cu = (max(L0−L1,0) + max(L1−L2,0)) + max(L2−L3,0)
    cd = (max(L1−L0,0) + max(L2−L1,0)) + max(L3−L2,0)
    rsi = cu + cd > 0 ? cu/(cu+cd) : 0
regime: 0 (bear) if rsi < 0.15, 2 (bull) if rsi > 0.85, else 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ATR_PERIOD = 14
SMOOTHING_PERIOD = 5
LEVEL_DOWN = 0.15
LEVEL_UP = 0.85
ADAPTIVE_OFFSET = 0.75

_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("rn", LongType()),
        StructField("close_time_ms", LongType()),
        StructField("laguerre_rsi", DoubleType()),
        StructField("regime", LongType()),
    ]
)


def _laguerre_pdf(pdf):
    import pandas as pd

    pdf = pdf.sort_values("rn").reset_index(drop=True)
    h = pdf["high"].to_numpy(dtype="float64")
    lo = pdf["low"].to_numpy(dtype="float64")
    c = pdf["close"].to_numpy(dtype="float64")
    n = len(pdf)
    rsis = [0.0] * n
    p_ = float(ATR_PERIOD)
    alpha = 2.0 / (float(SMOOTHING_PERIOD) + 1.0)
    if n:
        tr = h[0] - lo[0]
        atr = tr
        atrs = [atr]
        ema = c[0]
        l0 = l1 = l2 = l3 = ema
    for i in range(1, n):
        pc = c[i - 1]
        tr = max(h[i], pc) - min(lo[i], pc)
        atr = (atr * (p_ - 1.0) + tr) / p_
        atrs.append(atr)
        if len(atrs) > ATR_PERIOD:
            atrs.pop(0)
        amin, amax = min(atrs), max(atrs)
        coeff = (atr - amin) / (amax - amin) if amax > amin else 0.5
        period = p_ * (coeff + ADAPTIVE_OFFSET)
        gamma = 1.0 - 2.0 / (period + 1.0)
        ema = ema + alpha * (c[i] - ema)
        l0p, l1p, l2p, l3p = l0, l1, l2, l3
        l0 = (1.0 - gamma) * ema + gamma * l0p
        l1 = -gamma * l0 + l0p + gamma * l1p
        l2 = -gamma * l1 + l1p + gamma * l2p
        l3 = -gamma * l2 + l2p + gamma * l3p
        cu = (max(l0 - l1, 0.0) + max(l1 - l2, 0.0)) + max(l2 - l3, 0.0)
        cd = (max(l1 - l0, 0.0) + max(l2 - l1, 0.0)) + max(l3 - l2, 0.0)
        rsis[i] = cu / (cu + cd) if cu + cd > 0.0 else 0.0
    out = pd.DataFrame(
        {
            "symbol": pdf["symbol"],
            "rn": pdf["rn"].astype("int64"),
            "close_time_ms": pdf["close_time_ms"].astype("int64"),
            "laguerre_rsi": rsis,
        }
    )
    out["regime"] = 1
    out.loc[out["laguerre_rsi"] < LEVEL_DOWN, "regime"] = 0
    out.loc[out["laguerre_rsi"] > LEVEL_UP, "regime"] = 2
    out["regime"] = out["regime"].astype("int64")
    return out


def laguerre_regimes(bars: DataFrame) -> DataFrame:
    """Per-symbol ATR-adaptive Laguerre RSI + regime labels."""
    cols = ["symbol", "rn", "close_time_ms", "high", "low", "close"]
    out = (
        bars.select(*cols)
        .groupBy("symbol")
        .applyInPandas(_laguerre_pdf, schema=_SCHEMA)
    )
    return out.select(
        "symbol",
        "rn",
        "close_time_ms",
        F.round("laguerre_rsi", 6).alias("laguerre_rsi"),
        "regime",
    )
