"""E24 HMM market-regime labels (reference eval/walk_forward.py:906-961):
3-state Gaussian HMM on a roughness/volatility feature (the reference uses
``lookback_hurst``; the bars adapter exposes ``intra_hurst``), diagnostic
only — never feeds barrier selection.

The reference wraps ``hmmlearn.GaussianHMM(random_state=42)``; hmmlearn is
unavailable here and its k-means initialization is not reproducible across
engines anyway.  This is a self-contained numpy Baum-Welch (diagonal/scalar
covariance, 1-D observations) with *deterministic* initialization — state
means at the feature's 1/6, 3/6, 5/6 quantiles, shared variance, 0.8
self-transition prior — then Viterbi labels, so results are bit-stable
run to run.  NaNs are median-filled exactly as the reference does
(walk_forward.py:942-947); degenerate series (< 10·n_states valid rows)
label everything regime 0, matching the reference's fallback.

Runs per (symbol) ordered group via ``applyInPandas`` — the sanctioned
Python path for iterative algorithms (SURVEY.md §2.10).  Registered as a
rows-only catalog entry: EM is the documented non-SQL-expressible case, so
the correctness gate is the deterministic unit contract
(tests/test_hmm.py) rather than a DuckDB twin.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

N_REGIMES = 3  # reference config.WF_N_REGIMES
N_ITER = 40  # converges in well under this for separated regimes
MIN_VALID_FACTOR = 10  # walk_forward.py:944 valid < n_regimes*10 -> all zeros
#: EM fits on a deterministic stride-subsample capped at this many points
#: (the forward-backward recursions are per-timestep Python loops — fitting
#: on 20k+ bars costs ~30s/symbol for a diagnostic; 2k points estimate the
#: same 3 means/variances, and Viterbi still labels every bar)
MAX_FIT_POINTS = 2_000
_EPS = 1e-300
_MIN_VAR = 1e-10

_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("rn", LongType()),
        StructField("feature", DoubleType()),
        StructField("regime", LongType()),
    ]
)


def fit_predict_1d(x: np.ndarray, n_states: int = N_REGIMES, n_iter: int = N_ITER):
    """Baum-Welch + Viterbi for 1-D Gaussian emissions, deterministic init.
    Returns (labels, means) — labels are Viterbi states reindexed so that
    state means are ascending (stable label semantics).  EM runs on a
    stride-subsample when the series exceeds MAX_FIT_POINTS; Viterbi always
    labels the full series."""
    full_x = x
    if len(x) > MAX_FIT_POINTS:
        stride = -(-len(x) // MAX_FIT_POINTS)  # ceil
        x = x[::stride]
    n = len(x)
    qs = np.quantile(x, [(2 * k + 1) / (2 * n_states) for k in range(n_states)])
    mu = qs.astype(float)
    var = np.full(n_states, max(float(np.var(x)), _MIN_VAR))
    pi = np.full(n_states, 1.0 / n_states)
    a = np.full((n_states, n_states), 0.2 / (n_states - 1))
    np.fill_diagonal(a, 0.8)

    def emis():
        # (n, k) Gaussian densities
        d = x[:, None] - mu[None, :]
        return np.exp(-0.5 * d * d / var[None, :]) / np.sqrt(2 * np.pi * var[None, :])

    for _ in range(n_iter):
        b = emis() + _EPS
        # scaled forward-backward
        alpha = np.zeros((n, n_states))
        c = np.zeros(n)
        alpha[0] = pi * b[0]
        c[0] = alpha[0].sum() + _EPS
        alpha[0] /= c[0]
        for t in range(1, n):
            alpha[t] = (alpha[t - 1] @ a) * b[t]
            c[t] = alpha[t].sum() + _EPS
            alpha[t] /= c[t]
        beta = np.zeros((n, n_states))
        beta[-1] = 1.0
        for t in range(n - 2, -1, -1):
            beta[t] = (a @ (b[t + 1] * beta[t + 1])) / c[t + 1]
        gamma = alpha * beta
        gamma /= gamma.sum(axis=1, keepdims=True) + _EPS
        # under this scaling convention (alpha normalized by c[t], beta divided
        # by c[t+1]) each xi slice needs the 1/c[t+1] factor too, else every
        # timestep's transition counts are weighted by its likelihood scale and
        # the M-step transition matrix is biased
        xi_num = np.einsum(
            "ti,ij,tj->ij", alpha[:-1], a, (b[1:] * beta[1:]) / c[1:, None]
        )
        a_new = xi_num / (gamma[:-1].sum(axis=0)[:, None] + _EPS)
        a_new /= a_new.sum(axis=1, keepdims=True) + _EPS
        w = gamma.sum(axis=0) + _EPS
        mu_new = (gamma * x[:, None]).sum(axis=0) / w
        d = x[:, None] - mu_new[None, :]
        var_new = np.maximum((gamma * d * d).sum(axis=0) / w, _MIN_VAR)
        pi = gamma[0] / (gamma[0].sum() + _EPS)
        if np.allclose(mu, mu_new, atol=1e-8) and np.allclose(a, a_new, atol=1e-8):
            mu, var, a = mu_new, var_new, a_new
            break
        mu, var, a = mu_new, var_new, a_new

    # Viterbi in log space over the FULL series
    x = full_x
    nf = len(x)
    d = x[:, None] - mu[None, :]
    dens = np.exp(-0.5 * d * d / var[None, :]) / np.sqrt(2 * np.pi * var[None, :])
    logb = np.log(dens + _EPS)
    loga = np.log(a + _EPS)
    delta = np.log(pi + _EPS) + logb[0]
    psi = np.zeros((nf, n_states), dtype=int)
    for t in range(1, nf):
        scores = delta[:, None] + loga
        psi[t] = scores.argmax(axis=0)
        delta = scores.max(axis=0) + logb[t]
    states = np.zeros(nf, dtype=int)
    states[-1] = int(delta.argmax())
    for t in range(nf - 2, -1, -1):
        states[t] = psi[t + 1][states[t + 1]]
    # reindex so labels follow ascending state means
    order = np.argsort(mu)
    remap = np.empty(n_states, dtype=int)
    remap[order] = np.arange(n_states)
    return remap[states], mu[order]


def hmm_regimes(
    bars: DataFrame, feature_col: str = "intra_hurst", n_states: int = N_REGIMES
) -> DataFrame:
    """Per-symbol 3-state HMM regime labels over ``feature_col``."""
    import pandas as pd

    def run(pdf):
        pdf = pdf.sort_values("rn").reset_index(drop=True)
        x = pdf[feature_col].to_numpy(dtype="float64")
        valid = ~np.isnan(x)
        if valid.sum() < n_states * MIN_VALID_FACTOR:
            labels = np.zeros(len(x), dtype=np.int64)
        else:
            med = float(np.median(x[valid]))
            xf = np.where(valid, x, med)
            labels, _ = fit_predict_1d(xf, n_states)
        return pd.DataFrame(
            {
                "symbol": pdf["symbol"],
                "rn": pdf["rn"].astype("int64"),
                "feature": x,
                "regime": labels.astype("int64"),
            }
        )

    return (
        bars.select("symbol", "rn", feature_col)
        .groupBy("symbol")
        .applyInPandas(run, _SCHEMA)
    )
