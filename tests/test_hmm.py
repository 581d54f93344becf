"""E24 HMM regime labels — deterministic unit contract (the rows-only
catalog entry's correctness gate; EM is not SQL-expressible)."""

from __future__ import annotations

import collections

import numpy as np

from conftest import SF_DIR


def test_fit_predict_recovers_planted_regimes():
    from rangebar_patterns_spark.operators.hmm import fit_predict_1d

    rng = np.random.default_rng(7)
    x = np.concatenate(
        [
            rng.normal(0.3, 0.03, 300),
            rng.normal(0.5, 0.03, 300),
            rng.normal(0.7, 0.03, 300),
        ]
    )
    labels, means = fit_predict_1d(x)
    # ascending-mean label convention
    assert (np.diff(means) > 0).all()
    # each planted block is dominated by one distinct label
    blocks = [
        collections.Counter(labels[i : i + 300]).most_common(1)[0]
        for i in (0, 300, 600)
    ]
    assert [b[0] for b in blocks] == [0, 1, 2]
    assert all(b[1] >= 270 for b in blocks)  # >=90% purity per block
    # bit-deterministic across calls
    l2, m2 = fit_predict_1d(x)
    assert (labels == l2).all() and (means == m2).all()


def test_hmm_regimes_dataframe(spark):
    from rangebar_patterns_spark.operators.hmm import N_REGIMES, hmm_regimes
    from rangebar_patterns_spark.sources.bars import bars_from_events

    out = hmm_regimes(bars_from_events(spark, SF_DIR)).toPandas()
    assert set(out.columns) == {"symbol", "rn", "feature", "regime"}
    assert out.regime.between(0, N_REGIMES - 1).all()
    # one label row per bar
    bars_n = bars_from_events(spark, SF_DIR).count()
    assert len(out) == bars_n
    # run-to-run stability of the full DataFrame path
    out2 = hmm_regimes(bars_from_events(spark, SF_DIR)).toPandas()
    key = ["symbol", "rn"]
    a = out.sort_values(key).reset_index(drop=True)
    b = out2.sort_values(key).reset_index(drop=True)
    assert (a.regime == b.regime).all()
