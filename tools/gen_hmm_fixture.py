"""Regenerate the pinned HMM regime-label fixture (plans/hmm_fixture.json).

The E24 HMM operator is EM-in-Python — the documented non-SQL-expressible
case — so its DuckDB oracle is a bit-stability regression fixture: the
deterministic Viterbi labels, run-length encoded per symbol, pinned at
BOTH correctness scales (sf0.001 for the local pytest gate, sf0.01 for
the driver gate).  The oracle self-selects the fixture by total bar
count.  tests/test_hmm.py pins determinism of the fit itself; this
fixture pins the end-to-end labels the gates compare.  Re-run this
script (and commit the diff) only when the HMM algorithm intentionally
changes.

Usage: python tools/gen_hmm_fixture.py
"""

from __future__ import annotations

import sys

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
OUT = "/root/repo/rangebar_patterns_spark/plans/hmm_fixture.json"


def rle(df) -> list[tuple[str, int, int, int]]:
    segs: list[tuple[str, int, int, int]] = []
    for sym, g in df.groupby("symbol", sort=True):
        prev_regime = None
        for rn, regime in zip(g["rn"], g["regime"]):
            if regime != prev_regime:
                segs.append((sym, int(rn), int(rn), int(regime)))
                prev_regime = regime
            else:
                last = segs[-1]
                segs[-1] = (last[0], last[1], int(rn), last[3])
    return segs


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from rangebar_patterns_spark.plans.catalog import QUERIES
    from rangebar_patterns_spark.session import get_spark

    spark = get_spark("gen-hmm-fixture", master="local[8]", shuffle_partitions=8)
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    import json

    out: dict[str, list[list]] = {}
    for sf_dir in SF_DIRS:
        from rangebar_patterns_spark.plans.catalog import _hmm_regimes_df

        df = (
            _hmm_regimes_df(spark, sf_dir)
            .toPandas()
            .sort_values(["symbol", "rn"])
        )
        segs = rle(df)
        out[str(len(df))] = [list(s) for s in segs]
        print(f"{sf_dir}: {len(segs)} segments over {len(df)} rows")
    with open(OUT, "w") as f:
        json.dump(out, f, indent=0)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
