"""gen06/07/08 hypothesis-screen consistency (value parity is covered by
the catalog oracle sweep)."""

from __future__ import annotations

from conftest import SF_DIR


def test_counts_consistent_and_batteries_complete(spark):
    from rangebar_patterns_spark.operators.hypotheses import HYPOTHESES
    from rangebar_patterns_spark.plans.catalog import QUERIES

    pdf = QUERIES["genx_hypotheses"](spark, SF_DIR).toPandas()
    assert (pdf.signal_count <= pdf.total_bars).all()
    assert (pdf.hits <= pdf.signal_count).all()
    # every combo appears once per symbol, for all three families
    n_symbols = pdf.symbol.nunique()
    assert len(pdf) == len(HYPOTHESES) * n_symbols
    assert set(pdf.family.unique()) == {"gen06", "gen07", "gen08"}
    # sides match the registry
    sides = dict(pdf[["combo_name", "signal_type"]].drop_duplicates().values)
    for h in HYPOTHESES:
        assert sides[h.name] == h.side
