"""Within-document repetition filter (Gopher-style) vs the DuckDB twin,
plus semantic invariants on constructed documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from rangebar_patterns_spark.operators.textops import repetition_stats
from rangebar_patterns_spark.plans.textops_oracle import repetition_sql
from rangebar_patterns_spark.sources.tables import load_table

from conftest import SF_DIR, compare_frames


def test_matches_oracle(spark, duck):
    docs = load_table(spark, SF_DIR, "documents")
    sp = repetition_stats(docs)
    du = duck.execute(repetition_sql()).df()
    compare_frames(sp, du)


def test_plan_is_map_only(spark):
    """The whole point of the HOF formulation: no shuffle, no Python."""
    docs = load_table(spark, SF_DIR, "documents")
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_fully_repeated_doc_saturates(spark):
    out = repetition_stats(_docs(spark, ["spam ham " * 40])).collect()[0]
    assert out.dup_word_frac > 0.9
    assert out.dup_2gram_frac == 1.0  # every 2-gram occurs many times
    assert out.top_2gram_frac > 0.4   # "spam ham" is half of all 2-grams
    assert out.is_repetitive


def test_all_distinct_doc_scores_zero(spark):
    words = " ".join(f"w{i}" for i in range(50))
    out = repetition_stats(_docs(spark, [words])).collect()[0]
    assert out.dup_word_frac == 0.0
    assert out.dup_2gram_frac == 0.0 and out.dup_3gram_frac == 0.0
    assert out.top_2gram_frac == round(1 / 49, 6)
    assert not out.is_repetitive


def test_empty_and_short_docs_are_safe(spark):
    rows = {
        r.doc_id: r
        for r in repetition_stats(_docs(spark, ["", "one", "a b"])).collect()
    }
    assert rows[0].n_words == 0 and rows[0].dup_word_frac == 0.0
    assert rows[1].dup_2gram_frac == 0.0  # no 2-grams in a 1-word doc
    assert rows[2].top_2gram_frac == 1.0  # exactly one 2-gram
    assert not rows[0].is_repetitive


def test_duplicate_occurrences_count_every_copy(spark):
    """A gram appearing 3 times contributes 3 occurrences (Gopher counts
    copies, not excess): 'x y x y x y' has 2-grams [xy, yx, xy, yx, xy]
    -> all 5 duplicated."""
    out = repetition_stats(_docs(spark, ["x y x y x y"])).collect()[0]
    assert out.dup_2gram_frac == 1.0
    assert out.top_2gram_frac == 0.6  # xy appears 3/5


def test_cross_doc_duplication_scenarios(spark):
    """Crafted corpus pins the cross-document exact-substring semantics
    (Lee et al. ExactSubstr, k-gram formulation):

      * doc 0 and doc 1 share one 6-word span -> two 5-grams each, ONE
        merged span, coverage 6/n_words;
      * doc 2 repeats a phrase WITHIN itself only -> no cross-doc signal;
      * doc 3 shares nothing;
      * doc 4 is a full copy of doc 0 -> coverage 1.0, one span.

    The cleaned-view columns (the ACTUAL ExactSubstr dedup output, Lee
    et al. 2021 span removal) are pinned on the same vectors: full
    copies clean to the empty string, a partial overlap excises exactly
    the shared phrase, untouched docs round-trip to their word-joined
    form.
    """
    from rangebar_patterns_spark.operators.textops import (
        cross_doc_duplication,
    )

    shared = "the quick brown fox jumps high"  # 6 words -> 2 dup 5-grams
    docs = spark.createDataFrame(
        [
            (0, f"{shared} alpha beta gamma delta"),
            (1, f"zero one two {shared} nine ten"),
            (2, "rep rep rep rep rep rep rep rep unique tail words here"),
            (3, "completely different content with no overlap at all ok"),
            (4, f"{shared} alpha beta gamma delta"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in cross_doc_duplication(docs).collect()}

    # doc 0 == doc 4 (full copies): every gram duplicated, one span
    for d in (0, 4):
        r = out[d]
        assert r.n_grams_cross == 6  # 10 words -> 6 5-grams
        assert r.n_dup_grams_cross == 6
        assert r.dup_token_coverage == 1.0
        assert r.n_dup_spans == 1
        assert r.tokens_removed == 10 and r.cleaned_len == 0
        assert r.cleaned_text == ""
    # doc 1 shares exactly the 6-word phrase: 2 dup grams, 6 of 11 words
    r1 = out[1]
    assert r1.n_dup_grams_cross == 2
    assert r1.n_dup_spans == 1
    assert r1.dup_token_coverage == round(6 / 11, 6)
    assert r1.tokens_removed == 6 and r1.cleaned_len == 5
    assert r1.cleaned_text == "zero one two nine ten"
    # within-doc repetition alone is NOT cross-doc duplication
    assert out[2].n_dup_grams_cross == 0
    assert out[2].dup_token_coverage == 0.0
    assert out[3].n_dup_grams_cross == 0
    assert out[3].n_dup_spans == 0
    # untouched docs keep every word (canonical single-space join)
    assert out[2].tokens_removed == 0
    assert out[2].cleaned_text == "rep rep rep rep rep rep rep rep unique tail words here"
    assert out[3].cleaned_len == 9


def test_cross_doc_duplication_property(spark):
    """Property test: the distributed k-gram formulation must equal a
    brute-force python spec (gram -> doc-set index, interval union) on
    random corpora over a tiny vocabulary (forcing heavy cross-doc
    collisions), including empty docs and docs shorter than k."""
    import random

    from rangebar_patterns_spark.operators.textops import (
        CROSS_DUP_K,
        cross_doc_duplication,
    )

    k = CROSS_DUP_K
    rng = random.Random(8)
    vocab = ["a", "b", "c"]
    for trial in range(3):
        texts = [
            (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 14))))
            for d in range(12)
        ]

        # --- brute-force spec -------------------------------------------
        gram_docs: dict[tuple, set] = {}
        doc_grams: dict[int, list] = {}
        for d, t in texts:
            ws = [w for w in t.split(" ") if w]
            gs = [tuple(ws[i : i + k]) for i in range(len(ws) - k + 1)]
            doc_grams[d] = gs
            for g in gs:
                gram_docs.setdefault(g, set()).add(d)
        dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
        expect = {}
        for d, t in texts:
            ws = [w for w in t.split(" ") if w]
            gs = doc_grams[d]
            ps = [i + 1 for i, g in enumerate(gs) if g in dup]
            covered, spans, prev_end = set(), 0, None
            for p in ps:
                covered.update(range(p, p + k))
                if prev_end is None or p > prev_end:
                    spans += 1
                prev_end = p + k  # next gram adjacent-or-overlapping joins
            expect[d] = (
                len(gs),
                len(ps),
                round(len(ps) / len(gs), 6) if gs else None,
                round(len(covered) / len(ws), 6) if ps else 0.0,
                spans,
                len(covered),
                len(ws) - len(covered),
                " ".join(w for i, w in enumerate(ws, 1) if i not in covered),
            )

        got = {
            r.doc_id: (
                r.n_grams_cross,
                r.n_dup_grams_cross,
                r.dup_gram_frac_cross,
                r.dup_token_coverage,
                r.n_dup_spans,
                r.tokens_removed,
                r.cleaned_len,
                r.cleaned_text,
            )
            for r in cross_doc_duplication(
                spark.createDataFrame(texts, "doc_id long, text string")
            ).collect()
        }
        assert got == expect, f"trial {trial}: {got} != {expect}"


def test_cross_doc_adjacent_spans_merge(spark):
    """Two duplicated grams whose starts are exactly k apart cover
    contiguous text (positions [p, p+k-1] and [p+k, p+2k-1]) — that is
    ONE maximal duplicated span, not two.  Doc 0 = S1+S2 back to back;
    S1 is shared with doc 1, S2 with doc 2, and the straddling grams are
    unique, so doc 0's dup gram starts are exactly {1, 6} with k=5."""
    from rangebar_patterns_spark.operators.textops import (
        cross_doc_duplication,
    )

    s1 = "alpha beta gamma delta epsilon"
    s2 = "zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (0, f"{s1} {s2}"),
            (1, f"{s1} filler1 filler2 filler3 filler4 filler5"),
            (2, f"filler6 filler7 filler8 filler9 filler10 {s2}"),
        ],
        "doc_id long, text string",
    )
    r0 = {r.doc_id: r for r in cross_doc_duplication(docs).collect()}[0]
    assert r0.n_dup_grams_cross == 2
    assert r0.dup_token_coverage == 1.0  # contiguous: all 10 words
    assert r0.n_dup_spans == 1  # adjacency merges
    assert r0.tokens_removed == 10 and r0.cleaned_text == ""
