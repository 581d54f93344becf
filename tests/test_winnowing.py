"""Winnowing fingerprint contract (Schleimer et al. 2003): the locality
guarantee — two documents sharing a word run of length >= SHINGLE_N +
WINNOW_WINDOW - 1 select at least one COMMON fingerprint — plus shape
invariants (value parity with the DuckDB twin is covered by the catalog
sweep via text_metrics)."""

from __future__ import annotations


def _winnow_sets(spark, texts):
    from rangebar_patterns_spark.operators.textops import fingerprints

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = fingerprints(docs).collect()
    return {r.doc_id: (r.n_winnow_fp, r.winnow_fp) for r in rows}


def test_winnow_locality_guarantee(spark):
    """A long shared run forces a shared selected fingerprint: embed the
    same guarantee-length phrase in two otherwise-disjoint documents and
    check their selected SETS intersect (via the full fingerprints
    relation, not just the folded sketch)."""
    from pyspark.sql import functions as F

    from rangebar_patterns_spark.operators.textops import (
        HASH_MOD,
        SHINGLE_N,
        WINNOW_WINDOW,
        fingerprints,
        shingles_col,
        words_col,
    )

    run = " ".join(f"shared{i}" for i in range(SHINGLE_N + WINNOW_WINDOW - 1))
    a = "alpha beta gamma delta " * 6 + run + " epsilon zeta " * 4
    b = "one two three four five " * 7 + run + " six seven " * 5

    docs = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id long, text string"
    )
    # recompute the raw selected sets with the operator's own expressions
    sh = F.transform(
        shingles_col(words=F.col("_w")),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % F.lit(HASH_MOD),
    )
    wins = F.filter(
        F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.lit(1), F.size("_sh") - F.lit(WINNOW_WINDOW - 1)),
            ),
            lambda i: F.array_min(F.slice(F.col("_sh"), i, WINNOW_WINDOW)),
        ),
        lambda x: x.isNotNull(),
    )
    sets = {
        r.doc_id: set(r.w)
        for r in docs.select("doc_id", words_col().alias("_w"))
        .select("doc_id", sh.alias("_sh"))
        .select("doc_id", F.array_distinct(wins).alias("w"))
        .collect()
    }
    assert sets[0] & sets[1], "guarantee-length shared run must share a fingerprint"

    # and the panel columns are consistent with the raw sets
    panel = {r.doc_id: r.n_winnow_fp for r in fingerprints(docs).collect()}
    assert panel[0] == len(sets[0]) and panel[1] == len(sets[1])


def test_winnow_edge_shapes(spark):
    """Degenerate documents: shorter than one shingle -> empty set and a
    zero fold; shorter than the window -> exactly one fingerprint;
    identical docs -> identical sketches."""
    from rangebar_patterns_spark.operators.textops import SHINGLE_N

    short = " ".join(f"w{i}" for i in range(SHINGLE_N - 1))
    one_gram = " ".join(f"w{i}" for i in range(SHINGLE_N))
    dup = "the same exact document body repeated verbatim for the pair"
    s = _winnow_sets(spark, [short, one_gram, dup, dup])
    assert s[0] == (0, 0)
    assert s[1][0] == 1
    assert s[2] == s[3]


def test_gopher_rule_flags(spark):
    """Gopher A1.1 word-based rules on constructed documents: each rule
    fails exactly where the paper's threshold says it should."""
    from rangebar_patterns_spark.operators.textops import (
        GOPHER_MIN_WORDS,
        quality_score,
    )

    good = ("the quick brown fox jumps over a lazy dog and keeps running "
            "to the distant hills in steady rhythm ") * 5
    short = "the quick brown fox is in a tree"
    symbols = " ".join(["###"] * GOPHER_MIN_WORDS) + " the a of and is to in"
    nostop = " ".join(f"zzz{i}" for i in range(GOPHER_MIN_WORDS))
    # exactly-at-threshold doc (paper boundaries KEEP it): 50 words, 40
    # alphabetic (5 carrying one embedded '#' each) + 10 numeric -> alpha
    # frac = 0.8 and hash ratio = 5/50 = 0.1, both on the boundary
    edge = " ".join(
        ["the", "a"]
        + [f"word{i:02d}" for i in range(33)]
        + ["ab#cd"] * 5
        + ["111"] * 10
    )
    docs = spark.createDataFrame(
        [(0, good), (1, short), (2, symbols), (3, nostop), (4, ""), (5, edge)],
        "doc_id long, text string",
    ).selectExpr("doc_id", "text", "CAST(length(text) AS LONG) AS n_chars")
    r = {x.doc_id: x for x in quality_score(docs).collect()}
    assert r[0].gopher_pass
    assert not r[1].rule_word_count and not r[1].gopher_pass
    assert not r[2].rule_symbol_ratio and not r[2].gopher_pass
    assert not r[3].rule_stopwords and not r[3].gopher_pass
    # wordless doc: every per-word rule flag is FALSE, never NULL (the
    # NULL-boolean cross-engine hash pitfall)
    for flag in ("rule_mean_word_len", "rule_alpha_words",
                 "rule_symbol_ratio", "gopher_pass"):
        assert getattr(r[4], flag) is False
    # boundary doc: >= / <= paper semantics keep exactly-at-threshold
    assert r[5].alpha_word_frac == 0.8 and r[5].rule_alpha_words
    assert r[5].hash_word_ratio == 0.1 and r[5].rule_symbol_ratio
    assert r[5].gopher_pass
