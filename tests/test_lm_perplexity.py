"""Bigram-LM perplexity filter: oracle compare + semantic invariants."""

from __future__ import annotations

from rangebar_patterns_spark.operators.textops import lm_perplexity
from rangebar_patterns_spark.plans.textops_oracle import lm_perplexity_sql
from rangebar_patterns_spark.sources.tables import load_table

from conftest import SF_DIR, compare_frames


def test_matches_oracle(spark, duck):
    sp = lm_perplexity(load_table(spark, SF_DIR, "documents"))
    du = duck.execute(lm_perplexity_sql()).df()
    compare_frames(sp, du)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_repetitive_text_is_less_surprising(spark):
    """A document made of the corpus's dominant bigram must score a
    higher avg logprob (lower pseudo-perplexity) than one of unique
    transitions."""
    rows = {
        r.doc_id: r
        for r in lm_perplexity(
            _docs(
                spark,
                ["a b " * 20, "a b " * 20, "q r s t u v w x y z", ""],
            )
        ).collect()
    }
    assert rows[0].avg_logprob > rows[2].avg_logprob
    assert rows[0].pseudo_ppl < rows[2].pseudo_ppl
    # empty/1-word docs: no bigrams, neutral score
    assert rows[3].n_bigrams == 0 and rows[3].avg_logprob == 0.0


def test_scores_are_partition_invariant(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = lm_perplexity(docs).orderBy("doc_id").collect()
    b = lm_perplexity(docs.repartition(17, "lang")).orderBy("doc_id").collect()
    assert a == b
