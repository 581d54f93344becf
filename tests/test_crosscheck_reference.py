"""Third-implementation crosschecks: pure-Python reference
implementations of the in-engine trainers, compared against the Spark
results on the sf0.001 fixture.  The DuckDB twins already give a second
engine; these rule out a shared misunderstanding encoded into BOTH SQL
dialects (same author, same day) by re-deriving the algorithms from the
papers with plain dicts and loops."""

from __future__ import annotations

import hashlib
from collections import Counter

import pyarrow.parquet as pq

from conftest import SF_DIR


def _words(text: str) -> list[str]:
    return [w for w in text.split(" ") if w != ""]


def _ref_bpe(word_freq: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Reference BPE (Sennrich et al. 2016): greedy pair merging on the
    word-type table, (count desc, left asc, right asc) tie-break."""
    seqs = {w: list(w) for w in word_freq}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, f in word_freq.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append(best)
        a, b = best
        for w in seqs:
            s, out = seqs[w], []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            seqs[w] = out
    return merges


def test_bpe_matches_pure_python_reference(spark):
    from rangebar_patterns_spark.operators.textops import BPE_MERGES, bpe_train

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    freq: Counter = Counter()
    for t in docs["text"]:
        freq.update(_words(t))

    ref = _ref_bpe(dict(freq), BPE_MERGES)
    got = bpe_train(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    assert got == ref, (got, ref)


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_pq_train(vectors, m, ksub, iters):
    """Reference PQ codebook training: first-ksub seeds (round-6),
    round-6 squared-L2 argmin with code tie-break, vec_id-ordered
    sequential-fold means (round-6) — plain loops, left-to-right float
    accumulation exactly like the engine's ordered folds."""
    dim = len(vectors[0][1])
    ds = dim // m
    subs = {
        (vid, j): v[j * ds : (j + 1) * ds] for vid, v in vectors for j in range(m)
    }
    first = sorted(vectors)[:ksub]
    book = {
        (j, c): [round(x, 6) for x in v[j * ds : (j + 1) * ds]]
        for j in range(m)
        for c, (_, v) in enumerate(first)
    }

    def d2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return round(acc, 6)

    for _ in range(iters):
        assign = {}
        for (vid, j), sx in subs.items():
            assign[(vid, j)] = min(
                range(ksub), key=lambda c: (d2(sx, book[(j, c)]), c)
            )
        for j in range(m):
            for c in range(ksub):
                members = sorted(
                    vid for (vid, jj), cc in assign.items() if jj == j and cc == c
                )
                if not members:
                    continue
                cv = []
                for p in range(ds):
                    acc = 0.0
                    for vid in members:
                        acc = acc + subs[(vid, j)][p]
                    cv.append(round(acc / len(members), 6))
                book[(j, c)] = cv
    return book


def test_pq_codebook_matches_pure_python_reference(spark):
    from rangebar_patterns_spark.operators.similarity import (
        PQ_ITERS,
        PQ_KSUB,
        PQ_M,
        pq_train,
    )

    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    vectors = sorted(
        (vid, [float(x) for x in emb])
        for vid, emb in zip(tbl["vec_id"], tbl["embedding"])
    )
    ref = _ref_pq_train(vectors, PQ_M, PQ_KSUB, PQ_ITERS)
    got = pq_train(spark.read.parquet(f"{SF_DIR}/embeddings.parquet"))
    assert len(got) == PQ_M * PQ_KSUB
    for mm, cc, cv in got:
        assert cv == ref[(mm, cc)], (mm, cc, cv[:3], ref[(mm, cc)][:3])
