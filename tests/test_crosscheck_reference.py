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


def _r6(x: float) -> float:
    return round(x, 6)


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _cos6(a, b):
    import math

    den = math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b))
    return _r6(_dot(a, b) / den)


def _ref_logreg(rows, iters, lr):
    """Reference batch-GD logistic regression: integer-scaled exact
    moment/gradient sums, round-6 standardization, round-6 sigmoid,
    round-6 weight updates, exact-fixed-point early stop — plain dicts
    and loops re-derived from the operator's documented math."""
    import math

    n = float(len(rows))
    nf = len(rows[0][1])

    def i6(x):
        return int(round(x * 1_000_000))

    mu = [
        _r6(float(sum(i6(r[1][j]) for r in rows)) / 1e6 / n)
        for j in range(nf)
    ]
    sd = [
        _r6(
            math.sqrt(
                float(sum(i6(r[1][j] - mu[j]) ** 2 for r in rows)) / 1e12 / n
            )
        )
        for j in range(nf)
    ]
    feats = [
        (
            [_r6((x - m) / s) if s > 0 else 0.0 for x, m, s in zip(r[1], mu, sd)],
            r[2],
        )
        for r in rows
    ]
    w = [0.0] * (nf + 1)
    for _ in range(iters):
        resid = []
        for x, y in feats:
            z = w[0]
            for j in range(nf):
                z = z + w[j + 1] * x[j]
            resid.append((_r6(1.0 / (1.0 + math.exp(-z))) - y, x))
        g = [_r6(float(sum(i6(r) for r, _ in resid)) / 1e6 / n)]
        for j in range(nf):
            g.append(
                _r6(
                    float(sum(i6(r) * i6(x[j]) for r, x in resid)) / 1e12 / n
                )
            )
        new = [_r6(wj - lr * gj) for wj, gj in zip(w, g)]
        if new == w:
            break
        w = new
    return w, mu, sd


def test_logreg_matches_pure_python_reference(spark):
    """VERDICT r9 #7: third implementation of the 12-step GD trainer.
    The engine's feature frame is the INPUT (those columns are already
    DuckDB-certified through text_repetition / logreg_quality_scores);
    what this pins is the trainer math — moments, standardization,
    sigmoid, gradient folds, updates, early stop."""
    from rangebar_patterns_spark.operators.classifier import (
        LOGREG_FEATURES,
        LOGREG_ITERS,
        LOGREG_LR,
        logreg_features,
        logreg_train,
    )

    raw = logreg_features(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    rows = sorted(
        (r.doc_id, [r[c] for c in LOGREG_FEATURES], r.y)
        for r in raw.collect()
    )
    ref_w, ref_mu, ref_sd = _ref_logreg(rows, LOGREG_ITERS, LOGREG_LR)
    got_w, got_mu, got_sd = logreg_train(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    )
    assert got_mu == ref_mu and got_sd == ref_sd
    assert got_w == ref_w, (got_w, ref_w)


def _ref_kmeans_parallel_seed(vectors, k, rounds, oversample):
    """Reference k-means|| seeding (Bahmani et al. 2012, the engine's
    deterministic variant): per-round round-6 cosine assignment cost,
    md5-coin sampling against l*cost/total, vec_id-ordered candidate
    appends with first-occurrence dedup, then greedy weighted
    farthest-point reduction with first-index tie-breaks."""
    import math

    def r6v(v):
        return [round(x, 6) for x in v]

    def best_cos(v, cand):
        # max by (cos, -cid): ties take the smallest candidate index
        return max(
            (( _cos6(v, cv), -ci) for ci, cv in enumerate(cand)),
        )

    first = vectors[0]
    cand = [r6v(first[1])]
    l = oversample * k
    for rnd in range(rounds):
        costs = {vid: 1.0 - best_cos(v, cand)[0] for vid, v in vectors}
        tot = 0.0
        for vid, _ in vectors:
            tot = tot + costs[vid]
        if not tot or tot <= 0.0:
            break
        picked = [
            vid
            for vid, _ in vectors
            if _md5_long(f"kmeanspp|{rnd}|{vid}") / float(1 << 60)
            < min(1.0, float(l) * costs[vid] / float(tot))
        ]
        by_id = dict(vectors)
        for vid in sorted(picked):
            cand.append(r6v(by_id[vid]))
        seen = {}
        for c in cand:
            seen.setdefault(tuple(c), c)
        cand = list(seen.values())
    assert len(cand) > k  # fixture must exercise the main path
    weights = [0.0] * len(cand)
    for vid, v in vectors:
        weights[-best_cos(v, cand)[1]] += 1.0
    cn = []
    for c in cand:
        nrm = math.sqrt(_dot(c, c)) or 1.0
        cn.append([x / nrm for x in c])
    d2 = [
        [(1.0 - min(1.0, max(-1.0, _dot(a, b)))) ** 2 for b in cn] for a in cn
    ]
    chosen = [max(range(len(cand)), key=lambda i: weights[i])]
    while len(chosen) < k:
        score = [
            -1.0 if i in chosen else weights[i] * min(d2[i][j] for j in chosen)
            for i in range(len(cand))
        ]
        chosen.append(max(range(len(cand)), key=lambda i: score[i]))
    return [cand[i] for i in chosen]


def test_kmeans_parallel_seed_matches_pure_python_reference(spark):
    """VERDICT r9 #7: third implementation of the k-means|| seeder (its
    DuckDB twin is deliberately not maintained — SURVEY-sanctioned
    opt-in path — so the pure-Python reference is its only independent
    check)."""
    from rangebar_patterns_spark.operators.similarity import (
        KMEANSPP_OVERSAMPLE,
        KMEANSPP_ROUNDS,
        _kmeans_vecs,
        kmeans_parallel_seed,
    )

    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    vectors = sorted(
        (vid, [float(x) for x in emb])
        for vid, emb in zip(tbl["vec_id"], tbl["embedding"])
    )
    ref = _ref_kmeans_parallel_seed(
        vectors, 8, KMEANSPP_ROUNDS, KMEANSPP_OVERSAMPLE
    )
    got = kmeans_parallel_seed(
        _kmeans_vecs(spark.read.parquet(f"{SF_DIR}/embeddings.parquet")), k=8
    )
    assert got == ref


# ---------------------------------------------------------------------------
# Sketch bit math (VERDICT r10 #5): CMS bucket/min, KMV k-th-minimum
# estimator, HLL register/rho + integer-scaled harmonic sum.  The DuckDB
# twins were the only independent check of these integer conventions
# (md5-prefix 60-bit hash, bin-width rho, 2^(rho_max-mj) scaling); the
# dict-and-loop references below re-derive them from the papers.
# ---------------------------------------------------------------------------


def _h60(s: str) -> int:
    """The shared cross-engine md5-prefix hash: 15 hex chars -> 60-bit int."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(words: list[str], n: int = 3) -> list[str]:
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


def test_cms_heavy_hitters_match_pure_python_reference(spark):
    """Count-Min bit math: row-d bucket = md5('cms{d}:'||gram) mod W,
    cell = sum of gram counts per (d, bucket), point estimate = min over
    the D rows — rebuilt with plain dicts from the corpus text."""
    from rangebar_patterns_spark.operators.sketches import (
        CMS_D,
        CMS_W,
        HH_TOP,
        heavy_hitters_panel,
    )

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    counts: Counter = Counter()
    for t in docs["text"]:
        counts.update(_grams(_words(t)))

    cells: Counter = Counter()
    for gram, cnt in counts.items():
        for d in range(CMS_D):
            cells[(d, _h60(f"cms{d}:{gram}") % CMS_W)] += cnt

    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:HH_TOP]
    expect = []
    for rank, (gram, cnt) in enumerate(top, 1):
        est = min(cells[(d, _h60(f"cms{d}:{gram}") % CMS_W)] for d in range(CMS_D))
        expect.append((rank, gram, cnt, est, est - cnt))

    got = [
        tuple(r)
        for r in heavy_hitters_panel(
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ).collect()
    ]
    assert got == expect
    # the panel certifies real collision error: some overcount must be > 0
    assert any(row[4] > 0 for row in got)


def _ref_hll_estimate(hashes: set[int], p: int, alpha_mm: float) -> tuple[int, float]:
    """(zero_regs, estimate): HLL from a distinct-hash set — top-p bits
    register, rho = leading-zero count (+1) of the 60-p remainder, the
    integer-scaled harmonic sum the engine uses (exact, order-free)."""
    import math

    m = 1 << p
    w_bits = 60 - p
    rho_max = w_bits + 1
    regs: dict[int, int] = {}
    for h in hashes:
        reg = h >> w_bits
        w = h & ((1 << w_bits) - 1)
        rho = rho_max if w == 0 else rho_max - w.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    zeros = m - len(regs)
    s_int = sum(1 << (rho_max - mj) for mj in regs.values()) + zeros * (1 << rho_max)
    s = float(s_int) / float(1 << rho_max)
    e_raw = alpha_mm / s
    if e_raw <= 2.5 * m and zeros > 0:
        return zeros, round(float(m) * math.log(float(m) / float(zeros)), 6)
    return zeros, round(e_raw, 6)


def _ref_kmv_estimate(hashes: set[int], k: int) -> tuple[int, float]:
    """(kmv_k, estimate): k smallest distinct hashes; (K-1)*2^60/h_(K),
    exact-count fallback below K."""
    kmin = sorted(hashes)[:k]
    if len(kmin) < k:
        return len(kmin), float(len(kmin))
    return k, round(float((k - 1) * (1 << 60)) / float(kmin[-1]), 6)


def test_distinct_sketches_match_pure_python_reference(spark):
    """KMV + HLL over the word and shingle spaces, per source AND the
    merged __all__ row — the merge laws (k-min union / register max)
    re-derived with sets and dicts.  Pins every column the gate entry
    hashes: exact counts, estimates, and round-6 relative errors."""
    from rangebar_patterns_spark.operators.sketches import (
        HLL_ALPHA_MM,
        HLL_P,
        KMV_K,
        distinct_sketch_panel,
    )

    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    occ: Counter = Counter()          # (source, item) -> occurrences
    hsets: dict[tuple[str, str], set[int]] = {}
    for src, t in zip(docs["source"], docs["text"]):
        ws = _words(t)
        for item, vals in (("word", ws), ("shingle", _grams(ws))):
            occ[(src, item)] += len(vals)
            hsets.setdefault((src, item), set()).update(_h60(v) for v in vals)

    def panel_row(source, item, n_items, hashes):
        exact = len(hashes)
        kmv_k, kmv_est = _ref_kmv_estimate(hashes, KMV_K)
        zeros, hll_est = _ref_hll_estimate(hashes, HLL_P, HLL_ALPHA_MM)
        return (
            source, item, n_items, exact,
            kmv_k, kmv_est, round(kmv_est / exact - 1.0, 6),
            zeros, hll_est, round(hll_est / exact - 1.0, 6),
        )

    expect = [
        panel_row(src, item, occ[(src, item)], hs)
        for (src, item), hs in hsets.items()
    ]
    # the merged corpus row is built the way the ENGINE builds it: union
    # of per-source k-min sets (k-th minimum of the union equals the
    # global one — every global top-K hash is in its source's top-K) and
    # register max across sources; exact ground truth from the true union
    for item in ("word", "shingle"):
        union_kmin: set[int] = set()
        true_union: set[int] = set()
        n_items = 0
        for (src, it), hs in hsets.items():
            if it != item:
                continue
            union_kmin.update(sorted(hs)[:KMV_K])
            true_union.update(hs)
            n_items += occ[(src, it)]
        kmv_k, kmv_est = _ref_kmv_estimate(union_kmin, KMV_K)
        zeros, hll_est = _ref_hll_estimate(true_union, HLL_P, HLL_ALPHA_MM)
        exact = len(true_union)
        expect.append((
            "__all__", item, n_items, exact,
            kmv_k, kmv_est, round(kmv_est / exact - 1.0, 6),
            zeros, hll_est, round(hll_est / exact - 1.0, 6),
        ))

    got = [
        tuple(r)
        for r in distinct_sketch_panel(
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ).collect()
    ]
    assert sorted(got) == sorted(expect)


def test_bloom_decontamination_matches_pure_python_reference(spark):
    """Reference Bloom filter (Bloom 1970) with plain Python ints: build
    the per-benchmark-part partial bit arrays, OR-merge them, probe the
    corpus — every filter-row column (inserted counts, popcounts, packed
    md5) and every doc-grain bloom count must match the Spark panel
    bit-for-bit."""
    from pyspark.sql import functions as F

    from rangebar_patterns_spark.operators.textops import (
        BENCHMARK_MOD,
        BENCHMARK_RESIDUE,
        BLOOM_BITS_PER_ELEM,
        BLOOM_K,
        BLOOM_MIN_WORDS,
        BLOOM_SALT,
        BLOOM_WORD_BITS,
        CONTAMINATION_RATIO,
        benchmark_overlap_bloom,
    )

    def hexint(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def shingles(text: str) -> set[int]:
        ws = _words(text)
        return {
            hexint(" ".join(ws[i : i + 3])) for i in range(len(ws) - 2)
        }

    tbl = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    bench: dict[str, set[int]] = {}
    corpus: dict[int, set[int]] = {}
    for doc_id, text in zip(tbl["doc_id"], tbl["text"]):
        if doc_id % BENCHMARK_MOD == BENCHMARK_RESIDUE:
            bench[f"doc:{doc_id}"] = shingles(text)
        else:
            corpus[doc_id] = shingles(text)

    glob = set().union(*bench.values())
    m_words = max(
        BLOOM_MIN_WORDS,
        (len(glob) * BLOOM_BITS_PER_ELEM + BLOOM_WORD_BITS - 1)
        // BLOOM_WORD_BITS,
    )
    m_bits = m_words * BLOOM_WORD_BITS

    def positions(sh: int) -> list[int]:
        return [
            hexint(f"{BLOOM_SALT}:{i}:{sh}") % m_bits for i in range(BLOOM_K)
        ]

    def build(shs: set[int]) -> list[int]:
        words = [0] * m_words
        for sh in shs:
            for p in positions(sh):
                words[p // BLOOM_WORD_BITS] |= 1 << (p % BLOOM_WORD_BITS)
        return words

    def w_hash(words: list[int]) -> str:
        return hashlib.md5(",".join(str(w) for w in words).encode()).hexdigest()

    part_words = {part: build(shs) for part, shs in bench.items()}
    merged = [0] * m_words
    for words in part_words.values():
        merged = [a | b for a, b in zip(merged, words)]
    # merge law in the reference too: OR of partials == global build
    assert merged == build(glob)

    expect_filters = {}
    for part, words in {**part_words, "__merged__": merged}.items():
        n_ins = len(glob) if part == "__merged__" else len(bench[part])
        bits = sum(bin(w).count("1") for w in words)
        expect_filters[part] = (
            n_ins, bits, round(bits / m_bits, 6), m_bits, w_hash(words),
        )

    def bloom_hit(sh: int) -> bool:
        return all(
            (merged[p // BLOOM_WORD_BITS] >> (p % BLOOM_WORD_BITS)) & 1
            for p in positions(sh)
        )

    expect_docs = {}
    for doc_id, shs in corpus.items():
        n_cont = len(shs & glob)
        n_bloom = sum(1 for sh in shs if bloom_hit(sh))
        n = len(shs)
        er = round(n_cont / n, 6) if n else 0.0
        br = round(n_bloom / n, 6) if n else 0.0
        expect_docs[doc_id] = (
            n, n_cont, er, str(er >= CONTAMINATION_RATIO).lower(),
            n_bloom, br, str(br >= CONTAMINATION_RATIO).lower(),
            n_bloom - n_cont,
            str(br >= CONTAMINATION_RATIO and not er >= CONTAMINATION_RATIO
                ).lower(),
        )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    is_bench = F.col("doc_id") % BENCHMARK_MOD == BENCHMARK_RESIDUE
    rows = benchmark_overlap_bloom(
        docs.filter(~is_bench), docs.filter(is_bench)
    ).collect()
    got_filters = {
        r.part: (r.n_shingles, r.n_bloom, r.bloom_ratio, r.bloom_m,
                 r.bloom_hash)
        for r in rows
        if r.row_kind == "filter"
    }
    got_docs = {
        r.doc_id: (r.n_shingles, r.n_contaminated, r.contamination_ratio,
                   r.is_contaminated, r.n_bloom, r.bloom_ratio,
                   r.is_contaminated_bloom, r.n_false_pos, r.fp_flag)
        for r in rows
        if r.row_kind == "doc"
    }
    assert got_filters == expect_filters
    assert got_docs == expect_docs
