"""DuckDB oracle twins for the training-data operators (dedup /
similarity / text analysis).  Same md5 hashing, same 1-based slices, same
sequential folds (list_reduce with a prepended init = Spark aggregate
with init), same tie-breaks.
"""

from __future__ import annotations

from ..operators.dedup import (
    COSINE_DUP_THRESHOLD,
    HASH_MOD,
    JACCARD_THRESHOLD,
    LSH_JACCARD_FLOOR,
    MAX_HAMMING,
    MINHASH_BANDS,
    MINHASH_SEEDS,
    SHINGLE_N,
    SIGN_BITS,
    SIMHASH_BITS,
    SIMHASH_CHUNKS,
)
from ..operators.similarity import (
    IVF_NPROBE,
    IVF_RERANK_DEPTH,
    N_QUERIES,
    PQ_ITERS,
    PQ_KSUB,
    PQ_M,
    TOP_K,
)
from ..operators.textops import BPE_REGEX, LANG_PRIORITY, STOPWORDS

WORDS = "list_filter(string_split(text, ' '), x -> x != '')"


def _shingles(n: int = SHINGLE_N) -> str:
    return (
        f"CASE WHEN len({WORDS}) >= {n} THEN "
        f"list_transform(generate_series(1, len({WORDS}) - {n - 1}), "
        f"i -> array_to_string(({WORDS})[i:i+{n - 1}], ' ')) "
        f"ELSE [] END"
    )


def _hexint(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


EXACT_DUP_SQL = """
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS canonical_doc_id
FROM documents GROUP BY md5(text) HAVING count(*) > 1
"""

_SHINGLE_REL = f"""docsh AS (
    SELECT doc_id,
        unnest(list_distinct(list_transform({_shingles()},
            s -> {_hexint('s')}))) AS shingle
    FROM documents
),
shsizes AS (
    SELECT doc_id, count(*) AS n_sh FROM docsh GROUP BY doc_id
),
shinter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
    FROM docsh a JOIN docsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
shjac AS (
    SELECT doc_a, doc_b, inter,
        round(CAST(inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - inter AS DOUBLE), 6) AS jaccard
    FROM shinter
    JOIN shsizes sa ON sa.doc_id = doc_a
    JOIN shsizes sb ON sb.doc_id = doc_b
)"""

NGRAM_JACCARD_SQL = f"""
WITH {_SHINGLE_REL}
SELECT doc_a, doc_b, inter, jaccard FROM shjac WHERE jaccard >= {JACCARD_THRESHOLD!r}
"""


def ngram_jaccard_capped_sql(max_df: int, threshold: float = JACCARD_THRESHOLD) -> str:
    """Twin of ``ngram_jaccard_pairs(..., max_df=...)``: document-frequency
    stop-listing applied to the shingle relation before sizes/intersections,
    so Jaccard is computed over the capped vocabulary on both engines."""
    capped = _SHINGLE_REL.replace(
        "docsh AS (",
        "docsh0 AS (",
        1,
    ).replace(
        "shsizes AS (",
        f"""dfreq AS (
    SELECT shingle, count(*) AS df FROM docsh0 GROUP BY shingle
),
docsh AS (
    SELECT d.doc_id, d.shingle FROM docsh0 d
    JOIN dfreq f ON d.shingle = f.shingle WHERE f.df <= {max_df}
),
shsizes AS (""",
        1,
    )
    return f"""
WITH {capped}
SELECT doc_a, doc_b, inter, jaccard FROM shjac WHERE jaccard >= {threshold!r}
"""


def _minhash_sql(max_bucket: int | None = None) -> str:
    rows = MINHASH_SEEDS // MINHASH_BANDS
    mh_cols = ",\n        ".join(
        f"min(md5('{i}|' || CAST(shingle AS VARCHAR))) AS mh{i}"
        for i in range(MINHASH_SEEDS)
    )
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, {bi} AS band, md5("
        + " || ".join(f"mh{bi * rows + r}" for r in range(rows))
        + ") AS key FROM sigs"
        for bi in range(MINHASH_BANDS)
    )
    cap = ""
    src = "buckets"
    if max_bucket is not None:
        cap = f"""
bsz AS (
    SELECT band, key, count(*) AS _bs FROM buckets GROUP BY band, key
),
fbuckets AS (
    SELECT b.doc_id, b.band, b.key
    FROM buckets b JOIN bsz s USING (band, key)
    WHERE s._bs <= {max_bucket}
),"""
        src = "fbuckets"
    return f"""sigs AS (
    SELECT doc_id, {mh_cols} FROM docsh GROUP BY doc_id
),
buckets AS (
{band_rows}
),{cap}
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
    FROM {src} a JOIN {src} b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)"""


MINHASH_LSH_SQL = f"""
WITH {_SHINGLE_REL},
{_minhash_sql()}
SELECT c.doc_a, c.doc_b, c.n_shared_bands, j.jaccard
FROM cand c JOIN shjac j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
WHERE j.jaccard >= {LSH_JACCARD_FLOOR!r}
"""


def minhash_lsh_capped_sql(
    max_bucket: int, floor: float = LSH_JACCARD_FLOOR
) -> str:
    """Twin of dedup.minhash_lsh_pairs with the hot-bucket guard: band
    buckets larger than ``max_bucket`` are dropped before the self-join
    (same cut, same verification) — see tests/test_dedup_guard.py."""
    return f"""
WITH {_SHINGLE_REL},
{_minhash_sql(max_bucket)}
SELECT c.doc_a, c.doc_b, c.n_shared_bands, j.jaccard
FROM cand c JOIN shjac j ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
WHERE j.jaccard >= {floor!r}
"""

_CHUNK_W = SIMHASH_BITS // SIMHASH_CHUNKS

_SIMHASH_FP = f"""toks AS (
    SELECT doc_id, unnest({WORDS}) AS w FROM documents
),
tokh AS (
    SELECT doc_id, {_hexint("w")} AS h FROM toks
),
contrib AS (
    SELECT doc_id, b.bit AS bit,
        ((h >> b.bit) & 1) * 2 - 1 AS sign
    FROM tokh, (SELECT unnest(generate_series(0, {SIMHASH_BITS - 1})) AS bit) b
),
bitsum AS (
    SELECT doc_id, bit, sum(sign) AS s FROM contrib GROUP BY doc_id, bit
),
fp AS (
    SELECT doc_id,
        CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
    FROM bitsum GROUP BY doc_id
)"""

SIMHASH_PAIRS_SQL = f"""
WITH {_SIMHASH_FP},
chunks AS (
    SELECT doc_id, simhash, c.chunk AS chunk,
        (simhash >> (c.chunk * {_CHUNK_W})) & {(1 << _CHUNK_W) - 1} AS ckey
    FROM fp, (SELECT unnest(generate_series(0, {SIMHASH_CHUNKS - 1})) AS chunk) c
),
spairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        a.simhash AS sh_a, b.simhash AS sh_b
    FROM chunks a JOIN chunks b
        ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, sh_a, sh_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
FROM spairs WHERE bit_count(xor(sh_a, sh_b)) <= {MAX_HAMMING}
"""

# --- vectors ---------------------------------------------------------------

_VD = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


def _dot(a: str, b: str) -> str:
    prods = f"list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i])"
    return f"list_reduce(list_prepend(0.0, {prods}), (acc, x) -> acc + x)"


def _cos(a: str, b: str) -> str:
    return (
        f"({_dot(a, b)} / nullif(sqrt({_dot(a, a)}) * sqrt({_dot(b, b)}), 0.0))"
    )


def _bucket(v: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series(0, {SIGN_BITS - 1}), "
        f"i -> CASE WHEN {v}[i + 1] > 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)), "
        f"(acc, x) -> acc + x)"
    )


EMB_NEAR_DUP_SQL = f"""
WITH ev AS (
    SELECT vec_id, {_VD} AS v, {_bucket(_VD)} AS bucket FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
    round({_cos("a.v", "b.v")}, 6) AS cosine
FROM ev a JOIN ev b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round({_cos("a.v", "b.v")}, 6) >= {COSINE_DUP_THRESHOLD!r}
"""

COSINE_TOPK_SQL = f"""
WITH ev AS (
    SELECT vec_id, {_VD} AS v FROM embeddings
),
q AS (
    SELECT vec_id AS query_id, v AS qv FROM ev WHERE vec_id < {N_QUERIES}
),
scored AS (
    SELECT query_id, e.vec_id AS neighbor_id,
        round({_cos("qv", "e.v")}, 6) AS cosine
    FROM q JOIN ev e ON query_id != e.vec_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
FROM ranked WHERE rank <= {TOP_K}
"""

LSH_TOPK_SQL = f"""
WITH ev AS (
    SELECT vec_id, {_VD} AS v, {_bucket(_VD)} AS bucket FROM embeddings
),
q AS (
    SELECT vec_id AS query_id, v AS qv, bucket AS qbucket FROM ev WHERE vec_id < {N_QUERIES}
),
scored AS (
    SELECT query_id, e.vec_id AS neighbor_id,
        round({_cos("qv", "e.v")}, 6) AS cosine
    FROM q JOIN ev e ON qbucket = e.bucket AND query_id != e.vec_id
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine
FROM ranked WHERE rank <= {TOP_K}
"""

# --- text ------------------------------------------------------------------

TOKEN_STATS_SQL = f"""
SELECT doc_id, n_chars,
    CAST(len({WORDS}) AS BIGINT) AS n_ws_tokens,
    CAST(len(regexp_extract_all(text, '{BPE_REGEX}')) AS BIGINT) AS n_bpe_tokens,
    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_nonspace_chars,
    round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        / nullif(CAST(len({WORDS}) AS DOUBLE), 0.0), 6) AS avg_token_len
FROM documents
"""


def _stop_ratio_sql(lang: str) -> str:
    lst = ", ".join(f"'{s}'" for s in STOPWORDS[lang])
    return (
        f"(CAST(len(list_filter({WORDS}, x -> x IN ({lst}))) AS DOUBLE)"
        f" / nullif(CAST(len({WORDS}) AS DOUBLE), 0.0))"
    )


def _language_id_sql() -> str:
    scores = ", ".join(
        f"round({_stop_ratio_sql(lg)}, 6) AS score_{lg}" for lg in LANG_PRIORITY
    )
    best = "greatest(" + ", ".join(f"score_{lg}" for lg in LANG_PRIORITY) + ")"
    pred = "'unknown'"
    for lg in reversed(LANG_PRIORITY):
        pred = f"CASE WHEN score_{lg} = {best} THEN '{lg}' ELSE {pred} END"
    return f"""
WITH scored AS (
    SELECT doc_id, lang, {scores} FROM documents
)
SELECT doc_id, lang, {', '.join(f'score_{lg}' for lg in LANG_PRIORITY)},
    CASE WHEN {best} > 0 THEN {pred} ELSE 'unknown' END AS predicted_lang,
    (CASE WHEN {best} > 0 THEN {pred} ELSE 'unknown' END) = lang AS matches_label
FROM scored
"""


LANGUAGE_ID_SQL = _language_id_sql()

def _gopher_cols() -> str:
    """Twin of the Gopher rule flags in textops.quality_score: rounded
    fractions, identical threshold compares."""
    from ..operators.textops import (
        GOPHER_MAX_SYMBOL_RATIO,
        GOPHER_MAX_WORD_LEN,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_STOPWORDS,
        GOPHER_MIN_WORD_LEN,
        GOPHER_MIN_WORDS,
    )

    stops = ", ".join(f"'{s}'" for s in STOPWORDS["en"])
    return f"""
        round(CAST(len(list_filter({WORDS}, x -> regexp_matches(x, '[a-z]')))
            AS DOUBLE) / nullif(CAST(len({WORDS}) AS DOUBLE), 0.0), 6)
            AS alpha_word_frac,
        round(CAST(length(text) - length(replace(text, '#', ''))
            AS DOUBLE) / nullif(CAST(len({WORDS}) AS DOUBLE), 0.0), 6)
            AS hash_word_ratio,
        round(CAST((length(text) - length(replace(text, '...', ''))) // 3
            AS DOUBLE) / nullif(CAST(len({WORDS}) AS DOUBLE), 0.0), 6)
            AS ellipsis_word_ratio,
        len(list_intersect(list_distinct({WORDS}), [{stops}]))
            AS n_stop_distinct,
        CAST(len({WORDS}) AS DOUBLE) AS n_tok_,
        {GOPHER_MIN_WORDS} AS g_minw, {GOPHER_MAX_WORDS} AS g_maxw,
        {GOPHER_MIN_WORD_LEN!r} AS g_minl, {GOPHER_MAX_WORD_LEN!r} AS g_maxl,
        {GOPHER_MIN_ALPHA_FRAC!r} AS g_alpha,
        {GOPHER_MAX_SYMBOL_RATIO!r} AS g_sym,
        {GOPHER_MIN_STOPWORDS} AS g_stop"""


QUALITY_SQL = f"""
WITH feats AS (
    SELECT doc_id,
        CAST(n_chars AS DOUBLE) AS nc,
        CAST(len({WORDS}) AS DOUBLE) AS n_tok,
        CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) AS alpha,
        CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) AS punct,
        {_stop_ratio_sql("en")} AS stop_ratio,
        CAST(length(replace(text, ' ', '')) AS DOUBLE) AS nonspace,
        {_gopher_cols()}
    FROM documents
),
derived AS (
    SELECT doc_id,
        alpha / nullif(nc, 0.0) AS alpha_ratio,
        punct / nullif(nc, 0.0) AS punct_ratio,
        stop_ratio,
        nonspace / nullif(n_tok, 0.0) AS avg_word_len,
        least(n_tok / 50.0, 1.0) AS len_band,
        CASE WHEN nonspace / nullif(n_tok, 0.0) >= 2.0
              AND nonspace / nullif(n_tok, 0.0) <= 12.0 THEN 1.0 ELSE 0.0 END AS word_sanity,
        alpha_word_frac, hash_word_ratio, ellipsis_word_ratio,
        n_stop_distinct, n_tok_,
        (n_tok_ >= g_minw AND n_tok_ <= g_maxw) AS rule_word_count,
        coalesce(round(nonspace / nullif(n_tok, 0.0), 6) >= g_minl
            AND round(nonspace / nullif(n_tok, 0.0), 6) <= g_maxl, false)
            AS rule_mean_word_len,
        coalesce(alpha_word_frac >= g_alpha, false) AS rule_alpha_words,
        (n_stop_distinct >= g_stop) AS rule_stopwords,
        coalesce(hash_word_ratio <= g_sym
            AND ellipsis_word_ratio <= g_sym, false) AS rule_symbol_ratio
    FROM feats
)
SELECT doc_id,
    round(alpha_ratio, 6) AS alpha_ratio,
    round(punct_ratio, 6) AS punct_ratio,
    round(stop_ratio, 6) AS stopword_ratio,
    round(avg_word_len, 6) AS avg_word_len,
    round(0.3 * len_band + 0.3 * alpha_ratio
        + 0.2 * least(stop_ratio * 10.0, 1.0)
        + 0.1 * (1.0 - least(punct_ratio * 5.0, 1.0))
        + 0.1 * word_sanity, 6) AS quality_score,
    alpha_word_frac, hash_word_ratio, ellipsis_word_ratio,
    rule_word_count, rule_mean_word_len, rule_alpha_words,
    rule_stopwords, rule_symbol_ratio,
    (rule_word_count AND rule_mean_word_len AND rule_alpha_words
        AND rule_stopwords AND rule_symbol_ratio) AS gopher_pass
FROM derived
"""

def _fingerprint_sql() -> str:
    """Twin of textops.fingerprints incl. winnowing: same per-position
    window mins over the gram-hash sequence, same sorted-distinct
    polynomial fold."""
    from ..operators.textops import WINNOW_WINDOW as W

    poly = f"(acc, h) -> (acc * 31 + h) % {HASH_MOD}"
    return f"""
SELECT doc_id,
    CAST(len(w_) AS BIGINT) AS n_tokens,
    list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(w_, w -> {_hexint("w")} % {HASH_MOD})),
        {poly}) AS rolling_fp,
    list_min(sh_) AS min_shingle_fp,
    CAST(len(list_sort(list_distinct(ws_))) AS BIGINT) AS n_winnow_fp,
    list_reduce(list_prepend(CAST(0 AS BIGINT), list_sort(list_distinct(ws_))),
        {poly}) AS winnow_fp
FROM (
    SELECT doc_id, w_, sh_,
        list_filter(list_transform(
            generate_series(1, greatest(1, len(sh_) - {W - 1})),
            i -> list_min(sh_[i:i + {W - 1}])), x -> x IS NOT NULL) AS ws_
    FROM (
        SELECT doc_id, {WORDS} AS w_,
            list_transform({_shingles()}, s -> {_hexint("s")} % {HASH_MOD}) AS sh_
        FROM documents
    )
)
"""


FINGERPRINT_SQL = _fingerprint_sql()


IVF_CELL_SQL = f"""
WITH ev AS (
    SELECT vec_id, {_VD} AS v, label FROM embeddings
),
cellvecs AS (
    SELECT label, list(v ORDER BY vec_id) AS vs, CAST(count(*) AS DOUBLE) AS n
    FROM ev GROUP BY label
),
cent AS (
    SELECT label,
        [list_reduce(list_prepend(0.0, list_transform(vs, vv -> vv[j])),
            (acc, x) -> acc + x) / n
         FOR j IN generate_series(1, len(vs[1]))] AS cv
    FROM cellvecs
),
q AS (
    SELECT vec_id AS query_id, v AS qv FROM ev WHERE vec_id < {N_QUERIES}
),
assigned AS (
    SELECT query_id, qv, cell, centroid_cos FROM (
        SELECT q.query_id, q.qv, c.label AS cell,
            round({_cos("q.qv", "c.cv")}, 6) AS centroid_cos,
            row_number() OVER (PARTITION BY q.query_id
                ORDER BY round({_cos("q.qv", "c.cv")}, 6) DESC, c.label ASC) AS crank
        FROM q, cent c
    ) WHERE crank <= {IVF_NPROBE}
)
SELECT query_id, cell, centroid_cos, neighbor_id, cosine FROM (
    SELECT a.query_id, a.cell, a.centroid_cos, e.vec_id AS neighbor_id,
        round({_cos("a.qv", "e.v")}, 6) AS cosine,
        row_number() OVER (PARTITION BY a.query_id
            ORDER BY round({_cos("a.qv", "e.v")}, 6) DESC, e.vec_id ASC) AS rnk
    FROM assigned a JOIN ev e ON a.cell = e.label AND a.query_id != e.vec_id
) WHERE rnk = 1
"""

# int8-quantized IVF with float re-rank — twin of
# similarity.ivf_quantized_search: symmetric per-vector quantization
# (s = max|v| / 127, qv = round(v/s), zero vectors -> zero), per-label
# centroids by ordered fold, nprobe nearest cells, int8 candidate scan
# kept to IVF_RERANK_DEPTH per query, exact float re-rank for the final
# top-k.  Deterministic end-to-end, so exact parity holds.
_Q8 = (
    "list_transform(v, x -> CAST(coalesce(round(x / "
    "(nullif(list_max(list_transform(v, y -> abs(y))), 0.0) / 127.0)), 0)"
    " AS DOUBLE))"
)

IVF_INT8_TOPK_SQL = f"""
WITH ev AS (
    SELECT vec_id, {_VD} AS v, label FROM embeddings
),
vq AS (
    SELECT vec_id, label, {_Q8} AS v8 FROM ev
),
cellvecs AS (
    SELECT label, list(v ORDER BY vec_id) AS vs, CAST(count(*) AS DOUBLE) AS n
    FROM ev GROUP BY label
),
cent AS (
    SELECT label,
        [list_reduce(list_prepend(0.0, list_transform(vs, vv -> vv[j])),
            (acc, x) -> acc + x) / n
         FOR j IN generate_series(1, len(vs[1]))] AS cv
    FROM cellvecs
),
q AS (
    SELECT vec_id AS query_id, v AS qv FROM ev WHERE vec_id < {N_QUERIES}
),
assigned AS (
    SELECT query_id, cell FROM (
        SELECT q.query_id, c.label AS cell,
            row_number() OVER (PARTITION BY q.query_id
                ORDER BY round({_cos("q.qv", "c.cv")}, 6) DESC, c.label ASC) AS crank
        FROM q, cent c
    ) WHERE crank <= {IVF_NPROBE}
),
q8q AS (
    SELECT vec_id AS query_id, v8 AS q8v FROM vq WHERE vec_id < {N_QUERIES}
),
cand AS (
    SELECT query_id, neighbor_id FROM (
        SELECT a.query_id, e.vec_id AS neighbor_id,
            row_number() OVER (PARTITION BY a.query_id
                ORDER BY round({_cos("b.q8v", "e.v8")}, 6) DESC, e.vec_id ASC) AS qrank
        FROM assigned a JOIN q8q b USING (query_id)
        JOIN vq e ON a.cell = e.label AND a.query_id != e.vec_id
    ) WHERE qrank <= {IVF_RERANK_DEPTH}
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine FROM (
    SELECT c.query_id, c.neighbor_id,
        round({_cos("q.qv", "e.v")}, 6) AS cosine,
        row_number() OVER (PARTITION BY c.query_id
            ORDER BY round({_cos("q.qv", "e.v")}, 6) DESC, c.neighbor_id ASC) AS rank
    FROM cand c
    JOIN ev e ON c.neighbor_id = e.vec_id
    JOIN q ON c.query_id = q.query_id
) WHERE rank <= {TOP_K}
"""

def _l2(a: str, b: str) -> str:
    """Twin of similarity.l2sq_col: index-ordered squared-L2 fold."""
    diffs = (
        f"list_transform(generate_series(1, len({a})),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))"
    )
    return f"list_reduce(list_prepend(0.0, {diffs}), (acc, x) -> acc + x)"


def ivf_pq_topk_sql() -> str:
    """Twin of similarity.ivf_pq_search: the grouped per-subspace L2
    k-means UNROLLED as CTEs — identical first-ksub round-6 seeds,
    round-6 squared-L2 ranking with code tie-break, vec_id-ordered
    per-dimension mean folds — then ADC candidate scan over the decoded
    vectors and the same float re-rank, so the top-k matches
    hash-exactly."""
    from ..functions.detsum import duck_fold

    m, ksub, T = PQ_M, PQ_KSUB, PQ_ITERS

    def assign(prev: str) -> str:
        return (
            f"SELECT vec_id, m, code FROM ("
            f"SELECT s.vec_id, s.m, c.code,"
            f" row_number() OVER (PARTITION BY s.vec_id, s.m"
            f" ORDER BY round({_l2('s.sx', 'c.cv')}, 6) ASC, c.code ASC) AS rn"
            f" FROM sv s JOIN {prev} c ON s.m = c.m) WHERE rn = 1"
        )

    ctes = [
        f"ev AS (SELECT vec_id, {_VD} AS v, label FROM embeddings)",
        f"sv AS (SELECT vec_id, ms.m,"
        f" v[ms.m * (len(v) // {m}) + 1 : (ms.m + 1) * (len(v) // {m})] AS sx"
        f" FROM ev CROSS JOIN (SELECT unnest(generate_series(0, {m - 1}))"
        f" AS m) ms)",
        f"pc0 AS (SELECT m, CAST(rn - 1 AS INTEGER) AS code,"
        f" list_transform(sx, d -> round(d, 6)) AS cv FROM ("
        f"SELECT m, sx, row_number() OVER (PARTITION BY m ORDER BY vec_id)"
        f" AS rn FROM sv) WHERE rn <= {ksub})",
        "svu AS (SELECT vec_id, m, unnest(sx) AS val,"
        " generate_subscripts(sx, 1) AS pos FROM sv)",
    ]
    for t in range(1, T + 1):
        ctes.append(f"pa{t} AS ({assign(f'pc{t - 1}')})")
        ctes.append(
            f"pm{t} AS (SELECT m, code, pos,"
            f" round({duck_fold('val', 'vec_id')} / count(*), 6) AS mv"
            f" FROM (SELECT a.m, a.code, u.vec_id, u.pos, u.val"
            f" FROM pa{t} a JOIN svu u ON u.vec_id = a.vec_id AND u.m = a.m)"
            f" GROUP BY m, code, pos)"
        )
        ctes.append(
            f"pc{t} AS (SELECT p.m, p.code, coalesce(n.cv, p.cv) AS cv"
            f" FROM pc{t - 1} p LEFT JOIN"
            f" (SELECT m, code, list_transform(list_sort(list({{'o': pos,"
            f" 'v': mv}})), s -> s.v) AS cv FROM pm{t} GROUP BY m, code) n"
            f" USING (m, code))"
        )
    ctes.extend(
        [
            f"pcode AS ({assign(f'pc{T}')})",
            f"pdec AS (SELECT a.vec_id, flatten(list_transform(list_sort("
            f"list({{'o': a.m, 'v': c.cv}})), s -> s.v)) AS dv"
            f" FROM pcode a JOIN pc{T} c ON a.m = c.m AND a.code = c.code"
            f" GROUP BY a.vec_id)",
            "vd AS (SELECT d.vec_id, d.dv, e.label FROM pdec d"
            " JOIN ev e USING (vec_id))",
            "cellvecs AS (SELECT label, list(v ORDER BY vec_id) AS vs,"
            " CAST(count(*) AS DOUBLE) AS n FROM ev GROUP BY label)",
            "cent AS (SELECT label,"
            " [list_reduce(list_prepend(0.0, list_transform(vs, vv -> vv[j])),"
            " (acc, x) -> acc + x) / n"
            " FOR j IN generate_series(1, len(vs[1]))] AS cv FROM cellvecs)",
            f"q AS (SELECT vec_id AS query_id, v AS qv FROM ev"
            f" WHERE vec_id < {N_QUERIES})",
            f"assigned AS (SELECT query_id, cell FROM ("
            f"SELECT q.query_id, c.label AS cell,"
            f" row_number() OVER (PARTITION BY q.query_id"
            f" ORDER BY round({_cos('q.qv', 'c.cv')}, 6) DESC, c.label ASC)"
            f" AS crank FROM q, cent c) WHERE crank <= {IVF_NPROBE})",
            f"cand AS (SELECT query_id, neighbor_id FROM ("
            f"SELECT a.query_id, e.vec_id AS neighbor_id,"
            f" row_number() OVER (PARTITION BY a.query_id"
            f" ORDER BY round({_cos('q.qv', 'e.dv')}, 6) DESC, e.vec_id ASC)"
            f" AS qrank FROM assigned a JOIN q ON a.query_id = q.query_id"
            f" JOIN vd e ON a.cell = e.label AND a.query_id != e.vec_id)"
            f" WHERE qrank <= {IVF_RERANK_DEPTH})",
        ]
    )
    final = (
        f"SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine"
        f" FROM (SELECT c.query_id, c.neighbor_id,"
        f" round({_cos('q.qv', 'e.v')}, 6) AS cosine,"
        f" row_number() OVER (PARTITION BY c.query_id"
        f" ORDER BY round({_cos('q.qv', 'e.v')}, 6) DESC, c.neighbor_id ASC)"
        f" AS rank FROM cand c JOIN ev e ON c.neighbor_id = e.vec_id"
        f" JOIN q ON c.query_id = q.query_id) WHERE rank <= {TOP_K}"
    )
    return "WITH " + ",\n".join(ctes) + "\n" + final


_TOPK_PAD = "CAST(NULL AS BIGINT) AS cell, CAST(NULL AS DOUBLE) AS centroid_cos"
SIM_TOPK_METHODS_SQL = f"""
SELECT 'brute' AS method, *, {_TOPK_PAD} FROM ({COSINE_TOPK_SQL})
UNION ALL
SELECT 'lsh' AS method, *, {_TOPK_PAD} FROM ({LSH_TOPK_SQL})
UNION ALL
SELECT 'ivf_int8' AS method, *, {_TOPK_PAD} FROM ({IVF_INT8_TOPK_SQL})
UNION ALL
SELECT 'ivf_pq' AS method, *, {_TOPK_PAD} FROM ({ivf_pq_topk_sql()})
UNION ALL
SELECT 'ivf_cell' AS method, query_id, CAST(1 AS BIGINT) AS rank,
    neighbor_id, cosine, CAST(cell AS BIGINT) AS cell, centroid_cos
FROM ({IVF_CELL_SQL})
"""

# connected components over the MinHash-LSH near-dup pairs: transitive
# closure by recursive CTE (tiny pair sets at gate scale — the engine's
# distributed min-label propagation is the scale path), then min-label
# per doc as the cluster representative
DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE edges AS (
    SELECT doc_a AS a, doc_b AS b FROM ({MINHASH_LSH_SQL})
    UNION
    SELECT doc_b, doc_a FROM ({MINHASH_LSH_SQL})
),
reach AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
labels AS (
    SELECT a AS doc_id, least(a, min(b)) AS cluster_rep
    FROM reach GROUP BY a
)
SELECT doc_id, cluster_rep,
    doc_id = cluster_rep AS is_rep,
    CAST(count(*) OVER (PARTITION BY cluster_rep) AS BIGINT) AS cluster_size
FROM labels
"""


def decontamination_sql() -> str:
    """Twin of textops.benchmark_overlap_bloom over the deterministic
    doc_id % BENCHMARK_MOD == BENCHMARK_RESIDUE eval split: same
    md5-prefix shingle ints and distinct-per-doc exact counting, same
    Bloom bit math via integer shifts over a bit-position relation.
    The crucial asymmetry: this twin builds the '__merged__' bit array
    from the GLOBAL benchmark position set while the Spark side OR-merges
    the per-part partial arrays — the bloom_hash equality across engines
    is the OR-merge-law certification."""
    from ..operators.textops import (
        BENCHMARK_MOD,
        BENCHMARK_RESIDUE,
        BLOOM_BITS_PER_ELEM,
        BLOOM_K,
        BLOOM_MIN_WORDS,
        BLOOM_SALT,
        BLOOM_WORD_BITS,
        CONTAMINATION_RATIO,
    )

    sh = _shingles()
    idx = ", ".join(str(i) for i in range(BLOOM_K))

    def bpos(shingle: str, i: str) -> str:
        salted = (
            f"'{BLOOM_SALT}:' || CAST({i} AS VARCHAR) || ':' "
            f"|| CAST({shingle} AS VARCHAR)"
        )
        return f"({_hexint(salted)} % (m.m_words * {BLOOM_WORD_BITS}))"

    return f"""
WITH bench_sh AS MATERIALIZED (
    SELECT DISTINCT 'doc:' || CAST(doc_id AS VARCHAR) AS part,
        {_hexint('s')} AS shingle
    FROM (
        SELECT doc_id, unnest({sh}) AS s FROM documents
        WHERE doc_id % {BENCHMARK_MOD} = {BENCHMARK_RESIDUE}
    )
),
bench_global AS MATERIALIZED (SELECT DISTINCT shingle FROM bench_sh),
mrel AS MATERIALIZED (
    SELECT CAST(count(*) AS BIGINT) AS n_ins,
        greatest(CAST({BLOOM_MIN_WORDS} AS BIGINT),
            (count(*) * {BLOOM_BITS_PER_ELEM} + {BLOOM_WORD_BITS - 1})
                // {BLOOM_WORD_BITS}) AS m_words
    FROM bench_global
),
ppos AS (
    SELECT b.part, {bpos('b.shingle', 'hi.i')} AS pos
    FROM bench_sh b, mrel m, (SELECT unnest([{idx}]) AS i) hi
),
sparse AS (
    SELECT part, pos // {BLOOM_WORD_BITS} AS widx,
        bit_or(CAST(1 AS BIGINT) << CAST(pos % {BLOOM_WORD_BITS} AS INT))
            AS word
    FROM ppos GROUP BY part, pos // {BLOOM_WORD_BITS}
),
gpos AS (
    SELECT {bpos('b.shingle', 'hi.i')} AS pos
    FROM bench_global b, mrel m, (SELECT unnest([{idx}]) AS i) hi
),
gsparse AS (
    SELECT pos // {BLOOM_WORD_BITS} AS widx,
        bit_or(CAST(1 AS BIGINT) << CAST(pos % {BLOOM_WORD_BITS} AS INT))
            AS word
    FROM gpos GROUP BY pos // {BLOOM_WORD_BITS}
),
widxs AS (SELECT unnest(generate_series(0, m_words - 1)) AS wi FROM mrel),
dense AS (
    SELECT p.part, w.wi, coalesce(s.word, CAST(0 AS BIGINT)) AS word
    FROM (SELECT DISTINCT part FROM bench_sh) p
    CROSS JOIN widxs w
    LEFT JOIN sparse s ON s.part = p.part AND s.widx = w.wi
),
gdense AS MATERIALIZED (
    SELECT w.wi, coalesce(g.word, CAST(0 AS BIGINT)) AS word
    FROM widxs w LEFT JOIN gsparse g ON g.widx = w.wi
),
n_part AS (
    SELECT part, CAST(count(*) AS BIGINT) AS n_inserted
    FROM bench_sh GROUP BY part
    UNION ALL
    SELECT '__merged__', n_ins FROM mrel
),
alldense AS (
    SELECT part, wi, word FROM dense
    UNION ALL
    SELECT '__merged__', wi, word FROM gdense
),
frows AS (
    SELECT 'filter' AS row_kind, CAST(NULL AS BIGINT) AS doc_id, d.part,
        n.n_inserted AS n_shingles,
        CAST(NULL AS BIGINT) AS n_contaminated,
        CAST(NULL AS DOUBLE) AS contamination_ratio,
        CAST(NULL AS VARCHAR) AS is_contaminated,
        CAST(sum(bit_count(d.word)) AS BIGINT) AS n_bloom,
        round(CAST(sum(bit_count(d.word)) AS DOUBLE)
            / CAST(m.m_words * {BLOOM_WORD_BITS} AS DOUBLE), 6)
            AS bloom_ratio,
        CAST(NULL AS VARCHAR) AS is_contaminated_bloom,
        CAST(NULL AS BIGINT) AS n_false_pos,
        CAST(NULL AS VARCHAR) AS fp_flag,
        CAST(m.m_words * {BLOOM_WORD_BITS} AS BIGINT) AS bloom_m,
        md5(string_agg(CAST(d.word AS VARCHAR), ',' ORDER BY d.wi))
            AS bloom_hash
    FROM alldense d JOIN n_part n USING (part), mrel m
    GROUP BY d.part, n.n_inserted, m.m_words
),
corpus AS MATERIALIZED (
    SELECT doc_id,
        list_distinct(list_transform({sh}, s -> {_hexint('s')})) AS shs
    FROM documents
    WHERE doc_id % {BENCHMARK_MOD} != {BENCHMARK_RESIDUE}
),
cpos AS (
    SELECT c.doc_id, c.shingle, {bpos('c.shingle', 'hi.i')} AS pos
    FROM (SELECT doc_id, unnest(shs) AS shingle FROM corpus) c,
        mrel m, (SELECT unnest([{idx}]) AS i) hi
),
chit AS (
    SELECT doc_id, shingle,
        CASE WHEN count(*) FILTER (WHERE
            ((g.word >> CAST(pos % {BLOOM_WORD_BITS} AS INT)) & 1) = 1)
            = {BLOOM_K}
        THEN 1 ELSE 0 END AS bloom_hit
    FROM cpos JOIN gdense g ON g.wi = pos // {BLOOM_WORD_BITS}
    GROUP BY doc_id, shingle
),
hits AS (
    SELECT h.doc_id,
        CAST(sum(CASE WHEN bg.shingle IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
        CAST(sum(h.bloom_hit) AS BIGINT) AS n_bloom
    FROM chit h LEFT JOIN bench_global bg USING (shingle)
    GROUP BY h.doc_id
),
scored AS (
    SELECT c.doc_id,
        CAST(len(c.shs) AS BIGINT) AS n_shingles,
        coalesce(h.n_contaminated, CAST(0 AS BIGINT)) AS n_contaminated,
        coalesce(h.n_bloom, CAST(0 AS BIGINT)) AS n_bloom,
        round(CASE WHEN len(c.shs) > 0
            THEN CAST(coalesce(h.n_contaminated, 0) AS DOUBLE)
                / CAST(len(c.shs) AS DOUBLE)
            ELSE 0.0 END, 6) AS contamination_ratio,
        round(CASE WHEN len(c.shs) > 0
            THEN CAST(coalesce(h.n_bloom, 0) AS DOUBLE)
                / CAST(len(c.shs) AS DOUBLE)
            ELSE 0.0 END, 6) AS bloom_ratio
    FROM corpus c LEFT JOIN hits h USING (doc_id)
)
SELECT 'doc' AS row_kind, doc_id, CAST(NULL AS VARCHAR) AS part,
    n_shingles, n_contaminated, contamination_ratio,
    CAST(contamination_ratio >= {CONTAMINATION_RATIO!r} AS VARCHAR)
        AS is_contaminated,
    n_bloom, bloom_ratio,
    CAST(bloom_ratio >= {CONTAMINATION_RATIO!r} AS VARCHAR)
        AS is_contaminated_bloom,
    n_bloom - n_contaminated AS n_false_pos,
    CAST(bloom_ratio >= {CONTAMINATION_RATIO!r}
        AND NOT contamination_ratio >= {CONTAMINATION_RATIO!r} AS VARCHAR)
        AS fp_flag,
    CAST(NULL AS BIGINT) AS bloom_m, CAST(NULL AS VARCHAR) AS bloom_hash
FROM scored
UNION ALL
SELECT * FROM frows
"""


def source_stats_sql() -> str:
    """Twin of textops.source_stats: same per-doc quality scores
    (QUALITY_SQL reused as a CTE), same global-duplicate grouping, and the
    doc_id-ordered sequential fold for mean quality."""
    from ..functions.detsum import duck_fold

    return f"""
WITH q AS ({QUALITY_SQL}),
h AS (
    SELECT doc_id, source, lang, n_chars, md5(text) AS _h FROM documents
),
grp AS (SELECT _h, count(*) AS _grp FROM h GROUP BY _h),
j AS (
    SELECT h.doc_id, h.source, h.lang, h.n_chars, grp._grp,
        q.quality_score
    FROM h JOIN grp USING (_h) JOIN q ON q.doc_id = h.doc_id
)
SELECT source,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
    CAST(sum(CASE WHEN _grp > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
    round(CAST(sum(CASE WHEN _grp > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(count(*) AS DOUBLE), 6) AS dup_ratio,
    round({duck_fold("quality_score", "doc_id")}
        / CAST(count(*) AS DOUBLE), 6) AS mean_quality
FROM j
GROUP BY source
"""


def repetition_sql() -> str:
    """Twin of textops.repetition_stats: the Spark side counts duplicate
    occurrences via a sorted-array neighbor scan and max multiplicity via
    a longest-equal-run fold; this twin computes the same integers the
    canonical way (unnest + GROUP BY multiplicity) — the two agree by the
    definition of multiplicity, and every fraction is the same
    round(int/int, 6)."""
    from ..operators.textops import (
        DUP_NGRAM_FRAC_MAX,
        DUP_WORD_FRAC_MAX,
        REPETITION_NGRAMS,
        TOP_NGRAM_FRAC_MAX,
    )

    ctes = [
        f"w AS (SELECT doc_id, {WORDS} AS ws FROM documents)",
        "b AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,"
        " CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct FROM w)",
    ]
    frac_cols = [
        "b.doc_id",
        "b.n_words",
        "round(CASE WHEN b.n_words > 0 THEN"
        " CAST(b.n_words - b.n_distinct AS DOUBLE) / CAST(b.n_words AS DOUBLE)"
        " ELSE 0.0 END, 6) AS dup_word_frac",
    ]
    joins = []
    flags = [f"dup_word_frac > {DUP_WORD_FRAC_MAX!r}"]
    for n in REPETITION_NGRAMS:
        ctes.append(
            f"g{n} AS (SELECT doc_id, s, count(*) AS c FROM"
            f" (SELECT doc_id, unnest({_shingles(n)}) AS s FROM documents)"
            f" GROUP BY doc_id, s)"
        )
        ctes.append(
            f"a{n} AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,"
            f" CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup,"
            f" CAST(max(c) AS BIGINT) AS top FROM g{n} GROUP BY doc_id)"
        )
        joins.append(f"LEFT JOIN a{n} ON a{n}.doc_id = b.doc_id")
        frac_cols.append(
            f"round(CASE WHEN coalesce(a{n}.total, 0) > 0 THEN"
            f" CAST(a{n}.dup AS DOUBLE) / CAST(a{n}.total AS DOUBLE)"
            f" ELSE 0.0 END, 6) AS dup_{n}gram_frac"
        )
        frac_cols.append(
            f"round(CASE WHEN coalesce(a{n}.total, 0) > 0 THEN"
            f" CAST(a{n}.top AS DOUBLE) / CAST(a{n}.total AS DOUBLE)"
            f" ELSE 0.0 END, 6) AS top_{n}gram_frac"
        )
        flags.append(f"dup_{n}gram_frac > {DUP_NGRAM_FRAC_MAX[n]!r}")
        flags.append(f"top_{n}gram_frac > {TOP_NGRAM_FRAC_MAX[n]!r}")
    return (
        "WITH " + ",\n".join(ctes)
        + ",\nscored AS (SELECT " + ",\n    ".join(frac_cols)
        + "\nFROM b " + " ".join(joins) + ")"
        + "\nSELECT *, (" + " OR ".join(flags) + ") AS is_repetitive FROM scored"
    )


def mixture_sample_sql() -> str:
    """Twin of textops.mixture_sample at the default budget/salt: same
    source-grain plan arithmetic (double ops in identical association
    order), same md5-prefix membership hash (the cross-engine hexint),
    same floor(rate*mod) cut."""
    from ..operators.textops import (
        MIXTURE_BUDGET_TOKENS,
        MIXTURE_SALT,
        SAMPLE_MOD,
    )

    return f"""
WITH t AS (
    SELECT doc_id, source,
        CAST(len({WORDS}) AS BIGINT) AS n_tokens
    FROM documents
),
s AS (
    SELECT source, count(*) AS n_docs,
        CAST(sum(n_tokens) AS BIGINT) AS toks,
        CAST((CAST(substr(source, 4) AS BIGINT) % 4) + 1 AS BIGINT) AS w
    FROM t GROUP BY source
),
tot AS (SELECT CAST(sum(w) AS DOUBLE) AS wsum FROM s),
plan AS (
    SELECT source,
        round(least(1.0, CASE WHEN toks > 0
            THEN CAST({MIXTURE_BUDGET_TOKENS} AS DOUBLE) * CAST(w AS DOUBLE)
                / wsum / CAST(toks AS DOUBLE)
            ELSE 1.0 END), 6) AS sample_rate
    FROM s, tot
)
SELECT t.doc_id, t.source, t.n_tokens, p.sample_rate
FROM t JOIN plan p USING (source)
WHERE {_hexint(f"'{MIXTURE_SALT}:' || t.source || ':' || CAST(t.doc_id AS VARCHAR)")}
        % {SAMPLE_MOD}
    < CAST(floor(p.sample_rate * {SAMPLE_MOD}.0) AS BIGINT)
"""


def bpe_doc_sql() -> str:
    """Twin of textops.bpe_train + bpe_token_counts: the BPE merge
    learning UNROLLED as CTE rounds — identical word-frequency vocab,
    identical pair counts (integer sums), identical (cnt desc, a, b)
    argmax, and the same left-to-right greedy apply fold (the learned
    pair enters the next round's lambda via a one-row cross join) — then
    per-doc token counts through the word-type join."""
    from ..operators.textops import BPE_MERGES as R

    ctes = [
        f"bv0 AS (SELECT word, freq,"
        f" list_transform(generate_series(1, length(word)), i -> word[i]) AS s"
        f" FROM (SELECT word, CAST(count(*) AS BIGINT) AS freq"
        f" FROM (SELECT unnest({WORDS}) AS word FROM documents)"
        f" GROUP BY word))",
    ]
    for r in range(1, R + 1):
        ctes.append(
            f"bp{r} AS (SELECT a, b, sum(freq) AS cnt FROM ("
            f"SELECT freq, s[i] AS a, s[i + 1] AS b FROM ("
            f"SELECT freq, s, unnest(generate_series(1, len(s) - 1)) AS i"
            f" FROM bv{r - 1})) GROUP BY a, b)"
        )
        ctes.append(
            f"bb{r} AS (SELECT a, b FROM bp{r}"
            f" ORDER BY cnt DESC, a ASC, b ASC LIMIT 1)"
        )
        # LEFT JOIN ON TRUE, not a plain cross join: a round with no
        # pairs left (degenerate corpus — every word already one symbol)
        # must keep the vocabulary intact, mirroring the Spark trainer's
        # early break (applying zero further merges leaves s unchanged)
        ctes.append(
            f"bv{r} AS (SELECT word, freq,"
            f" CASE WHEN m.a IS NULL THEN s ELSE"
            f" list_reduce(list_prepend(CAST([] AS VARCHAR[]),"
            f" list_transform(s, c -> [c])),"
            f" (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m.a"
            f" AND x[1] = m.b"
            f" THEN list_append(acc[1:len(acc) - 1], m.a || m.b)"
            f" ELSE list_append(acc, x[1]) END) END AS s"
            f" FROM bv{r - 1} LEFT JOIN bb{r} m ON TRUE)"
        )
    ctes.extend(
        [
            f"bwt AS (SELECT word, CAST(len(s) AS BIGINT) AS w_tok,"
            f" CAST(length(word) AS BIGINT) AS w_chars FROM bv{R})",
            f"bdw AS (SELECT doc_id, unnest({WORDS}) AS word FROM documents)",
            "bagg AS (SELECT doc_id, CAST(sum(w_tok) AS BIGINT)"
            " AS bpe_vocab_tokens,"
            " round(CAST(sum(w_chars) AS DOUBLE) / CAST(sum(w_tok) AS DOUBLE),"
            " 6) AS bpe_chars_per_token"
            " FROM bdw JOIN bwt USING (word) GROUP BY doc_id)",
        ]
    )
    final = (
        "SELECT d.doc_id,"
        " coalesce(b.bpe_vocab_tokens, CAST(0 AS BIGINT)) AS bpe_vocab_tokens,"
        " b.bpe_chars_per_token"
        " FROM documents d LEFT JOIN bagg b USING (doc_id)"
    )
    return "WITH " + ",\n".join(ctes) + "\n" + final


def packing_sql() -> str:
    """Twin of textops.packing_panel: same md5-coin shard and sample
    membership, same per-shard doc_id-ordered token cumsum and
    floor((cum - tokens)/budget) pack assignment, so the panel
    hash-matches."""
    from ..operators.textops import (
        PACK_BUDGET_TOKENS,
        PACK_SALT,
        PACK_SAMPLE_RATE,
        PACK_SAMPLE_SALT,
        PACK_SHARDS,
        SAMPLE_MOD,
    )

    coin = _hexint(f"'{PACK_SALT}:' || CAST(doc_id AS VARCHAR)")
    keep = _hexint(f"'{PACK_SAMPLE_SALT}:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH d AS (
    SELECT doc_id,
        {coin} % {PACK_SHARDS} AS shard,
        CAST(len({WORDS}) AS BIGINT) AS n_tokens,
        ({keep} % {SAMPLE_MOD})
            < CAST(floor({PACK_SAMPLE_RATE!r} * {SAMPLE_MOD}.0) AS BIGINT)
            AS sample_keep
    FROM documents
),
p AS (
    SELECT doc_id, shard, n_tokens, sample_keep,
        CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
            - n_tokens) / {PACK_BUDGET_TOKENS}.0) AS BIGINT) AS pack_id
    FROM d
)
SELECT doc_id, shard, n_tokens, pack_id,
    CAST(row_number() OVER (PARTITION BY shard, pack_id ORDER BY doc_id)
        AS BIGINT) AS pack_pos,
    sample_keep
FROM p
"""


def kmeans_assign_sql() -> str:
    """Twin of the catalog's shared quantizer (_kmeans_cents_n →
    similarity.kmeans_train + kmeans_assign): the same spherical-k-means
    iterations UNROLLED as CTEs — identical seeds (k smallest vec_ids of
    the TRAINING set, round-6), identical round-6 cosine ranking with
    cid tie-break, identical vec_id-ordered per-dimension mean folds —
    so the final assignment matches hash-exactly.

    The cell count is DERIVED IN SQL from the corpus count through the
    same pure function as the engine (dedup.semdedup_cell_count: k =
    greatest(KMEANS_K, least(n // SEMDEDUP_CELL, SEMDEDUP_KMAX))), and
    above the certified k=KMEANS_K the training set is the engine's
    bounded deterministic md5 sample (u01('kmeanstrain|' || vec_id) <
    32k/n — kmeans_train's train_sample path), so BOTH halves of the
    dual-engine contract size and train the quantizer identically for
    ANY fixture size, not just the 500-vector clamp floor
    (tests/test_kmeans.py certifies a >1,800-vector fixture end to
    end).  At n <= 1,799 this reduces byte-identically to the static
    k=8 full-corpus twin it replaces."""
    from ..functions.detsum import duck_fold
    from ..operators.dedup import SEMDEDUP_CELL, SEMDEDUP_KMAX
    from ..operators.similarity import (
        KMEANS_ITERS,
        KMEANS_K,
        KMEANS_TRAIN_FACTOR,
    )

    T = KMEANS_ITERS
    coin = _hexint("'kmeanstrain|' || CAST(vec_id AS VARCHAR)")

    def assign(rel: str, prev: str) -> str:
        return (
            f"SELECT vec_id, cid, cos FROM ("
            f"SELECT t.vec_id, c.cid,"
            f" round({_cos('t.x', 'c.cv')}, 6) AS cos,"
            f" row_number() OVER (PARTITION BY t.vec_id"
            f" ORDER BY round({_cos('t.x', 'c.cv')}, 6) DESC, c.cid ASC) AS rn"
            f" FROM {rel} t, {prev} c) WHERE rn = 1"
        )

    ctes = [
        f"v AS (SELECT vec_id, {_VD} AS x FROM embeddings)",
        f"kk AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,"
        f" greatest(CAST({KMEANS_K} AS BIGINT),"
        f" least(greatest(CAST(count(*) AS BIGINT), 1) // {SEMDEDUP_CELL},"
        f" CAST({SEMDEDUP_KMAX} AS BIGINT))) AS k FROM v)",
        f"tv AS MATERIALIZED (SELECT v.vec_id, v.x FROM v, kk"
        f" WHERE kk.k <= {KMEANS_K}"
        f" OR kk.n <= {KMEANS_TRAIN_FACTOR} * kk.k"
        f" OR CAST({coin} AS DOUBLE) / {float(1 << 60)!r}"
        f" < CAST({KMEANS_TRAIN_FACTOR} * kk.k AS DOUBLE)"
        f" / CAST(kk.n AS DOUBLE))",
        "c0 AS (SELECT CAST(rn - 1 AS INTEGER) AS cid,"
        " list_transform(x, d -> round(d, 6)) AS cv"
        " FROM (SELECT vec_id, x, row_number() OVER (ORDER BY vec_id) AS rn"
        " FROM tv), kk WHERE rn <= kk.k)",
        "vu AS (SELECT vec_id, unnest(x) AS val,"
        " generate_subscripts(x, 1) AS pos FROM tv)",
    ]
    for t in range(1, T + 1):
        ctes.append(f"a{t} AS ({assign('tv', f'c{t - 1}')})")
        ctes.append(
            f"m{t} AS (SELECT cid, pos,"
            f" round({duck_fold('val', 'vec_id')} / count(*), 6) AS m"
            f" FROM (SELECT a.cid, u.vec_id, u.pos, u.val"
            f" FROM a{t} a JOIN vu u ON u.vec_id = a.vec_id)"
            f" GROUP BY cid, pos)"
        )
        ctes.append(
            f"c{t} AS (SELECT p.cid, coalesce(n.cv, p.cv) AS cv"
            f" FROM c{t - 1} p LEFT JOIN"
            f" (SELECT cid, list_transform(list_sort(list({{'o': pos, 'v': m}})),"
            f" s -> s.v) AS cv FROM m{t} GROUP BY cid) n USING (cid))"
        )
    final = (
        f"SELECT vec_id, cid AS cluster, cos AS centroid_cos"
        f" FROM ({assign('v', f'c{T}')})"
    )
    return "WITH " + ",\n".join(ctes) + "\n" + final


def logreg_scores_sql() -> str:
    """Twin of classifier.logreg_score: the same standardization moments
    (round-6, doc_id-ordered folds; sd against the already-rounded mean)
    and batch-GD iterations unrolled as one-row weight CTEs — identical
    round-6 sigmoid, gradient folds, and weight updates — so the final
    per-document scores hash-match."""
    from ..operators.classifier import (
        LOGREG_FEATURES,
        LOGREG_ITERS,
        LOGREG_LR,
    )

    names = list(LOGREG_FEATURES)
    nw = len(names) + 1

    def z(w: str) -> str:
        terms = [f"{w}.w0"] + [
            f"{w}.w{j + 1} * fs.{nm}" for j, nm in enumerate(names)
        ]
        return " + ".join(terms)

    def p(w: str) -> str:
        return f"round(1.0 / (1.0 + exp(-({z(w)}))), 6)"

    def i6(expr: str) -> str:
        return f"CAST(round(({expr}) * 1000000.0) AS HUGEINT)"

    def sum1(expr: str) -> str:
        return f"CAST(sum({i6(expr)}) AS DOUBLE) / 1000000.0"

    def sum2(a: str, b: str) -> str:
        return (
            f"CAST(sum({i6(a)} * {i6(b)}) AS DOUBLE) / 1000000000000.0"
        )

    mu_cols = ", ".join(
        f"round({sum1(nm)} / count(*), 6) AS m{j}"
        for j, nm in enumerate(names)
    )
    sd_cols = ", ".join(
        f"round(sqrt({sum2(f'{nm} - mu.m{j}', f'{nm} - mu.m{j}')}"
        f" / count(*)), 6) AS s{j}"
        for j, nm in enumerate(names)
    )
    std_cols = ", ".join(
        f"round(CASE WHEN sdv.s{j} > 0 THEN ({nm} - mu.m{j}) / sdv.s{j}"
        f" ELSE 0.0 END, 6) AS {nm}"
        for j, nm in enumerate(names)
    )
    ctes = [
        f"""f AS MATERIALIZED (
    SELECT doc_id, dup_word_frac, dup_2gram_frac, top_2gram_frac,
        round(least(CAST(n_words AS DOUBLE) / 50.0, 1.0), 6) AS len_band,
        CASE WHEN is_repetitive THEN 1.0 ELSE 0.0 END AS y
    FROM ({repetition_sql()})
)""",
        f"mu AS MATERIALIZED (SELECT {mu_cols} FROM f)",
        f"sdv AS MATERIALIZED (SELECT {sd_cols} FROM f, mu)",
        f"fs AS MATERIALIZED (SELECT doc_id, y, {std_cols} FROM f, mu, sdv)",
        "w0 AS MATERIALIZED (SELECT "
        + ", ".join(f"0.0 AS w{j}" for j in range(nw))
        + ")",
    ]
    for t in range(1, LOGREG_ITERS + 1):
        prev = f"w{t - 1}"
        ctes.append(
            f"p{t} AS MATERIALIZED (SELECT fs.doc_id, fs.y, "
            + ", ".join(f"fs.{nm}" for nm in names)
            + f", {p('w')} AS p FROM fs, {prev} w)"
        )
        grads = [
            f"round({sum1('p - y')} / count(*), 6)"
        ] + [
            f"round({sum2('p - y', nm)} / count(*), 6)"
            for nm in names
        ]
        upd = ", ".join(
            f"round(any_value(w.w{j}) - {LOGREG_LR!r} * {g}, 6) AS w{j}"
            for j, g in enumerate(grads)
        )
        ctes.append(f"w{t} AS MATERIALIZED (SELECT {upd} FROM p{t}, {prev} w)")
    final = (
        f"SELECT fs.doc_id, fs.y, {p('w')} AS score,"
        f" {p('w')} >= 0.5 AS predicted_repetitive"
        f" FROM fs, w{LOGREG_ITERS} w"
    )
    return "WITH " + ",\n".join(ctes) + "\n" + final


def bm25_scores_sql() -> str:
    """Twin of textops.bm25_scores at the default query/constants: same
    integer tf/df/dl statistics, same round-6 avgdl and idf, identical
    association order in the per-term expression, same fixed-order sum
    of round-6 terms."""
    from ..operators.textops import BM25_B, BM25_K1, BM25_QUERY

    k1p1, onemb = BM25_K1 + 1.0, 1.0 - BM25_B
    tfs = ", ".join(
        f"CAST(len(list_filter(w, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(BM25_QUERY)
    )
    dfs = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(BM25_QUERY))
    )
    terms = []
    for i in range(len(BM25_QUERY)):
        idf = (
            f"round(ln(1.0 + (n_docs - df{i} + 0.5) / (df{i} + 0.5)), 6)"
        )
        denom = (
            f"(CAST(tf{i} AS DOUBLE) + {BM25_K1!r} * ({onemb!r}"
            f" + {BM25_B!r} * CAST(dl AS DOUBLE) / avgdl))"
        )
        terms.append(
            f"round({idf} * (CAST(tf{i} AS DOUBLE) * {k1p1!r} / {denom}), 6)"
        )
    tf_out = ", ".join(
        f"tf{i} AS tf_{t}" for i, t in enumerate(BM25_QUERY)
    )
    return f"""
WITH wbase AS (SELECT doc_id, {WORDS} AS w FROM documents),
base AS (
    SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, {tfs} FROM wbase
),
consts AS (
    SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        round(CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS avgdl,
        {dfs}
    FROM base
)
SELECT doc_id, dl AS n_words, {tf_out},
    round({" + ".join(terms)}, 6) AS bm25
FROM base, consts
"""


def bm25_topk_sql() -> str:
    """Twin of textops.bm25_topk at the default query batch: same
    posting-list statistics, same round-6 idf/avgdl, per-term scores
    integer-scaled before the per-(query, doc) sum (order-free exact),
    same (score DESC, doc_id ASC) ranking."""
    from ..operators.textops import (
        BM25_B,
        BM25_K1,
        BM25_QUERIES,
        BM25_TOPK,
    )

    k1p1, onemb = BM25_K1 + 1.0, 1.0 - BM25_B
    vocab = sorted({t for ts in BM25_QUERIES.values() for t in ts})
    vlist = ", ".join(f"'{t}'" for t in vocab)
    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in sorted(BM25_QUERIES.items())
        for t in terms
    )
    idf = "round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6)"
    denom = (
        f"(CAST(tf AS DOUBLE) + {BM25_K1!r} * ({onemb!r}"
        f" + {BM25_B!r} * CAST(dl AS DOUBLE) / avgdl))"
    )
    term_score = (
        f"round({idf} * (CAST(tf AS DOUBLE) * {k1p1!r} / {denom}), 6)"
    )
    return f"""
WITH wbase AS (SELECT doc_id, {WORDS} AS w FROM documents),
base AS (
    SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
        list_filter(w, x -> list_contains([{vlist}], x)) AS hits
    FROM wbase
),
consts AS (
    SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        round(CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS avgdl
    FROM base
),
posting AS (
    SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, dl, unnest(hits) AS term FROM base)
    GROUP BY doc_id, dl, term
),
dfc AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM posting GROUP BY term),
q(query_id, term) AS (VALUES {qvals}),
scored AS (
    SELECT q.query_id, p.doc_id,
        round(CAST(sum(CAST(round({term_score} * 1000000.0) AS BIGINT))
            AS DOUBLE) / 1000000.0, 6) AS score
    FROM posting p
    JOIN dfc ON dfc.term = p.term
    JOIN q ON q.term = p.term
    CROSS JOIN consts
    GROUP BY q.query_id, p.doc_id
)
SELECT CAST(query_id AS INTEGER) AS query_id,
    CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank,
    doc_id, score
FROM scored
QUALIFY rank <= {BM25_TOPK}
"""


def lm_perplexity_sql() -> str:
    """Twin of textops.lm_perplexity: same integer bigram/prefix counts
    and vocabulary size, same round-6 ln of integer ratios, per-doc
    averages via the same integer-scaled order-free sum."""
    sh2 = _shingles(2)
    return f"""
WITH bound AS (SELECT doc_id, {WORDS} AS w FROM documents),
g AS (SELECT doc_id, unnest({sh2}) AS gram FROM documents),
c12 AS (SELECT gram, CAST(count(*) AS BIGINT) AS c12 FROM g GROUP BY gram),
lm AS (SELECT gram, c12, split_part(gram, ' ', 1) AS w1 FROM c12),
c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM lm GROUP BY w1),
v AS (
    SELECT CAST(count(DISTINCT word) AS DOUBLE) AS v
    FROM (SELECT unnest(w) AS word FROM bound)
),
logp AS (
    SELECT gram,
        round(ln((CAST(c12 AS DOUBLE) + 1.0) / (CAST(c1 AS DOUBLE) + v)), 6)
            AS logp
    FROM lm JOIN c1 USING (w1), v
),
scored AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        round(CAST(sum(CAST(round(logp * 1000000.0) AS BIGINT)) AS DOUBLE)
            / 1000000.0 / CAST(count(*) AS DOUBLE), 6) AS avg_logprob
    FROM g JOIN logp USING (gram)
    GROUP BY doc_id
)
SELECT b.doc_id,
    coalesce(s.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
    coalesce(s.avg_logprob, 0.0) AS avg_logprob,
    round(exp(-coalesce(s.avg_logprob, 0.0)), 6) AS pseudo_ppl
FROM (SELECT doc_id FROM bound) b
LEFT JOIN scored s ON s.doc_id = b.doc_id
"""


def cross_dup_sql(k: int | None = None) -> str:
    """Twin of textops.cross_doc_duplication: same 1-based gram slices,
    same md5 63-bit gram hash, duplicate test min(doc_id) <> max(doc_id),
    and the same merged-interval fold over sorted gram starts (DuckDB
    list_reduce carrying (prev, covered, spans))."""
    from ..operators.textops import CROSS_DUP_K

    kk = CROSS_DUP_K if k is None else k
    grams = f"""wbase AS (SELECT doc_id, {WORDS} AS w FROM documents),
base AS (
    SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_words,
        CASE WHEN len(w) >= {kk} THEN
            list_transform(generate_series(1, len(w) - {kk - 1}),
                i -> array_to_string(w[i:i+{kk - 1}], ' '))
        ELSE [] END AS g
    FROM wbase
),
grams AS (
    SELECT doc_id, p.i AS pos, {_hexint("g[p.i]")} AS gh
    FROM base, LATERAL (SELECT unnest(generate_series(1, len(g))) AS i) p
),
dup AS (
    SELECT gh FROM grams GROUP BY gh HAVING min(doc_id) <> max(doc_id)
),
hits AS (
    SELECT doc_id, list_sort(list(pos)) AS ps
    FROM grams JOIN dup USING (gh)
    GROUP BY doc_id
),
folded AS (
    SELECT doc_id, ps,
        list_reduce(
            list_prepend({{'prev': CAST(-1000000000 AS BIGINT),
                           'cov': CAST(0 AS BIGINT),
                           'spans': CAST(0 AS BIGINT)}},
                list_transform(ps, x -> {{'prev': CAST(x AS BIGINT),
                                          'cov': CAST(0 AS BIGINT),
                                          'spans': CAST(0 AS BIGINT)}})),
            (acc, e) -> {{'prev': e.prev,
                'cov': acc.cov + least(CAST({kk} AS BIGINT), e.prev - acc.prev),
                'spans': acc.spans + CASE WHEN e.prev - acc.prev > {kk}
                                          THEN 1 ELSE 0 END}}) AS f
    FROM hits
),
covered AS (
    SELECT doc_id,
        list_distinct(flatten(list_transform(ps,
            p -> generate_series(p, p + {kk - 1})))) AS cov
    FROM hits
)"""
    return f"""
WITH {grams}
SELECT b.doc_id,
    CAST(len(b.g) AS BIGINT) AS n_grams_cross,
    CAST(coalesce(len(h.ps), 0) AS BIGINT) AS n_dup_grams_cross,
    round(CAST(coalesce(len(h.ps), 0) AS DOUBLE)
        / nullif(CAST(len(b.g) AS DOUBLE), 0.0), 6) AS dup_gram_frac_cross,
    CASE WHEN h.ps IS NULL THEN 0.0
         ELSE round(CAST(f.f.cov AS DOUBLE)
             / nullif(CAST(b.n_words AS DOUBLE), 0.0), 6)
    END AS dup_token_coverage,
    CAST(coalesce(f.f.spans, 0) AS BIGINT) AS n_dup_spans,
    CAST(coalesce(len(c.cov), 0) AS BIGINT) AS tokens_removed,
    CAST(b.n_words - coalesce(len(c.cov), 0) AS BIGINT) AS cleaned_len,
    coalesce(array_to_string(list_transform(
        list_filter(generate_series(1, b.n_words),
            i -> NOT list_contains(coalesce(c.cov, []), i)),
        i -> b.w[i]), ' '), '') AS cleaned_text
FROM base b
LEFT JOIN hits h USING (doc_id)
LEFT JOIN folded f USING (doc_id)
LEFT JOIN covered c USING (doc_id)
"""


def semdedup_pairs_sql() -> str:
    """Twin of dedup.semantic_dedup_pairs: cluster labels from the
    UNROLLED spherical-k-means chain (kmeans_assign_sql, materialized
    once), within-cell self-join, the same round-6 exact cosine verify
    and threshold as the sign-bucket variant."""
    from ..operators.dedup import COSINE_DUP_THRESHOLD

    return f"""
WITH ev AS (SELECT vec_id, {_VD} AS v FROM embeddings),
km AS MATERIALIZED ({kmeans_assign_sql()})
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
    CAST(a.cluster AS BIGINT) AS cluster,
    round({_cos("ea.v", "eb.v")}, 6) AS cosine
FROM km a
JOIN km b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
JOIN ev ea ON ea.vec_id = a.vec_id
JOIN ev eb ON eb.vec_id = b.vec_id
WHERE round({_cos("ea.v", "eb.v")}, 6) >= {COSINE_DUP_THRESHOLD!r}
"""


def sketch_distinct_sql() -> str:
    """Twin of sketches.distinct_sketch_panel: identical md5-prefix
    60-bit hashes, identical integer register/rho bit math (both
    engines' ``bin`` renders minimal-width), the same integer-scaled
    harmonic sum, the same round-6 estimators (ln only in the
    small-range branch — the DSIR round-6-after-transcendental
    convention), and the same merged-from-components ``__all__`` rows."""
    from ..operators.sketches import (
        HLL_ALPHA_MM,
        HLL_M,
        KMV_K,
        _HLL_RHO_MAX,
        _HLL_W,
    )

    mask = (1 << _HLL_W) - 1
    scale = 1 << _HLL_RHO_MAX
    kmv_num = float((KMV_K - 1) * (1 << 60))
    sh = (
        "CASE WHEN len(w) >= 3 THEN list_transform("
        "generate_series(1, len(w) - 2), i -> array_to_string(w[i:i+2], ' '))"
        " ELSE [] END"
    )

    def metrics(keys: str) -> str:
        """The estimator SELECT over pre-joined (exact, kmv, hll) CTE
        columns — shared by the per-source and merged stages."""
        return f"""
    SELECT {keys}, n_items, exact_distinct, kmv_k,
        CASE WHEN kmv_k < {KMV_K} THEN CAST(kmv_k AS DOUBLE)
             ELSE round({kmv_num!r} / CAST(kmv_hk AS DOUBLE), 6)
        END AS kmv_estimate,
        CAST({HLL_M} - nreg AS BIGINT) AS hll_zero_regs,
        CASE WHEN {HLL_ALPHA_MM!r}
                / (CAST(s_obs + ({HLL_M} - nreg) * {scale} AS DOUBLE)
                   / {float(scale)!r}) <= {2.5 * HLL_M!r}
              AND {HLL_M} - nreg > 0
             THEN round({float(HLL_M)!r}
                * ln({float(HLL_M)!r} / CAST({HLL_M} - nreg AS DOUBLE)), 6)
             ELSE round({HLL_ALPHA_MM!r}
                / (CAST(s_obs + ({HLL_M} - nreg) * {scale} AS DOUBLE)
                   / {float(scale)!r}), 6)
        END AS hll_estimate"""

    def errs(keys: str) -> str:
        return f"""
    SELECT {keys}, n_items, exact_distinct, kmv_k, kmv_estimate,
        round(kmv_estimate / CAST(exact_distinct AS DOUBLE) - 1.0, 6)
            AS kmv_err,
        hll_zero_regs, hll_estimate,
        round(hll_estimate / CAST(exact_distinct AS DOUBLE) - 1.0, 6)
            AS hll_err"""

    return f"""
WITH base AS (SELECT source, {WORDS} AS w FROM documents),
items AS (
    SELECT source, 'word' AS item, unnest(w) AS v FROM base
    UNION ALL
    SELECT source, 'shingle' AS item, unnest({sh}) AS v FROM base
),
occ AS (
    SELECT source, item, CAST(count(*) AS BIGINT) AS n_items
    FROM items GROUP BY source, item
),
hs AS MATERIALIZED (
    SELECT DISTINCT source, item, {_hexint('v')} AS h FROM items
),
exact AS (
    SELECT source, item, CAST(count(*) AS BIGINT) AS exact_distinct
    FROM hs GROUP BY source, item
),
kmin AS MATERIALIZED (
    SELECT source, item, h FROM (
        SELECT source, item, h,
            row_number() OVER (PARTITION BY source, item ORDER BY h ASC) AS rn
        FROM hs
    ) WHERE rn <= {KMV_K}
),
kmv AS (
    SELECT source, item, max(h) AS kmv_hk,
        CAST(count(*) AS BIGINT) AS kmv_k
    FROM kmin GROUP BY source, item
),
regs AS MATERIALIZED (
    SELECT source, item, h >> {_HLL_W} AS reg,
        max(CASE WHEN h & {mask} = 0 THEN {_HLL_RHO_MAX}
                 ELSE {_HLL_RHO_MAX} - length(bin(h & {mask})) END) AS mj
    FROM hs GROUP BY source, item, h >> {_HLL_W}
),
hll AS (
    SELECT source, item,
        CAST(sum(CAST(1 AS BIGINT) << CAST({_HLL_RHO_MAX} - mj AS INT))
            AS BIGINT) AS s_obs,
        CAST(count(*) AS BIGINT) AS nreg
    FROM regs GROUP BY source, item
),
persrc_m AS ({metrics('e.source, e.item')}
    FROM exact e
    JOIN occ o ON e.source = o.source AND e.item = o.item
    JOIN kmv k ON e.source = k.source AND e.item = k.item
    JOIN hll h ON e.source = h.source AND e.item = h.item
),
persrc AS ({errs('source, item')} FROM persrc_m),
occ_all AS (
    SELECT item, CAST(sum(n_items) AS BIGINT) AS n_items
    FROM occ GROUP BY item
),
exact_all AS (
    SELECT item, CAST(count(*) AS BIGINT) AS exact_distinct
    FROM (SELECT DISTINCT item, h FROM hs) GROUP BY item
),
kmv_all AS (
    SELECT item, max(h) AS kmv_hk, CAST(count(*) AS BIGINT) AS kmv_k
    FROM (
        SELECT item, h,
            row_number() OVER (PARTITION BY item ORDER BY h ASC) AS rn
        FROM (SELECT DISTINCT item, h FROM kmin)
    ) WHERE rn <= {KMV_K} GROUP BY item
),
regs_all AS (
    SELECT item, reg, max(mj) AS mj FROM regs GROUP BY item, reg
),
hll_all AS (
    SELECT item,
        CAST(sum(CAST(1 AS BIGINT) << CAST({_HLL_RHO_MAX} - mj AS INT))
            AS BIGINT) AS s_obs,
        CAST(count(*) AS BIGINT) AS nreg
    FROM regs_all GROUP BY item
),
merged_m AS ({metrics('e.item')}
    FROM exact_all e
    JOIN occ_all o ON e.item = o.item
    JOIN kmv_all k ON e.item = k.item
    JOIN hll_all h ON e.item = h.item
),
merged AS ({errs('item')} FROM merged_m)
SELECT source, item, n_items, exact_distinct, kmv_k, kmv_estimate,
    kmv_err, hll_zero_regs, hll_estimate, hll_err
FROM persrc
UNION ALL
SELECT '__all__' AS source, item, n_items, exact_distinct, kmv_k,
    kmv_estimate, kmv_err, hll_zero_regs, hll_estimate, hll_err
FROM merged
"""


def heavy_hitters_sql() -> str:
    """Twin of sketches.heavy_hitters_panel: identical salted md5-prefix
    bucket hashes per CMS row (unrolled — D is a compile-time constant),
    identical integer cell sums over the 3-gram space, exact top-N with
    (count desc, gram asc) tie-break, min-over-rows point estimates."""
    from ..operators.sketches import CMS_D, CMS_W, HH_TOP

    def bucket(gram_expr: str, d: int) -> str:
        salted = f"'cms{d}:' || {gram_expr}"
        return f"{_hexint(salted)} % {CMS_W}"

    cell_rows = "\nUNION ALL\n".join(
        f"SELECT {d} AS d, {bucket('gram', d)} AS bucket, cnt FROM wc"
        for d in range(CMS_D)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT gram, cnt, {d} AS d, {bucket('gram', d)} AS bucket FROM top"
        for d in range(CMS_D)
    )
    return f"""
WITH wc AS MATERIALIZED (
    SELECT g AS gram, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest({_shingles()}) AS g FROM documents) GROUP BY g
),
cells AS MATERIALIZED (
    SELECT d, bucket, CAST(sum(cnt) AS BIGINT) AS cell
    FROM ({cell_rows}) GROUP BY d, bucket
),
top AS MATERIALIZED (
    SELECT gram, cnt FROM wc ORDER BY cnt DESC, gram ASC LIMIT {HH_TOP}
),
est AS (
    SELECT p.gram, p.cnt, min(c.cell) AS cms_estimate
    FROM ({probe_rows}) p JOIN cells c ON p.d = c.d AND p.bucket = c.bucket
    GROUP BY p.gram, p.cnt
)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, gram ASC) AS BIGINT) AS rank,
    gram, cnt AS exact_count, cms_estimate,
    cms_estimate - cnt AS cms_overcount
FROM est
"""


def reservoir_sql() -> str:
    """Twin of sketches.weighted_reservoir_sample: same md5 u01 coin
    FLOORED at 2^-60 (u=0 would make DuckDB's ln(0) hard-fail while
    Spark's F.log(0) silently NULLs), same (round-6 key DESC, full key
    DESC, doc_id ASC) ranking chain — the round-11/12 ADVICE hardenings,
    applied in both engines."""
    from ..operators.sketches import RESERVOIR_K, RESERVOIR_SALT

    salted = f"'{RESERVOIR_SALT}' || CAST(doc_id AS VARCHAR)"
    u = (
        f"greatest(CAST({_hexint(salted)} AS DOUBLE) / {float(1 << 60)!r}, "
        f"{2.0 ** -60!r})"
    )
    return f"""
WITH d AS (
    SELECT doc_id, CAST(len({WORDS}) AS DOUBLE) AS w,
        round(ln({u}) / CAST(len({WORDS}) AS DOUBLE), 6) AS k,
        ln({u}) / CAST(len({WORDS}) AS DOUBLE) AS kf
    FROM documents WHERE len({WORDS}) > 0
)
SELECT CAST(row_number() OVER (ORDER BY k DESC, kf DESC, doc_id ASC)
        AS BIGINT) AS rank,
    doc_id, CAST(w AS BIGINT) AS weight, k AS res_key
FROM d ORDER BY k DESC, kf DESC, doc_id ASC LIMIT {RESERVOIR_K}
"""


def bm25_union_sql() -> str:
    """Long-format union twin of the merged ``bm25_retrieval`` gate
    entry: the corpus-scoring panel ('scores' rows) and the batch top-k
    retrieval ('topk' rows), columns NULL-padded where a stage doesn't
    produce them — every value certified by the two former entries keeps
    flowing through the hash compare."""
    from ..operators.textops import BM25_QUERY

    tf_cols = ", ".join(f"tf_{t}" for t in BM25_QUERY)
    tf_nulls = ", ".join(
        f"CAST(NULL AS BIGINT) AS tf_{t}" for t in BM25_QUERY
    )
    return f"""
SELECT 'scores' AS stage, doc_id, n_words, {tf_cols}, bm25,
    CAST(NULL AS BIGINT) AS query_id, CAST(NULL AS BIGINT) AS rank,
    CAST(NULL AS DOUBLE) AS score
FROM ({bm25_scores_sql()})
UNION ALL
SELECT 'topk' AS stage, doc_id, CAST(NULL AS BIGINT) AS n_words,
    {tf_nulls}, CAST(NULL AS DOUBLE) AS bm25,
    CAST(query_id AS BIGINT) AS query_id, rank, score
FROM ({bm25_topk_sql()})
"""


def dsir_sql() -> str:
    """Twin of textops.dsir_weights at the default configuration: same
    hashed unigram+bigram buckets (md5-prefix ints mod B), same round-6
    Laplace log-ratios in identical association order, integer-scaled
    exact per-doc sums, same clamped round-6 exp, same two global
    scalars (N, Σw), same (salt, doc_id) md5 membership coin."""
    from ..operators.textops import (
        DSIR_ALPHA,
        DSIR_BUCKETS,
        DSIR_KEEP_RATE,
        DSIR_LOGW_CLAMP,
        DSIR_SALT,
        DSIR_TARGET_SOURCE,
        SAMPLE_MOD,
    )

    b = DSIR_BUCKETS
    ab = float(DSIR_ALPHA) * float(b)
    bigrams = (
        "CASE WHEN len(w) >= 2 THEN "
        "list_transform(generate_series(1, len(w) - 1), "
        "i -> array_to_string(w[i:i+1], ' ')) "
        "ELSE [] END"
    )
    coin = _hexint(f"'{DSIR_SALT}:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH base AS (SELECT doc_id, source, {WORDS} AS w FROM documents),
grams AS (
    SELECT doc_id, source, {_hexint('g')} % {b} AS bucket
    FROM (
        SELECT doc_id, source, unnest(list_concat(w, {bigrams})) AS g
        FROM base
    )
),
bstats AS (
    SELECT bucket, CAST(count(*) AS DOUBLE) AS raw_cnt,
        CAST(sum(CASE WHEN source = '{DSIR_TARGET_SOURCE}' THEN 1 ELSE 0 END)
            AS DOUBLE) AS tgt_cnt
    FROM grams GROUP BY bucket
),
tots AS (
    SELECT sum(raw_cnt) AS raw_tot, sum(tgt_cnt) AS tgt_tot FROM bstats
),
lamrel AS (
    SELECT bucket,
        round(ln((tgt_cnt + {DSIR_ALPHA!r}) / (tgt_tot + {ab!r}))
            - ln((raw_cnt + {DSIR_ALPHA!r}) / (raw_tot + {ab!r})), 6) AS lam
    FROM bstats, tots
),
docw AS (
    SELECT doc_id, min(source) AS source,
        CAST(count(*) AS BIGINT) AS n_grams,
        round(CAST(sum(CAST(round(lam * 1000000.0, 0) AS HUGEINT))
            AS DOUBLE) / 1000000.0, 6) AS logw
    FROM grams JOIN lamrel USING (bucket)
    GROUP BY doc_id
),
doce AS (
    SELECT *,
        round(exp(least(greatest(logw, -{DSIR_LOGW_CLAMP!r}),
            {DSIR_LOGW_CLAMP!r})), 6) AS expw
    FROM docw
),
zrel AS (
    SELECT CAST(count(*) AS DOUBLE) AS n,
        CAST(sum(CAST(round(expw * 1000000.0, 0) AS HUGEINT)) AS DOUBLE)
            / 1000000.0 AS z
    FROM doce
),
final AS (
    SELECT doc_id, source, n_grams, logw,
        round(least(1.0, {DSIR_KEEP_RATE!r} * n * expw / z), 6) AS sel_prob
    FROM doce, zrel
)
SELECT doc_id, source, n_grams, logw, sel_prob,
    ({coin} % {SAMPLE_MOD})
        < CAST(floor(sel_prob * {SAMPLE_MOD}.0) AS BIGINT) AS selected,
    logw > 0.0 AS target_like
FROM final
"""


def qdigest_sql() -> str:
    """Twin of sketches.qdigest_quantile_panel over per-symbol bar
    durations: identical node ids (leaf = v + U), identical bottom-up
    sibling-pair compression unrolled level by level (bit_length via
    minimal-width ``bin``, the HLL convention), identical integer target
    ranks ((num*n + den - 1) div den — never float ceil), and the same
    merged-from-components ``__all__`` row (node-wise count addition,
    one re-compression under the global threshold)."""
    from ..operators.sketches import QD_K, QD_L, QD_QS, QD_U
    from ..sources.bars import BARS_DUCKDB_CTE

    def levels(src: str, trel: str, pre: str) -> tuple[str, str]:
        # the paper's parent-aware rule (count(children) + count(parent)
        # <= T absorbs both into the parent): parents can pre-exist when
        # re-compressing MERGED digests, so each level full-outer-joins
        # the sibling-pair sums with the already-present parent row
        parts, cur = [], src
        for bl in range(QD_L + 1, 1, -1):
            p, nxt = f"{pre}p{bl}", f"{pre}l{bl - 1}"
            parts.append(f"""
{p} AS MATERIALIZED (
    SELECT j.source, j.pid, j.csum, j.pcnt,
        coalesce(j.csum, 0) + coalesce(j.pcnt, 0) AS total,
        (j.csum IS NOT NULL
         AND coalesce(j.csum, 0) + coalesce(j.pcnt, 0) <= tr.t) AS merge_up
    FROM (
        SELECT coalesce(c.source, q.source) AS source,
            coalesce(c.pid, q.pid) AS pid, c.csum, q.pcnt
        FROM (
            SELECT source, id >> 1 AS pid, CAST(sum(cnt) AS BIGINT) AS csum
            FROM {cur} WHERE length(bin(id)) = {bl} GROUP BY source, id >> 1
        ) c
        FULL OUTER JOIN (
            SELECT source, id AS pid, cnt AS pcnt
            FROM {cur} WHERE length(bin(id)) = {bl - 1}
        ) q ON c.source = q.source AND c.pid = q.pid
    ) j JOIN {trel} tr ON tr.source = j.source
)""")
            parts.append(f"""
{nxt} AS MATERIALIZED (
    SELECT source, id, cnt FROM {cur}
    WHERE length(bin(id)) != {bl} AND length(bin(id)) != {bl - 1}
    UNION ALL
    SELECT n.source, n.id, n.cnt FROM {cur} n
    JOIN {p} p ON n.source = p.source AND (n.id >> 1) = p.pid
    WHERE length(bin(n.id)) = {bl} AND NOT p.merge_up
    UNION ALL
    SELECT source, pid AS id, pcnt AS cnt FROM {p}
    WHERE NOT merge_up AND pcnt IS NOT NULL
    UNION ALL
    SELECT source, pid AS id, total AS cnt FROM {p} WHERE merge_up
)""")
            cur = nxt
        return ",".join(parts), cur

    qvals = ", ".join(f"({num}, {den}, '{lab}')" for num, den, lab in QD_QS)

    def qpanel(dg: str, hs: str, pre: str) -> tuple[str, str]:
        h = f"({QD_L + 1} - length(bin(id)))"
        return f"""
{pre}spans AS (
    SELECT source, cnt, (id << {h}) - {QD_U} AS vmin,
        (id << {h}) - {QD_U} + (CAST(1 AS BIGINT) << {h}) - 1 AS vmax
    FROM {dg}
),
{pre}cum AS (
    SELECT source, vmax, CAST(sum(cnt) OVER (PARTITION BY source
        ORDER BY vmax ASC, vmin DESC ROWS UNBOUNDED PRECEDING)
        AS BIGINT) AS cum
    FROM {pre}spans
),
{pre}sizes AS (
    SELECT source, CAST(sum(cnt) AS BIGINT) AS n,
        CAST(count(*) AS BIGINT) AS qd_nodes
    FROM {dg} GROUP BY source
),
{pre}targets AS MATERIALIZED (
    SELECT source, n, qd_nodes, lab, (num * n + den - 1) // den AS r
    FROM {pre}sizes CROSS JOIN (VALUES {qvals}) q(num, den, lab)
),
{pre}est AS (
    SELECT t.source, t.lab, t.n, t.qd_nodes, min(c.vmax) AS qd_estimate
    FROM {pre}targets t JOIN {pre}cum c
        ON c.source = t.source AND c.cum >= t.r
    GROUP BY t.source, t.lab, t.n, t.qd_nodes
),
{pre}ecum AS (
    SELECT source, v, CAST(sum(cnt) OVER (PARTITION BY source ORDER BY v
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
    FROM {hs}
),
{pre}exact AS (
    SELECT t.source, t.lab, min(e.v) AS exact_q
    FROM {pre}targets t JOIN {pre}ecum e
        ON e.source = t.source AND e.cum >= t.r
    GROUP BY t.source, t.lab
),
{pre}panel AS (
    SELECT e.source, 'bardur_' || e.lab AS item, e.n AS n_values,
        x.exact_q, e.qd_estimate, e.qd_estimate - x.exact_q AS qd_err,
        e.qd_nodes
    FROM {pre}est e JOIN {pre}exact x
        ON e.source = x.source AND e.lab = x.lab
)""", f"{pre}panel"

    src_levels, src_final = levels("leaves", "trel", "s")
    mrg_levels, mrg_final = levels("merged0", "trel_all", "m")
    src_q, src_panel = qpanel(src_final, "hist", "qs")
    mrg_q, mrg_panel = qpanel(mrg_final, "hist_all", "qm")
    return f"""
WITH {BARS_DUCKDB_CTE},
vals AS (SELECT symbol AS source,
    greatest(0, least(duration_us // 256, {QD_U} - 1)) AS v FROM bars),
hist AS MATERIALIZED (
    SELECT source, v, CAST(count(*) AS BIGINT) AS cnt
    FROM vals GROUP BY source, v
),
leaves AS (SELECT source, v + {QD_U} AS id, cnt FROM hist),
trel AS MATERIALIZED (
    SELECT source, CAST(sum(cnt) AS BIGINT) // {QD_K} AS t
    FROM hist GROUP BY source
),{src_levels},
merged0 AS MATERIALIZED (
    SELECT '__all__' AS source, id, CAST(sum(cnt) AS BIGINT) AS cnt
    FROM {src_final} GROUP BY id
),
trel_all AS MATERIALIZED (
    SELECT source, CAST(sum(cnt) AS BIGINT) // {QD_K} AS t
    FROM merged0 GROUP BY source
),{mrg_levels},
hist_all AS (
    SELECT '__all__' AS source, v, CAST(sum(cnt) AS BIGINT) AS cnt
    FROM hist GROUP BY v
),{src_q},{mrg_q}
SELECT * FROM {src_panel} UNION ALL SELECT * FROM {mrg_panel}
"""


def sketch_union_sql() -> str:
    """Long-format union twin of the ``sketch_distinct`` gate entry
    after the round-11 fold-in of the q-digest quantile panel (zero
    gate-slot cost, the ivf_cell/dedup_exact pattern): distinct-sketch
    rows NULL-pad the quantile columns and vice versa — every pad is
    BIGINT/DOUBLE, so no VARCHAR bridging is needed, and every
    formerly-certified value keeps flowing through the hash."""
    return f"""
SELECT source, item, n_items, exact_distinct, kmv_k, kmv_estimate,
    kmv_err, hll_zero_regs, hll_estimate, hll_err,
    CAST(NULL AS BIGINT) AS exact_q, CAST(NULL AS BIGINT) AS qd_estimate,
    CAST(NULL AS BIGINT) AS qd_err, CAST(NULL AS BIGINT) AS qd_nodes
FROM ({sketch_distinct_sql()})
UNION ALL
SELECT source, item, n_values AS n_items,
    CAST(NULL AS BIGINT) AS exact_distinct,
    CAST(NULL AS BIGINT) AS kmv_k, CAST(NULL AS DOUBLE) AS kmv_estimate,
    CAST(NULL AS DOUBLE) AS kmv_err,
    CAST(NULL AS BIGINT) AS hll_zero_regs,
    CAST(NULL AS DOUBLE) AS hll_estimate, CAST(NULL AS DOUBLE) AS hll_err,
    exact_q, qd_estimate, qd_err, qd_nodes
FROM ({qdigest_sql()})
"""


def mrl_quantiles_sql() -> str:
    """Twin of sketches.mergeable_quantile_panel over per-symbol bar
    returns: the identical deterministic MRL collapse (chunk -> source ->
    corpus), the same value-grain exact ground truth, the same
    rank-range error and additive step bound — pure window SQL, so the
    cross-engine hash certifies every stage including the merge."""
    from ..operators.sketches import MRL_CHUNK, MRL_M, MRL_QS
    from ..sources.bars import BARS_DUCKDB_CTE

    M, C = MRL_M, MRL_CHUNK
    vals = ", ".join(f"({n}, {d}, '{lab}')" for n, d, lab in MRL_QS)

    def collapse(src: str, keys: str, order: str, out_cols: str) -> str:
        return f"""(
    SELECT {out_cols},
        cumw - coalesce(lag(cumw) OVER (PARTITION BY {keys}
            ORDER BY {order}), 0) AS w
    FROM (
        SELECT *, (tw + {M - 1}) // {M} AS step FROM (
            SELECT *,
                sum(w) OVER (PARTITION BY {keys} ORDER BY {order}
                    ROWS UNBOUNDED PRECEDING) AS cumw,
                sum(w) OVER (PARTITION BY {keys}) AS tw
            FROM {src})
        ) WHERE (cumw // step) > ((cumw - w) // step)
)"""

    c1 = collapse("c0", "source, chunk", "v, id", "source, chunk, v, id")
    s2 = collapse("c1", "source", "v, id", "source, v, id")
    a3 = collapse("a0", "source", "v, _src, id", "source, _src, v, id")
    return f"""
WITH {BARS_DUCKDB_CTE},
obs AS (
    SELECT symbol AS source, CAST(rn AS BIGINT) AS id,
        round((close - "open") / "open", 6) AS v
    FROM bars
),
c0 AS (
    SELECT source, (id - 1) // {C} AS chunk, v, CAST(1 AS BIGINT) AS w, id
    FROM obs
),
c1 AS {c1},
s2 AS {s2},
a0 AS (SELECT '__all__' AS source, source AS _src, v, w, id FROM s2),
a3 AS {a3},
summaries AS (
    SELECT source, source AS _tb, v, w, id FROM s2
    UNION ALL
    SELECT source, _src AS _tb, v, w, id FROM a3
),
scum AS (
    SELECT source, v, w,
        sum(w) OVER (PARTITION BY source ORDER BY v, _tb, id
            ROWS UNBOUNDED PRECEDING) AS cumw
    FROM summaries
),
hist AS (
    SELECT source, v, CAST(count(*) AS BIGINT) AS cnt
    FROM obs GROUP BY source, v
),
hist2 AS (
    SELECT * FROM hist
    UNION ALL
    SELECT '__all__', v, sum(cnt) FROM hist GROUP BY v
),
hcum AS (
    SELECT source, v, cnt,
        sum(cnt) OVER (PARTITION BY source ORDER BY v
            ROWS UNBOUNDED PRECEDING) AS cum
    FROM hist2
),
ns AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_values
    FROM obs GROUP BY source
    UNION ALL
    SELECT '__all__', CAST(count(*) AS BIGINT) FROM obs
),
st1 AS (
    SELECT source, max((cn + {M - 1}) // {M}) AS b1 FROM (
        SELECT source, (id - 1) // {C} AS chunk,
            CAST(count(*) AS BIGINT) AS cn
        FROM obs GROUP BY source, (id - 1) // {C}
    ) GROUP BY source
),
st2 AS (
    SELECT source, (n_values + {M - 1}) // {M} AS b2
    FROM ns WHERE source != '__all__'
),
bsrc AS (
    SELECT source, b1 + b2 AS err_bound FROM st1 JOIN st2 USING (source)
),
bounds AS (
    SELECT * FROM bsrc
    UNION ALL
    SELECT '__all__', (SELECT sum(err_bound) FROM bsrc)
        + (n_values + {M - 1}) // {M}
    FROM ns WHERE source = '__all__'
),
targets AS (SELECT * FROM (VALUES {vals}) t(qnum, qden, q_label)),
est AS (
    SELECT s.source, t.q_label, n.n_values,
        (t.qnum * n.n_values + t.qden - 1) // t.qden AS rank_target,
        min(s.v) AS est_q
    FROM scum s JOIN ns n USING (source) CROSS JOIN targets t
    WHERE s.cumw >= (t.qnum * n.n_values + t.qden - 1) // t.qden
    GROUP BY s.source, t.q_label, n.n_values,
        (t.qnum * n.n_values + t.qden - 1) // t.qden
),
exact AS (
    SELECT h.source, t.q_label, min(h.v) AS exact_q
    FROM hcum h JOIN ns n USING (source) CROSS JOIN targets t
    WHERE h.cum >= (t.qnum * n.n_values + t.qden - 1) // t.qden
    GROUP BY h.source, t.q_label
),
rk AS (
    SELECT e.source, e.q_label,
        CAST(h.cum - h.cnt + 1 AS BIGINT) AS rank_lo,
        CAST(h.cum AS BIGINT) AS rank_hi
    FROM est e JOIN hcum h ON h.source = e.source AND h.v = e.est_q
),
n_items AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_items
    FROM summaries GROUP BY source
)
SELECT e.source, 'ret' AS item, e.q_label, e.n_values, i.n_items,
    e.est_q, x.exact_q,
    CAST(e.rank_target AS BIGINT) AS rank_target,
    r.rank_lo, r.rank_hi,
    greatest(CAST(0 AS BIGINT),
        r.rank_lo - e.rank_target, e.rank_target - r.rank_hi) AS rank_err,
    CAST(b.err_bound AS BIGINT) AS err_bound,
    CAST(greatest(CAST(0 AS BIGINT), r.rank_lo - e.rank_target,
        e.rank_target - r.rank_hi) <= b.err_bound AS VARCHAR)
        AS within_bound
FROM est e
JOIN exact x ON x.source = e.source AND x.q_label = e.q_label
JOIN rk r ON r.source = e.source AND r.q_label = e.q_label
JOIN n_items i ON i.source = e.source
JOIN bounds b ON b.source = e.source
"""
