"""Cardinality sketches: estimator accuracy, mergeability, and
partition-layout invariance (the oracle hash compare lives in
test_queries_oracle via the ``sketch_distinct`` entry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rangebar_patterns_spark.operators.sketches import (
    HLL_M,
    KMV_K,
    distinct_sketch_panel,
)
from rangebar_patterns_spark.sources.tables import load_table

from conftest import SF_DIR


def _panel(spark, docs=None):
    docs = docs if docs is not None else load_table(spark, SF_DIR, "documents")
    return {(r.source, r.item): r for r in distinct_sketch_panel(docs).collect()}


def test_exact_column_is_exact_and_errors_bounded(spark):
    """The ground-truth column must equal a straight countDistinct on
    the md5 hashes, and both estimators land within sketch-theory
    bounds (HLL m=256 -> ~6.5% sigma; KMV K=64 -> ~12.5% sigma; assert
    4 sigma so the test never flakes on a fixture refresh)."""
    from rangebar_patterns_spark.operators.dedup import hexint, words_col

    docs = load_table(spark, SF_DIR, "documents")
    rows = _panel(spark)
    truth = {
        r.source: r.n
        for r in docs.select("source", F.explode(words_col()).alias("v"))
        .select("source", hexint(F.col("v")).alias("h"))
        .groupBy("source")
        .agg(F.countDistinct("h").alias("n"))
        .collect()
    }
    for src, n in truth.items():
        r = rows[(src, "word")]
        assert r.exact_distinct == n
        if r.kmv_k == KMV_K:
            assert abs(r.kmv_err) < 0.5
        else:  # small-set fallback is exact by definition
            assert r.kmv_estimate == float(r.exact_distinct)
        assert abs(r.hll_err) < 0.26
        assert 0 <= r.hll_zero_regs <= HLL_M


def test_merged_rows_equal_global_sketch(spark):
    """Mergeability: the __all__ rows (built from per-source components)
    must equal the sketch computed on the corpus as ONE source — the
    associativity contract that lets 100 TB roll up per-partition."""
    docs = load_table(spark, SF_DIR, "documents")
    rows = _panel(spark)
    mono = _panel(spark, docs.withColumn("source", F.lit("only")))
    for item in ("word", "shingle"):
        merged, single = rows[("__all__", item)], mono[("only", item)]
        assert merged.exact_distinct == single.exact_distinct
        assert merged.kmv_estimate == single.kmv_estimate
        assert merged.hll_estimate == single.hll_estimate
        assert merged.hll_zero_regs == single.hll_zero_regs
        assert merged.n_items == single.n_items
        # and __all__ also matches its own global-scan ground truth
        assert mono[("__all__", item)].hll_estimate == single.hll_estimate


def test_partition_layout_invariant(spark):
    """Hash registers, k-min sets, and integer-scaled sums are
    order-free: any repartitioning yields the identical panel."""
    docs = load_table(spark, SF_DIR, "documents")
    a = _panel(spark, docs)
    b = _panel(spark, docs.repartition(17, "doc_id"))
    assert a == b


def test_cms_never_undercounts_and_top_ranks_are_exact(spark):
    """Count-Min point estimates are >= the true count by construction
    (cells only ever add), the panel's ranks/exact counts must agree
    with a straight groupBy ground truth, and the gram space is big
    enough (~16K over 512 buckets) that collisions actually happen —
    the overcount column certifies real error, not zeros."""
    from pyspark.sql import functions as F

    from rangebar_patterns_spark.operators.dedup import shingles_col, words_col
    from rangebar_patterns_spark.operators.sketches import (
        HH_TOP,
        heavy_hitters_panel,
    )

    docs = load_table(spark, SF_DIR, "documents")
    panel = heavy_hitters_panel(docs).collect()
    truth = dict(
        docs.select(words_col().alias("w"))
        .select(F.explode(shingles_col(words=F.col("w"))).alias("g"))
        .groupBy("g")
        .count()
        .collect()
    )
    assert len(panel) == min(HH_TOP, len(truth))
    assert all(r.cms_overcount >= 0 for r in panel)
    assert all(r.cms_estimate == r.exact_count + r.cms_overcount for r in panel)
    assert any(r.cms_overcount > 0 for r in panel)
    for r in panel:
        assert truth[r.gram] == r.exact_count
    ranks = sorted((-r.exact_count, r.gram) for r in panel)
    assert [g for _, g in ranks] == [
        r.gram for r in sorted(panel, key=lambda r: r.rank)
    ]


def test_cms_sketches_merge_by_addition(spark):
    """Two sketches over disjoint corpus halves must add cell-wise into
    the corpus sketch — the associativity that lets every partition /
    source / day keep its own D*W integers and roll up for free."""
    from pyspark.sql import functions as F

    from rangebar_patterns_spark.operators.sketches import cms_cells

    docs = load_table(spark, SF_DIR, "documents")
    full = {
        (r.d, r.bucket): r.cell for r in cms_cells(docs).collect()
    }
    merged: dict = {}
    for half in (docs.filter(F.col("doc_id") % 2 == 0),
                 docs.filter(F.col("doc_id") % 2 == 1)):
        for r in cms_cells(half).collect():
            merged[(r.d, r.bucket)] = merged.get((r.d, r.bucket), 0) + r.cell
    assert merged == full


def test_cms_partition_layout_invariant(spark):
    from rangebar_patterns_spark.operators.sketches import (
        heavy_hitters_panel,
    )

    docs = load_table(spark, SF_DIR, "documents")
    a = sorted(map(tuple, heavy_hitters_panel(docs).collect()))
    b = sorted(
        map(tuple, heavy_hitters_panel(docs.repartition(13, "doc_id")).collect())
    )
    assert a == b


def test_weighted_reservoir_sample(spark, duck):
    """A-ES weighted sampling: the Spark top-k matches both the DuckDB
    twin and a pure-Python reference (md5 u01 floored at 2^-60, ranking
    chain round-6 key DESC / full key DESC / doc_id ASC — the round-12
    ADVICE hardening), and is partition-layout invariant."""
    import hashlib
    import math

    import pyarrow.parquet as pq

    from rangebar_patterns_spark.operators.sketches import (
        RESERVOIR_K,
        RESERVOIR_SALT,
        weighted_reservoir_sample,
    )
    from rangebar_patterns_spark.plans.textops_oracle import reservoir_sql

    docs = load_table(spark, SF_DIR, "documents")
    got = [tuple(r) for r in weighted_reservoir_sample(docs).collect()]
    assert len(got) == RESERVOIR_K

    from conftest import compare_frames

    compare_frames(
        weighted_reservoir_sample(docs), duck.execute(reservoir_sql()).df()
    )

    tbl = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    ref = []
    for doc_id, text in zip(tbl["doc_id"], tbl["text"]):
        w = len([x for x in text.split(" ") if x != ""])
        if w == 0:
            continue
        h = int(
            hashlib.md5(f"{RESERVOIR_SALT}{doc_id}".encode()).hexdigest()[:15],
            16,
        )
        u = max(float(h) / float(1 << 60), 2.0**-60)
        full = math.log(u) / float(w)
        key = round(full, 6)
        ref.append((-key, -full, doc_id, w, key))
    ref.sort()
    expect = [
        (i + 1, doc_id, w, rk)
        for i, (_, _f, doc_id, w, rk) in enumerate(ref[:RESERVOIR_K])
    ]
    assert got == expect

    shuffled = [
        tuple(r)
        for r in weighted_reservoir_sample(
            docs.repartition(13, "source")
        ).collect()
    ]
    assert shuffled == got


# ---------------------------------------------------------------------------
# q-digest quantile sketch (round 11)
# ---------------------------------------------------------------------------


def _ref_compress(nodes, u, t):
    """Pure-Python bottom-up q-digest compression with the paper's
    parent-aware rule (count(children) + count(parent) <= t absorbs
    both) — parents pre-exist when re-compressing merged digests."""
    lmax = u.bit_length()  # leaf ids have this bit_length
    for bl in range(lmax, 1, -1):
        pairs: dict[int, int] = {}
        for i, c in list(nodes.items()):
            if i.bit_length() == bl:
                pairs[i >> 1] = pairs.get(i >> 1, 0) + c
        for pid, csum in pairs.items():
            total = csum + nodes.get(pid, 0)
            if total <= t:
                nodes.pop(2 * pid, None)
                nodes.pop(2 * pid + 1, None)
                nodes[pid] = total
    return nodes


def _ref_qdigest(values, u, k):
    """Pure-Python q-digest from raw values: histogram leaves compressed
    under t = n div k — the third implementation that pins the node-id
    bit conventions independently of both engines."""
    from collections import Counter

    hist = Counter(values)
    n = sum(hist.values())
    t = n // k
    nodes = _ref_compress({v + u: c for v, c in hist.items()}, u, t)
    return nodes, hist, n, t


def _ref_qd_query(nodes, hist, n, u, qs):
    """(lab -> (exact, estimate)) from a digest + the true histogram."""
    lmax = u.bit_length()
    spans = []
    for i, c in nodes.items():
        h = lmax - i.bit_length()
        vmin = (i << h) - u
        vmax = vmin + (1 << h) - 1
        spans.append((vmax, -vmin, c))
    spans.sort()
    svals = sorted(hist)
    out = {}
    for num, den, lab in qs:
        r = (num * n + den - 1) // den
        cum, est = 0, None
        for vmax, _, c in spans:
            cum += c
            if cum >= r:
                est = vmax
                break
        cum, exact = 0, None
        for v in svals:
            cum += hist[v]
            if cum >= r:
                exact = v
                break
        out[lab] = (exact, est)
    return out


def test_qdigest_matches_pure_python_reference(spark):
    """The full certified panel — per-symbol rows AND the merged
    __all__ row built from the per-symbol digests — re-derived with
    dicts and loops, plus the paper's guarantees: one-sided value error,
    rank error <= log2(U) * t, and digest size <= 3k."""
    from rangebar_patterns_spark.operators.sketches import (
        QD_K,
        QD_L,
        QD_QS,
        QD_U,
        qdigest_quantile_panel,
    )
    from rangebar_patterns_spark.sources.bars import bars_from_events

    bars = bars_from_events(spark, SF_DIR)
    vals = bars.select(
        F.col("symbol").alias("source"),
        F.expr("CAST(duration_us DIV 256 AS BIGINT)").alias("v"),
    )
    per_src: dict[str, list[int]] = {}
    for r in vals.collect():
        per_src.setdefault(r.source, []).append(r.v)

    expect = {}
    merged_nodes: dict[int, int] = {}
    n_all = 0
    for src, values in per_src.items():
        nodes, hist, n, t = _ref_qdigest(values, QD_U, QD_K)
        for lab, (exact, est) in _ref_qd_query(
            nodes, hist, n, QD_U, QD_QS
        ).items():
            expect[(src, f"bardur_{lab}")] = (
                n, exact, est, est - exact, len(nodes)
            )
        assert len(nodes) <= 3 * QD_K
        for i, c in nodes.items():
            merged_nodes[i] = merged_nodes.get(i, 0) + c
        n_all += n
    # the merged row: node-wise addition + one re-compression — rebuild
    # by pushing the merged node counts back through the compressor
    from collections import Counter

    t_all = n_all // QD_K
    nodes = _ref_compress(dict(merged_nodes), QD_U, t_all)
    hist_all: Counter = Counter()
    for values in per_src.values():
        hist_all.update(values)
    for lab, (exact, est) in _ref_qd_query(
        nodes, hist_all, n_all, QD_U, QD_QS
    ).items():
        expect[("__all__", f"bardur_{lab}")] = (
            n_all, exact, est, est - exact, len(nodes)
        )

    got = {
        (r.source, r.item): (
            r.n_values, r.exact_q, r.qd_estimate, r.qd_err, r.qd_nodes
        )
        for r in qdigest_quantile_panel(vals, "bardur").collect()
    }
    assert got == expect

    # paper guarantees, on the real engine output: one-sided error and
    # rank error within log2(U) * t of the target
    for (src, _), (n, exact, est, err, _) in got.items():
        assert err >= 0
        values = (
            sorted(v for vs in per_src.values() for v in vs)
            if src == "__all__"
            else sorted(per_src[src])
        )
        t = len(values) // QD_K
        import bisect

        true_rank_est = bisect.bisect_right(values, est)
        true_rank_exact = bisect.bisect_right(values, exact)
        assert true_rank_est - true_rank_exact <= QD_L * t


def test_qdigest_partition_invariance(spark):
    from rangebar_patterns_spark.operators.sketches import (
        qdigest_quantile_panel,
    )
    from rangebar_patterns_spark.sources.bars import bars_from_events

    bars = bars_from_events(spark, SF_DIR)
    vals = bars.select(
        F.col("symbol").alias("source"),
        F.expr("CAST(duration_us DIV 256 AS BIGINT)").alias("v"),
    )
    a = sorted(map(tuple, qdigest_quantile_panel(vals, "bardur").collect()))
    b = sorted(
        map(
            tuple,
            qdigest_quantile_panel(
                vals.repartition(13, "v"), "bardur"
            ).collect(),
        )
    )
    assert a == b


# ---------------------------------------------------------------------------
# MRL float-domain mergeable quantile summary (round 12)
# ---------------------------------------------------------------------------


def _mrl_obs(spark):
    from pyspark.sql import functions as F

    from rangebar_patterns_spark.sources import bars_from_events

    bars = bars_from_events(spark, SF_DIR)
    return bars.select(
        F.col("symbol").alias("source"),
        F.col("rn").cast("long").alias("id"),
        F.round((F.col("close") - F.col("open")) / F.col("open"), 6).alias(
            "v"
        ),
    )


def _ref_collapse(items, m):
    """Pure-Python deterministic MRL collapse: items = [(tie..., v, w)],
    sorted by tie; returns kept [(tie..., v, w')] with total weight
    preserved."""
    tw = sum(w for *_t, w in items)
    step = (tw + m - 1) // m
    out, cumw, prev_kept = [], 0, 0
    for *t, w in items:
        cumw += w
        if (cumw // step) > ((cumw - w) // step):
            out.append((*t, cumw - prev_kept))
            prev_kept = cumw
    return out


def test_mrl_matches_oracle_and_python_reference(spark, duck):
    """The full panel hash-matches the DuckDB twin AND a pure-Python
    third implementation of the 3-stage collapse (chunk -> source ->
    corpus merge), including exact ground truth, rank-range errors and
    the additive step bound."""
    from collections import defaultdict

    from rangebar_patterns_spark.operators.sketches import (
        MRL_CHUNK,
        MRL_M,
        MRL_QS,
        mergeable_quantile_panel,
    )
    from rangebar_patterns_spark.plans.textops_oracle import mrl_quantiles_sql

    from conftest import compare_frames

    obs_df = _mrl_obs(spark)
    panel = mergeable_quantile_panel(obs_df, "ret")
    compare_frames(panel, duck.execute(mrl_quantiles_sql()).df())

    obs = [(r.source, r.id, r.v) for r in obs_df.collect()]
    by_chunk = defaultdict(list)
    for src, i, v in obs:
        by_chunk[(src, (i - 1) // MRL_CHUNK)].append((v, i, 1))
    # stage 1: chunk collapse (tie = (v, id)); stage 2: source merge
    by_src = defaultdict(list)
    for (src, _c), items in by_chunk.items():
        for v, i, w in _ref_collapse(sorted(items), MRL_M):
            by_src[src].append((v, i, w))
    summaries = {
        src: _ref_collapse(sorted(items), MRL_M)
        for src, items in by_src.items()
    }
    # stage 3: corpus merge of the per-source summaries (tie = (v, src, id))
    union = [
        (v, src, i, w)
        for src, items in summaries.items()
        for v, i, w in items
    ]
    merged = _ref_collapse(sorted(union), MRL_M)

    # rebuild the expected panel rows
    import math

    vals = defaultdict(list)
    for src, _i, v in obs:
        vals[src].append(v)
        vals["__all__"].append(v)
    summ_cum = {}
    for src, items in summaries.items():
        acc, rows = 0, []
        for v, _i, w in sorted(items):
            acc += w
            rows.append((v, acc))
        summ_cum[src] = rows
    acc, rows = 0, []
    for v, _s, _i, w in sorted(merged):
        acc += w
        rows.append((v, acc))
    summ_cum["__all__"] = rows

    bounds = {}
    for src, items in by_chunk.items():
        pass
    chunk_n = defaultdict(list)
    for (src, c), items in by_chunk.items():
        chunk_n[src].append(len(items))
    b_all = 0
    for src, cns in chunk_n.items():
        b1 = max((cn + MRL_M - 1) // MRL_M for cn in cns)
        b2 = (len(vals[src]) + MRL_M - 1) // MRL_M
        bounds[src] = b1 + b2
        b_all += b1 + b2
    bounds["__all__"] = b_all + (len(vals["__all__"]) + MRL_M - 1) // MRL_M

    expect = {}
    for src, vs in vals.items():
        vs_sorted = sorted(vs)
        n = len(vs)
        for qnum, qden, lab in MRL_QS:
            tgt = (qnum * n + qden - 1) // qden
            exact_q = vs_sorted[tgt - 1]
            est_q = next(v for v, cum in summ_cum[src] if cum >= tgt)
            lo = next(
                i for i, v in enumerate(vs_sorted, start=1) if v == est_q
            )
            hi = len(vs_sorted) - next(
                i
                for i, v in enumerate(reversed(vs_sorted))
                if v == est_q
            )
            err = max(0, lo - tgt, tgt - hi)
            expect[(src, lab)] = (
                n, len(summ_cum[src]), est_q, exact_q, tgt, lo, hi, err,
                bounds[src], str(err <= bounds[src]).lower(),
            )
    got = {
        (r.source, r.q_label): (
            r.n_values, r.n_items, r.est_q, r.exact_q, r.rank_target,
            r.rank_lo, r.rank_hi, r.rank_err, r.err_bound, r.within_bound,
        )
        for r in panel.collect()
    }
    assert got == expect


def test_mrl_bounds_and_size(spark):
    """Every row is within its certified additive bound, every summary is
    at most MRL_M items, and total weight is preserved exactly (the last
    cumulative rank equals n)."""
    from rangebar_patterns_spark.operators.sketches import (
        MRL_M,
        mergeable_quantile_panel,
    )

    rows = mergeable_quantile_panel(_mrl_obs(spark), "ret").collect()
    assert len(rows) == 18
    for r in rows:
        assert r.within_bound == "true"
        assert 0 < r.n_items <= MRL_M
        assert r.rank_err <= r.err_bound
        assert 1 <= r.rank_target <= r.n_values


def test_mrl_partition_layout_invariant(spark):
    from rangebar_patterns_spark.operators.sketches import (
        mergeable_quantile_panel,
    )

    obs = _mrl_obs(spark)
    a = sorted(map(tuple, mergeable_quantile_panel(obs, "ret").collect()))
    b = sorted(
        map(
            tuple,
            mergeable_quantile_panel(
                obs.repartition(17, "id"), "ret"
            ).collect(),
        )
    )
    assert a == b
