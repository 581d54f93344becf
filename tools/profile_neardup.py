"""Per-branch wall/CPU attribution for the dedup_neardup_pairs union at a
given SF dir (default the sf1 scratch fixtures) — guide §1: isolate each
expensive stage with the noop sink before optimizing any of them.

Usage: python tools/profile_neardup.py [sf_dir] [passes]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SF_DIR = (
    sys.argv[1] if len(sys.argv) > 1 else os.path.join(_REPO, ".scratch", "sf1")
)
PASSES = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from rangebar_patterns_spark.operators import dedup as DD
    from rangebar_patterns_spark.plans import catalog as C
    from rangebar_patterns_spark.session import get_spark
    from rangebar_patterns_spark.sources.tables import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("profile-neardup", master=f"local[{cpus}]")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for p in range(PASSES):
        print(f"=== pass {p + 1} (cold caches) ===", flush=True)
        C.reset_plan_caches(spark)
        docs = load_table(spark, SF_DIR, "documents")
        emb = load_table(spark, SF_DIR, "embeddings")

        spark.sparkContext.setJobDescription("neardup: arrs side-cache build")
        t0 = time.perf_counter()
        arrs = C._doc_arrs(spark, SF_DIR)
        print(f"arrs build (eager persist): {time.perf_counter() - t0:.2f}s",
              flush=True)

        spark.sparkContext.setJobDescription("neardup: ngram candidates")
        cand = DD.ngram_candidates(arrs, DD.JACCARD_THRESHOLD)
        print(f"ngram candidates: {noop(cand):.2f}s", flush=True)

        spark.sparkContext.setJobDescription("neardup: ngram verify")
        jac = DD.ngram_jaccard_pairs(docs, arrs=arrs, broadcast_arrs=True)
        print(f"ngram jaccard (cand+verify): {noop(jac):.2f}s", flush=True)

        spark.sparkContext.setJobDescription("neardup: minhash pairs")
        mh = DD.minhash_lsh_pairs(docs, arrs=arrs)
        print(f"minhash_lsh (sig+band+verify): {noop(mh):.2f}s", flush=True)

        spark.sparkContext.setJobDescription("neardup: simhash pairs")
        print(f"simhash: {noop(DD.simhash_near_pairs(docs)):.2f}s", flush=True)

        spark.sparkContext.setJobDescription("neardup: embedding cosine")
        print(f"embedding_cosine: {noop(DD.embedding_near_dup_pairs(emb)):.2f}s",
              flush=True)

        spark.sparkContext.setJobDescription("neardup: semdedup")
        sem = DD.semantic_dedup_pairs(
            emb, cents=C._kmeans_cents(spark, SF_DIR)
        )
        print(f"semdedup: {noop(sem):.2f}s", flush=True)

        spark.sparkContext.setJobDescription("neardup: full union entry")
        t0 = time.perf_counter()
        n = C.QUERIES["dedup_neardup_pairs"](spark, SF_DIR).count()
        print(f"full entry count(): {time.perf_counter() - t0:.2f}s "
              f"({n} rows)", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
