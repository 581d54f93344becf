"""Per-method wall attribution for the sim_topk_methods panel at a given
SF dir (guide §1: isolate each stage with the noop sink before touching
any of them).

Usage: python tools/profile_simtopk.py [sf_dir] [passes]
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
    from rangebar_patterns_spark.operators import similarity as SIM
    from rangebar_patterns_spark.plans import catalog as C
    from rangebar_patterns_spark.session import get_spark
    from rangebar_patterns_spark.sources.tables import load_table

    spark = get_spark("profile-simtopk")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for p in range(PASSES):
        print(f"=== pass {p + 1} (cold caches) ===", flush=True)
        C.reset_plan_caches(spark)
        emb = load_table(spark, SF_DIR, "embeddings")

        spark.sparkContext.setJobDescription("simtopk: brute cosine_topk")
        print(f"brute: {noop(SIM.cosine_topk(emb)):.2f}s", flush=True)

        spark.sparkContext.setJobDescription("simtopk: lsh_topk")
        print(f"lsh: {noop(SIM.lsh_topk(emb)):.2f}s", flush=True)

        spark.sparkContext.setJobDescription("simtopk: ivf_int8")
        print(
            f"ivf_int8: {noop(SIM.ivf_quantized_search(emb)):.2f}s",
            flush=True,
        )

        spark.sparkContext.setJobDescription("simtopk: ivf_pq")
        print(
            f"ivf_pq: {noop(SIM.ivf_pq_search(emb, book=C._pq_book(spark, SF_DIR))):.2f}s",
            flush=True,
        )

        spark.sparkContext.setJobDescription("simtopk: ivf cell probe")
        print(
            f"ivf_cell: {noop(SIM.label_centroid_search(emb)):.2f}s",
            flush=True,
        )

        spark.sparkContext.setJobDescription("simtopk: full entry")
        t0 = time.perf_counter()
        n = C.QUERIES["sim_topk_methods"](spark, SF_DIR).count()
        print(
            f"full entry count(): {time.perf_counter() - t0:.2f}s ({n} rows)",
            flush=True,
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
