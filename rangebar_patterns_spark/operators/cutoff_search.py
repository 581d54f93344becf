"""E29 deterministic per-metric cutoff search (reference
scripts/rank_optimize.py — Optuna NSGA-II over the integer cutoff space).

optuna is not in this environment, and a trial-at-a-time sampler is the
wrong shape for Spark anyway: the expensive part is scoring a cutoff
vector against every config, and MANY vectors can be scored in ONE
distributed plan.  So the re-expression is:

* ``evaluate_cutoffs`` — score a whole candidate population at once:
  percentile-rank each metric across configs (the E15 machinery's
  percent_rank convention), broadcast-crossJoin the candidate cutoff
  vectors, and aggregate survivors / avg quality / mean cutoff /
  objective per candidate.  One shuffle (the per-candidate groupBy);
  candidates are a tiny broadcast dimension.  At 100 TB the configs side
  scales out and the population side stays O(pop) — the exact inverse of
  the reference's per-trial loop.
* ``grid_candidates`` + the ``cutoff_grid_search`` catalog entry — a
  deterministic structured grid (uniform vectors + single-metric
  tightenings), fully SQL-expressible → DuckDB-oracled.
* ``evolve_cutoffs`` — the evolutionary driver: a (μ+λ) loop with an
  integer LCG (same constants as operators/synthesis.py — no RNG
  dependency, bit-reproducible), each generation scored by ONE
  ``evaluate_cutoffs`` job.  The loop itself is driver-side tiny, like
  the reference's study loop; only its population evaluation touches
  data.

Objective: the reference's ``obj_max_survivors_min_cutoff``
(survivors / mean cutoff — rank_optimize.py:38-46); the Pareto columns
(n_survivors ↑, avg_quality ↑, mean_cutoff ↓) are all emitted so a
caller can post-rank with E16 TOPSIS exactly as rank_optimize.py:173-186
does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.detsum import fold_sum

CUT_LO, CUT_HI, CUT_STEP = 5, 100, 5

# LCG constants shared with operators/synthesis.py
_LCG_MUL = 2_654_435_761
_LCG_MOD = 2_147_483_648  # 2^31


def grid_candidates(n_metrics: int) -> list[tuple[int, ...]]:
    """Deterministic structured candidate grid: all uniform vectors
    (c, ..., c) for c in 5..100 step 5, then per-metric tightenings
    (100, ..., c, ..., 100) for c in {25, 50, 75}."""
    cands = [(c,) * n_metrics for c in range(CUT_LO, CUT_HI + 1, CUT_STEP)]
    for i in range(n_metrics):
        for c in (25, 50, 75):
            v = [CUT_HI] * n_metrics
            v[i] = c
            cands.append(tuple(v))
    return cands


def evaluate_cutoffs(
    metrics: DataFrame,
    metric_cols: list[str],
    candidates: list[tuple[int, ...]],
) -> DataFrame:
    """Score every candidate cutoff vector against every config in one
    plan.  Returns one row per candidate: the cutoff vector, n_survivors,
    avg_quality (mean over survivors of the config's mean percentile,
    value-sorted deterministic sum), mean_cutoff, and the
    survivors/mean-cutoff objective, ordered best-first.

    Cutoff semantics are the reference's ``apply_cutoff``: cutoff c keeps
    the top c% → pctrank >= 1 − c/100 (percent_rank in [0, 1], the repo's
    E15 convention)."""
    m = len(metric_cols)
    spark = metrics.sparkSession
    ranks = metrics
    for c in metric_cols:
        ranks = ranks.withColumn(c, F.round(F.col(c), 6))
    for c in metric_cols:
        ranks = ranks.withColumn(
            f"{c}_pctrank",
            F.percent_rank().over(Window.orderBy(F.col(c).asc_nulls_first())),
        )
    cand_schema = "cand_id int, " + ", ".join(f"cut_{c} int" for c in metric_cols)
    cand_df = spark.createDataFrame(
        [(i, *v) for i, v in enumerate(candidates)], cand_schema
    )
    j = ranks.crossJoin(F.broadcast(cand_df))
    passes = None
    for c in metric_cols:
        cond = F.col(f"{c}_pctrank") >= (
            F.lit(1.0) - F.col(f"cut_{c}").cast("double") / F.lit(100.0)
        )
        passes = cond if passes is None else (passes & cond)
    quality = sum(F.col(f"{c}_pctrank") for c in metric_cols) / F.lit(float(m))
    n_srv = F.sum(F.when(passes, 1).otherwise(0)).cast("long")
    qual_sum = fold_sum(F.sort_array(F.collect_list(F.when(passes, quality))))
    out = j.groupBy("cand_id", *[f"cut_{c}" for c in metric_cols]).agg(
        n_srv.alias("n_survivors"),
        F.round(
            qual_sum / F.nullif(n_srv.cast("double"), F.lit(0.0)), 6
        ).alias("avg_quality"),
    )
    mean_cut = sum(F.col(f"cut_{c}") for c in metric_cols).cast("double") / F.lit(
        float(m)
    )
    out = out.withColumn("mean_cutoff", mean_cut).withColumn(
        "objective",
        F.round(F.col("n_survivors").cast("double") / F.col("mean_cutoff"), 6),
    )
    return out.orderBy(F.col("objective").desc(), F.col("cand_id").asc())


def _lcg(x: int) -> int:
    return (x * _LCG_MUL + 12_345) % _LCG_MOD


def evolve_cutoffs(
    metrics: DataFrame,
    metric_cols: list[str],
    pop_size: int = 16,
    generations: int = 4,
    elite: int = 4,
    seed: int = 42,
) -> dict:
    """Deterministic (μ+λ) evolutionary cutoff search.  Each generation's
    whole population is scored by one ``evaluate_cutoffs`` job; elites
    survive unchanged, children are ±CUT_STEP coordinate mutations driven
    by the integer LCG.  Same seed → same result, bit-for-bit.

    Returns {best_cutoffs, best_objective, n_survivors, avg_quality,
    history} where history is the per-generation best objective.
    """
    m = len(metric_cols)
    x = seed
    # seed population: uniform spread + LCG-random vectors
    pop: list[tuple[int, ...]] = [
        (c,) * m for c in range(20, 101, max(CUT_STEP, 80 // max(pop_size // 2, 1)))
    ][: pop_size // 2]
    while len(pop) < pop_size:
        v = []
        for _ in range(m):
            x = _lcg(x)
            v.append(CUT_LO + CUT_STEP * (x % ((CUT_HI - CUT_LO) // CUT_STEP + 1)))
        pop.append(tuple(v))
    history: list[float] = []
    best_row = None
    for _gen in range(generations):
        seen = sorted(set(pop))
        scored = evaluate_cutoffs(metrics, metric_cols, seen).collect()
        top = scored[: max(elite, 1)]
        if best_row is None or (
            top and top[0]["objective"] is not None
            and (best_row["objective"] is None or top[0]["objective"] > best_row["objective"])
        ):
            best_row = top[0]
        history.append(top[0]["objective"] if top else None)
        nxt = [tuple(r[f"cut_{c}"] for c in metric_cols) for r in top]
        while len(nxt) < pop_size:
            x = _lcg(x)
            parent = nxt[x % len(top)]
            child = list(parent)
            x = _lcg(x)
            i = x % m
            x = _lcg(x)
            delta = CUT_STEP if x % 2 == 0 else -CUT_STEP
            child[i] = min(CUT_HI, max(CUT_LO, child[i] + delta))
            nxt.append(tuple(child))
        pop = nxt
    return {
        "best_cutoffs": {c: best_row[f"cut_{c}"] for c in metric_cols},
        "best_objective": best_row["objective"],
        "n_survivors": best_row["n_survivors"],
        "avg_quality": best_row["avg_quality"],
        "history": history,
    }
