#!/usr/bin/env python
"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE compact JSON line:

    {"bench_version": 4, "metric": "catalog_total_wall", "value": N,
     "unit": "sec", "runs": R, "queries": {name: median_sec, ...},
     "sf": ..., "demo_total": N, "detail": "BENCH_DETAIL.json"}

The driver captures only a bounded stdout TAIL (~2000 chars; round 5's
line outgrew it and the round's numbers were lost to the record —
VERDICT r5 "What's wrong #1"), so the driver-facing line is kept under
``LINE_BUDGET`` bytes by construction: it carries per-query MEDIANS and
totals only, is printed LAST, and everything else — per-query [min, max]
spread, demo-grid medians + spread, the sf1 scale block, raw samples —
goes to the ``BENCH_DETAIL.json`` sidecar next to this file.
tests/test_bench_output.py pins the budget against the live catalog.

Last-line guarantee (round 8's record loss): the local-mode JVM shares the
process stdout fd, and its StateStore maintenance thread can log AFTER
Python exits — no in-process ordering can beat a co-writer.  So the
normal entrypoint self-wraps (``run_wrapped``): the Spark-owning child
runs with stdout piped to the wrapper's stderr, and the wrapper prints
the single JSON line only after the pipe drains (all writers, JVM
included, are gone).  The regression test runs a stateful-streaming
entry end-to-end and asserts stdout is exactly the one line.

Timing convention: each query is planned AND fully executed (count() of
the result — forces the whole DAG, no collect of wide rows to the
driver).  The session is built once; a tiny pre-warm query pays
JVM/codegen warmup before the first timed pass.

Schema history ("bench_version"):
  (absent) r1-r3 — "value" summed every query incl. demo grids, single run.
  2 (implicit, r4) — "value" = the gate entries only; demo grids under
    "demo_total".  Not comparable to r1-r3 "value".
  3 (r5) — per-query medians over ``runs`` cold-cache passes + spread +
    demos + sf1 block, all on the one stdout line (too long; truncated).
  4 — same measurements, split transport: compact driver line (medians +
    totals), full detail in the BENCH_DETAIL.json sidecar.  Demo grids
    and the sf1 block are now median-over-``demo_runs``/``sf1_runs``
    passes (default 2) instead of single-run.
  4 (r8) — schema unchanged, but the catalog consolidated 59 -> 50
    entries (same-grain unions/joins so everything fits the driver's
    50-entry correctness window): per-query keys changed — merged
    entries' medians are NOT comparable to their r7 parts' sums (the
    shared scan/side-cache cost attributes differently), while untouched
    entries compare 1:1.
  4 (r9) — schema unchanged; an untimed warm-up catalog pass now runs
    before the timed passes (detail "warmup": true) so cold-start
    inflation stays out of the medians — r9 medians are expected a bit
    LOWER than r8 on unchanged entries.  Key changes:
    bm25_retrieval_scores + bm25_topk_retrieval merged into
    "bm25_retrieval"; new "dsir_selection" entry.
  4 (r10) — driver line gains "unrated_n"/"sf1_unrated_n" counts; the
    detail sidecar gains per-entry noise ratings (VERDICT r9 #2: same-
    code sf1 medians-of-2 swung ~2x between runs, so per-entry deltas
    were below the noise floor): sf1 default raised to 4 passes and all
    tiers INTERLEAVED (catalog/sf1/demo round-robin) so co-tenant noise
    epochs average into every tier instead of biasing whichever ran
    last; per-entry IQR ([q1, q3]) alongside the [min, max] spread; an
    "unrated" list naming entries whose spread exceeds +/-50% of the
    median (quote the catalog total for those, not the entry median);
    and per-entry CPU seconds of the whole process tree (python + JVM,
    via /proc) with a cpu/wall ratio — co-tenant steal shows up as the
    ratio dropping, visible IN the artifact instead of inferred across
    rounds.  Key changes: sim_ivf_cell_search merged into
    "sim_topk_methods" (method='ivf_cell'); new "sketch_distinct" entry.
  4 (r11) — schema unchanged.  Per-entry tree-CPU deltas are now per-pid
    (tree_cpu_delta): a descendant exiting mid-entry contributes 0
    instead of driving the delta negative (r10 committed an impossible
    cpu/wall = -29.1).  The sf1 tier gains an untimed warm-up pass plus
    a second discarded execution of the 5 heaviest entries (r10's sf1
    pass-1 samples ran 2-4x steady state, leaving 15 entries unrated);
    discarded warm samples are kept in detail["sf1"]["warm_samples"].
    Key changes: tail_scan + asof_probe_lookup merged into
    "probe_panel"; new "reservoir_sample" entry.
  5 (r12) — adaptive retry passes: entries still unrated after the
    interleaved tier passes re-run (alone) up to SPARK_GRAFT_BENCH_RETRY
    extra times, and the noise rating trims its single worst outlier
    once an entry has >= 5 samples — one co-tenant epoch no longer
    permanently flags an entry four other passes agree on (the quoted
    median always uses ALL samples; only the noise verdict trims).
    Key changes: eval_ou_calibration merged into "cutoff_ou_panel"
    (formerly cutoff_grid_search); new "mergeable_quantiles" entry;
    "decontamination_overlap" absorbs the Bloom filter rows.
  5 (r13) — schema unchanged; additions-only key change:
    "cutoff_grid_search" and "eval_ou_calibration" are timed again (their
    r11 definitions, restored as bench-only entries outside the 50-entry
    correctness window) so the bench line carries every historical query
    name — VERDICT r12 "What's wrong #1" (the r12 merge broke the
    driver's round-over-round pairing).  "value" therefore includes the
    two restored entries again (~+1 s at sf0.1 vs the r12 line).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import threading
import time

BENCH_VERSION = 5
#: driver stdout-tail capture is ~2000 chars; stay safely under it
LINE_BUDGET = 1900
DETAIL_PATH = os.environ.get(
    "SPARK_GRAFT_BENCH_DETAIL_PATH",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
)
#: inner→wrapper handoff file for the final driver line (see run_wrapped)
_INNER_ENV = "SPARK_GRAFT_BENCH_INNER"


def run_wrapped() -> int:
    """Round 8 lost its bench record (BENCH_r08.json ``parsed: null``)
    because the local-mode JVM — a *child process sharing our stdout fd* —
    printed a StateStore-maintenance WARN after Python exited, pushing the
    head of the final JSON line out of the driver's end-anchored stdout
    tail.  No amount of "print last" inside the Spark-owning process can
    guarantee last-ness against a co-writer JVM, so the guarantee is moved
    up a process: re-exec ourselves with stdout PIPED, forward every byte
    the child (and its JVM) writes to *stderr*, and only after the pipe
    drains print the one driver-facing line from this wrapper — a process
    the JVM has no fd into."""
    line_path = DETAIL_PATH + ".line"
    try:
        os.unlink(line_path)
    except FileNotFoundError:
        pass
    env = dict(os.environ, **{_INNER_ENV: line_path})
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        stdout=subprocess.PIPE,
        env=env,
    )

    def _drain() -> None:
        # reads until EOF — i.e. until every holder of the write end
        # (inner Python AND the JVM it spawned) has exited or closed it
        assert proc.stdout is not None
        for chunk in iter(lambda: proc.stdout.read(8192), b""):
            sys.stderr.buffer.write(chunk)
            sys.stderr.buffer.flush()

    drainer = threading.Thread(target=_drain, daemon=True)
    drainer.start()
    rc = proc.wait()
    # grace period for a lingering JVM still holding the pipe; if it hangs,
    # the daemon drainer keeps routing its output to stderr and we move on
    drainer.join(timeout=60)

    if rc == 0 and os.path.exists(line_path):
        with open(line_path) as fh:
            line = fh.read().strip()
        os.unlink(line_path)
        sys.stderr.flush()
        print(line, flush=True)
    else:
        print(f"bench: inner run failed (rc={rc}, line file "
              f"{'present' if os.path.exists(line_path) else 'missing'})",
              file=sys.stderr)
    return rc


def tree_cpu_snapshot() -> dict[int, float]:
    """Per-pid cumulative user+system CPU seconds of this process and
    every live descendant — i.e. including the local-mode JVM, which
    time.process_time() cannot see (separate process) and os.times()
    only counts after reaping.  /proc walk, psutil-free; best-effort
    (a pid vanishing mid-walk is skipped)."""
    import glob

    hz = os.sysconf("SC_CLK_TCK")
    procs: dict[int, tuple[int, float]] = {}
    for stat in glob.glob("/proc/[0-9]*/stat"):
        try:
            with open(stat) as fh:
                data = fh.read()
        except OSError:
            continue
        try:
            rest = data[data.rindex(")") + 2 :].split()
            pid = int(stat.split("/")[2])
            procs[pid] = (int(rest[1]), (int(rest[11]) + int(rest[12])) / hz)
        except (ValueError, IndexError):
            continue
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _) in procs.items():
        kids.setdefault(ppid, []).append(pid)
    out: dict[int, float] = {}
    stack = [os.getpid()]
    while stack:
        p = stack.pop()
        if p in out:
            continue
        out[p] = procs.get(p, (0, 0.0))[1]
        stack.extend(kids.get(p, []))
    return out


def tree_cpu_delta(start: dict[int, float], end: dict[int, float]) -> float:
    """CPU seconds the process tree consumed between two snapshots.

    VERDICT r10 #1: the old total-minus-total delta went NEGATIVE when a
    descendant (e.g. a PySpark daemon worker) exited between snapshots —
    its whole cumulative CPU vanished from the end total, and BENCH_DETAIL
    committed impossible values like cpu/wall = -29.1.  Per-pid deltas
    fix the sign: a pid present in both snapshots contributes end-start
    (clamped at 0 against pid reuse); a pid only in the END snapshot was
    born inside the window, so its whole cumulative CPU counts; a pid
    that VANISHED contributes 0 — its pre-window accumulation never
    pollutes the delta, and the (unobservable) CPU it burned inside the
    window before dying is the honest price of a /proc-based monitor:
    a small UNDERcount, never an impossible number."""
    total = 0.0
    for pid, c1 in end.items():
        total += max(0.0, c1 - start.get(pid, 0.0))
    return total


def tree_cpu() -> float:
    """Cumulative tree CPU right now (sum of the live snapshot) — only
    meaningful for within-lifetime monotonic checks; deltas must go
    through tree_cpu_delta (see its docstring)."""
    return sum(tree_cpu_snapshot().values())


def time_queries(spark, qs, sf_dir, timings, cpus=None):
    for name, fn in qs.items():
        c0 = tree_cpu_snapshot() if cpus is not None else {}
        t0 = time.perf_counter()
        try:
            n = fn(spark, sf_dir).count()
        except Exception as exc:  # record failures, don't kill the bench
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings.setdefault(name, []).append(float("nan"))
            if cpus is not None:
                cpus.setdefault(name, []).append(float("nan"))
            continue
        dt = round(time.perf_counter() - t0, 3)
        timings.setdefault(name, []).append(dt)
        if cpus is not None:
            dc = round(tree_cpu_delta(c0, tree_cpu_snapshot()), 3)
            cpus.setdefault(name, []).append(dc)
            print(f"bench: {name}: {dt}s wall / {dc}s cpu ({n} rows)",
                  file=sys.stderr)
        else:
            print(f"bench: {name}: {dt}s ({n} rows)", file=sys.stderr)


def _med(v):
    clean = [x for x in v if x == x]
    return round(statistics.median(clean), 3) if clean else float("nan")


def medians(samples: dict[str, list[float]]) -> dict[str, float]:
    return {n: _med(v) for n, v in samples.items()}


def spreads(samples: dict[str, list[float]]) -> dict[str, list[float]]:
    return {
        n: [round(min(v), 3), round(max(v), 3)]
        for n, v in ((n, [x for x in v if x == x]) for n, v in samples.items())
        if v
    }


def iqrs(samples: dict[str, list[float]]) -> dict[str, list[float]]:
    """Per-entry [q1, q3] (inclusive quartiles) — with 2-3 samples this
    degrades toward [min, max], which is the honest statement of what
    2-3 samples can say."""
    out = {}
    for n, v in samples.items():
        clean = sorted(x for x in v if x == x)
        if not clean:
            continue
        if len(clean) < 3:
            q1, q3 = clean[0], clean[-1]
        else:
            qs = statistics.quantiles(clean, n=4, method="inclusive")
            q1, q3 = qs[0], qs[2]
        out[n] = [round(q1, 3), round(q3, 3)]
    return out


def unrated(samples: dict[str, list[float]]) -> list[str]:
    """Entries whose same-code spread exceeds +/-50% of the median —
    their per-entry medians are BELOW THE NOISE FLOOR on this host and
    must not be quoted for cross-round deltas (VERDICT r9 #2; totals
    stay rateable because per-entry noise partially cancels).  An
    absolute half-second floor keeps sub-second entries — where a
    0.2 -> 0.4 s swing is 100% relative but immaterial — from drowning
    the list the flag exists to surface."""
    bad = []
    for n, v in samples.items():
        clean = [x for x in v if x == x]
        if len(clean) < 2:
            continue
        med = statistics.median(clean)
        # round 12: with >= 5 samples, drop the SINGLE sample farthest
        # from the median before applying the min/max rule — one
        # co-tenant epoch must not permanently condemn an entry that
        # four other passes agree on (two outliers still flag; the
        # median itself is computed over ALL samples, so the trimmed
        # rating never moves the quoted number, only the noise verdict).
        # The adaptive retry passes below exist to push noisy entries
        # over this sample-count threshold.
        if len(clean) >= 5:
            clean = sorted(clean, key=lambda x: abs(x - med))[:-1]
        if (
            med > 0
            and max(clean) - min(clean) > 0.5
            and (max(clean) > 1.5 * med or min(clean) < 0.5 * med)
        ):
            bad.append(n)
    return sorted(bad)


def cpu_wall_ratio(
    cpu: dict[str, list[float]], wall: dict[str, list[float]]
) -> dict[str, float]:
    """Median tree-CPU over median wall per entry.  On an idle 32-vcpu
    host a parallel stage runs well above 1.0; the ratio FALLING across
    entries or rounds is the co-tenant-steal signature the raw wall
    numbers can't distinguish from a code regression."""
    out = {}
    for n, w in medians(wall).items():
        c = _med(cpu.get(n, []))
        if c == c and w == w and w > 0:
            out[n] = round(c / w, 2)
    return out


def driver_line(out: dict, budget: int = LINE_BUDGET) -> str:
    """Serialize the driver-facing record compactly, degrading
    deterministically if it would ever exceed ``budget``: first re-round
    the per-query medians to 2 decimals, then (last resort — a far larger
    catalog than today's) drop "queries" entirely and point at the
    sidecar, which always carries the full detail."""
    line = json.dumps(out, separators=(",", ":"))
    if len(line) <= budget:
        return line
    slim = dict(out)
    slim["queries"] = {
        n: (round(t, 2) if t == t else t) for n, t in out["queries"].items()
    }
    line = json.dumps(slim, separators=(",", ":"))
    if len(line) <= budget:
        return line
    slim.pop("queries")
    slim["queries_in"] = "BENCH_DETAIL.json"
    return json.dumps(slim, separators=(",", ":"))


def main() -> None:
    t_start = time.monotonic()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    demo_runs = int(os.environ.get("SPARK_GRAFT_BENCH_DEMO_RUNS", "2"))
    sf1_runs = int(os.environ.get("SPARK_GRAFT_BENCH_SF1_RUNS", "4"))
    # soft wall-clock budget for the OPTIONAL tiers (extra demo passes and
    # the sf1 block): if the driver kills a long run mid-phase, the final
    # stdout line never prints and the round's record is lost (the r5
    # failure mode) — so before each optional phase we check that its
    # estimated duration fits and otherwise skip it, marking the detail
    # sidecar "truncated".  The compact line always prints.
    # default: a full healthy run (~50 min for the 50-entry catalog:
    # warm-up + sf1 warm-up + 3 catalog + 4 sf1 + 2 demo interleaved
    # passes at sf0.1) fits with headroom; on a noisy host (the first
    # r10 run saw ~2x steal and fit only 2 sf1 passes in 2500s) the
    # guard trims trailing sf1 passes — the budget exists to cap
    # co-tenant-noise blowups (documented 2-4x CPU-steal swings would
    # otherwise turn this into a 2h+ run and risk an external kill
    # losing the record).  Widened 3000 -> 3500 in r11: the sf1 warm
    # passes (VERDICT r10 #2) MOVE the pass-1 epoch cost out of the
    # timed passes rather than adding net work, but the guard's
    # estimates are sized on the warm pass itself, so the ceiling needs
    # the extra headroom to keep all 4 timed sf1 passes.
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "3500"))
    truncated: list[str] = []

    def fits(estimate_s: float) -> bool:
        return time.monotonic() - t_start + estimate_s <= budget_s

    from rangebar_patterns_spark.session import get_spark

    # state-store maintenance (spawned by the streaming entry's state
    # store) must never fire around shutdown: its thread logs to stdout
    # after SparkEnv tears down (the r8 record-loss trigger).  One bench
    # process lives well under this interval, so the thread never ticks.
    spark = get_spark(
        "bench",
        extra_conf={
            "spark.sql.streaming.stateStore.maintenanceInterval": "86400s",
        },
    )

    import __spark_entry__ as entrymod
    from rangebar_patterns_spark.plans.catalog import RESTORED_QUERIES

    qs = dict(entrymod.queries())
    # round 13: the r11-sanctioned gate merge dropped these two names from
    # the bench line, breaking round-over-round pairing — time them again
    # (additions-only; they sit outside the 50-entry correctness window
    # and are pytest-oracle certified, see plans/catalog.RESTORED_QUERIES)
    qs.update(RESTORED_QUERIES)
    # regression-test hook: run a named subset of the catalog only
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        unknown = keep - set(qs)
        if unknown:
            raise SystemExit(f"bench: unknown SPARK_GRAFT_BENCH_ONLY {unknown}")
        qs = {n: f for n, f in qs.items() if n in keep}
    # demonstration-scale bench-only workloads (full-width gen600 grids):
    # timed here, correctness-pinned in the pytest oracle suite
    from rangebar_patterns_spark.plans.catalog import (
        BENCH_QUERIES,
        reset_plan_caches,
    )

    # pre-warm: JVM classloading + codegen on a trivial plan
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # full warm-up pass, EXCLUDED from medians: first catalog samples
    # carry 2-3x JVM/classloader/page-cache cold-start inflation
    # (r8: bars_adapter 5.5 s cold vs 1.7/1.7 s warm), which pollutes
    # medians-of-3 and makes cross-round deltas noisier than the code.
    # Skipped for tiny budgets (regression tests) or via env.
    warmed = False
    last_warmup_s = 0.0
    if (os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
            and budget_s >= 600):
        print("bench: === warm-up pass (untimed) ===", file=sys.stderr)
        t0 = time.monotonic()
        time_queries(spark, qs, sf_dir, {})
        reset_plan_caches(spark)
        warmed = True
        last_warmup_s = time.monotonic() - t0
        print(f"bench: warm-up took {last_warmup_s:.1f}s",
              file=sys.stderr)

    # sf1 fixtures (50 symbols, ~1M events — the scale validation the
    # README claims, driver-recorded) are tiled from sf0.1 on first use
    sf1_on = (
        os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") != "0" and sf == "0.1"
    )
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.scratch/sf1")
    if sf1_on and not os.path.exists(os.path.join(sf1_dir, "events.parquet")):
        print("bench: generating sf1 fixtures...", file=sys.stderr)
        # keep stdout clean — this process prints ONE JSON line, so the
        # generator's progress output must land on stderr
        subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "tools", "gen_sf1.py"), sf1_dir],
            check=True,
            stdout=sys.stderr,
        )
    if not sf1_on:
        sf1_runs = 0
    sf1_warm_t: dict[str, list[float]] = {}
    if sf1_runs:
        # page-cache warm of the sf1 fixtures: the first sf1 pass
        # otherwise pays 2-3x cold parquet reads (the untimed warm-up
        # pass only touches the sf0.1 files — observed text_metrics
        # 28 s cold vs 9 s warm), which poisons the per-entry noise
        # rating with a systematic pass-1 outlier
        for root, _, files in os.walk(sf1_dir):
            for f in files:
                with open(os.path.join(root, f), "rb") as fh:
                    while fh.read(1 << 22):
                        pass
        # full untimed sf1 warm pass (VERDICT r10 #2): the page-cache
        # warm covers file reads but NOT the sf1-shaped plans' JIT/
        # codegen/shuffle warm-up epoch — r10's sf1 pass-1 samples ran
        # 2-4x steady state (text_metrics 39.3 vs ~9 s, fullgrid 378 vs
        # ~128 s), flagging 15 entries unrated and making the sf1 total
        # unattributable.  One discarded execution absorbs the epoch;
        # net run time is ~neutral because the timed passes then drop by
        # what the warm pass costs.  fullgrid's epoch spanned TWO passes
        # (378, 302, 129, 127), so the heaviest entries get a SECOND
        # discarded execution — cheap once warm (~steady-state cost).
        # Warm samples are recorded in the detail sidecar (sf1_warm) so
        # the epoch stays visible instead of silently vanishing.
        if warmed and fits(6.0 * (last_warmup_s or 120.0)):
            print("bench: === sf1 warm-up pass (untimed) ===",
                  file=sys.stderr)
            t0 = time.monotonic()
            time_queries(spark, qs, sf1_dir, sf1_warm_t, {})
            reset_plan_caches(spark)
            print(f"bench: sf1 warm-up took {time.monotonic() - t0:.1f}s",
                  file=sys.stderr)
            heavy = sorted(
                ((n, v[0]) for n, v in sf1_warm_t.items() if v and v[0] == v[0]),
                key=lambda kv: -kv[1],
            )[:5]
            est2 = 0.6 * sum(c for _, c in heavy)
            if heavy and fits(est2):
                print(f"bench: === sf1 heavy second warm (untimed): "
                      f"{[n for n, _ in heavy]} ===", file=sys.stderr)
                time_queries(
                    spark, {n: qs[n] for n, _ in heavy}, sf1_dir,
                    sf1_warm_t, {},
                )
                reset_plan_caches(spark)
            else:
                truncated.append("sf1 heavy second warm")
        elif warmed:
            truncated.append("sf1 warm-up pass")

    # single-run wall-clock swings 2-4x on this host from co-tenant CPU
    # steal, and r9 showed same-code sf1 medians-of-2 swinging ~2x when
    # the passes ran back-to-back at the end (whatever noise epoch covers
    # that window biases EVERY sample).  So the tiers run INTERLEAVED —
    # catalog / sf1 / demo round-robin, plan caches dropped between
    # phases — spreading each tier's samples across the whole run window;
    # per-entry medians come with IQR + a noise rating downstream.
    samples: dict[str, list[float]] = {}
    cpu_s: dict[str, list[float]] = {}
    demo_t: dict[str, list[float]] = {}
    demo_cpu: dict[str, list[float]] = {}
    sf1_t: dict[str, list[float]] = {}
    sf1_cpu: dict[str, list[float]] = {}
    phases: list[tuple[str, int]] = []
    ci = di = si = 0
    while ci < n_runs or di < demo_runs or si < sf1_runs:
        if ci < n_runs:
            phases.append(("cat", ci))
            ci += 1
        if si < sf1_runs:
            phases.append(("sf1", si))
            si += 1
        if di < demo_runs:
            phases.append(("demo", di))
            di += 1

    last_dur = {"cat": 0.0, "demo": 0.0, "sf1": 0.0}
    sf1_ran = 0
    for kind, idx in phases:
        # budget guard: catalog passes and the first demo pass always run
        # (the core metric and the most-quoted grid); every other phase
        # needs its estimated duration — the measured previous pass of
        # its kind, or 4x a catalog pass for the first sf1 — to fit
        if kind == "sf1":
            est = last_dur["sf1"] or 4.0 * (last_dur["cat"] or 120.0)
        elif kind == "demo" and idx > 0:
            est = last_dur["demo"]
        else:
            est = 0.0
        if est and not fits(est):
            truncated.append(f"{kind} pass {idx + 1}")
            print(f"bench: skipping {kind} pass {idx + 1} (budget)",
                  file=sys.stderr)
            continue
        print(f"bench: === {kind} pass {idx + 1} ===", file=sys.stderr)
        t0 = time.monotonic()
        if kind == "cat":
            time_queries(spark, qs, sf_dir, samples, cpu_s)
        elif kind == "demo":
            time_queries(spark, BENCH_QUERIES, sf_dir, demo_t, demo_cpu)
        else:
            time_queries(spark, qs, sf1_dir, sf1_t, sf1_cpu)
            sf1_ran += 1
        last_dur[kind] = time.monotonic() - t0
        reset_plan_caches(spark)

    # adaptive re-measure (round 12, VERDICT r11 #6/#7): entries still
    # flagged unrated after the interleaved passes get up to RETRY extra
    # timed passes of JUST those entries — cheap (only the noisy slice
    # re-runs) and converging (each pass adds a sample; at >= 5 samples
    # the rating trims its single worst outlier, so an entry condemned
    # by one co-tenant epoch clears once four passes agree).  Entries
    # that stay unrated after retries carry genuine variance.
    retry = int(os.environ.get("SPARK_GRAFT_BENCH_RETRY", "2"))
    for tier, tsamples, tcpu, tdir in (
        ("cat", samples, cpu_s, sf_dir),
        ("sf1", sf1_t, sf1_cpu, sf1_dir if sf1_ran else None),
    ):
        if tdir is None:
            continue
        for r in range(retry):
            noisy = unrated(tsamples)
            if not noisy:
                break
            est = 1.5 * sum(
                statistics.median([x for x in tsamples[n] if x == x])
                for n in noisy
                if tsamples.get(n)
            )
            if not fits(est):
                truncated.append(f"{tier} retry pass {r + 1}")
                break
            print(
                f"bench: === {tier} retry pass {r + 1} (unrated: {noisy}) ===",
                file=sys.stderr,
            )
            time_queries(
                spark, {n: qs[n] for n in noisy if n in qs}, tdir,
                tsamples, tcpu,
            )
            reset_plan_caches(spark)

    queries = medians(samples)
    total = round(sum(t for t in queries.values() if t == t), 3)
    demos = medians(demo_t)
    demo_total = round(sum(t for t in demos.values() if t == t), 3)

    detail = {
        "bench_version": BENCH_VERSION,
        "warmup": warmed,
        "runs": n_runs,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "queries": queries,
        "spread": spreads(samples),
        "iqr": iqrs(samples),
        "unrated": unrated(samples),
        "cpu": medians(cpu_s),
        "cpu_wall_ratio": cpu_wall_ratio(cpu_s, samples),
        "samples": samples,
        "total": total,
        "demo_runs": demo_runs,
        "demos": demos,
        "demo_spread": spreads(demo_t),
        "demo_iqr": iqrs(demo_t),
        "demo_unrated": unrated(demo_t),
        "demo_cpu_wall_ratio": cpu_wall_ratio(demo_cpu, demo_t),
        "demo_total": demo_total,
    }
    if sf1_ran:
        sf1_q = medians(sf1_t)
        detail["sf1"] = {
            "runs": sf1_ran,
            "queries": sf1_q,
            "spread": spreads(sf1_t),
            "iqr": iqrs(sf1_t),
            "unrated": unrated(sf1_t),
            "cpu_wall_ratio": cpu_wall_ratio(sf1_cpu, sf1_t),
            "samples": sf1_t,
            "total": round(sum(t for t in sf1_q.values() if t == t), 3),
        }
        if sf1_warm_t:
            # discarded warm executions, kept visible: the warm-up epoch
            # these absorb (pass-1 JIT/codegen inflation) should be
            # auditable in the artifact, not silently vanished
            detail["sf1"]["warm_samples"] = sf1_warm_t

    if truncated:
        detail["truncated"] = truncated
    with open(DETAIL_PATH, "w") as fh:
        json.dump(detail, fh, indent=1)
    print(f"bench: detail written to {DETAIL_PATH}", file=sys.stderr)

    out = {
        "bench_version": BENCH_VERSION,
        "metric": "catalog_total_wall",
        "value": total,
        "unit": "sec",
        "runs": n_runs,
        "queries": queries,
        "sf": detail["sf"],
        "demo_total": demo_total,
        "unrated_n": len(detail["unrated"]),
        "detail": "BENCH_DETAIL.json",
    }
    if "sf1" in detail:
        out["sf1_total"] = detail["sf1"]["total"]
        out["sf1_unrated_n"] = len(detail["sf1"]["unrated"])

    line = driver_line(out)

    # stop Spark BEFORE emitting the line so the JVM's shutdown logging
    # (if any) lands while our co-writer defense below is still in place
    spark.stop()

    line_path = os.environ.get(_INNER_ENV)
    if line_path:
        # wrapped mode (the normal path): hand the line to the wrapper,
        # which prints it to the REAL stdout after the pipe drains; our
        # own stdout is the wrapper's pipe→stderr relay, so the echo
        # below is informational only
        tmp = line_path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(line + "\n")
        os.replace(tmp, line_path)
    print(line, flush=True)


if __name__ == "__main__":
    if _INNER_ENV in os.environ:
        main()
    else:
        sys.exit(run_wrapped())
