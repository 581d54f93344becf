"""Barrier / sweep configuration grids — configs are *data*, not query text.

The reference generates 301K sed-substituted SQL files from bash loops
(scripts/gen600/generate.sh:104-175) and inline ``arrayJoin`` grids
(gen200_triple_barrier.sql:185-187, gen720_wf_wl1d_template.sql:118-156).
Here a grid is a plain list of rows that becomes (a) a broadcast Spark
DataFrame and (b) a DuckDB VALUES clause for oracle twins — one
parameterized plan evaluates every cell.

barrier_id format follows the reference (barrier_sim.py:40-43):
``p{phase1}_slt{tight*10:03d}_mb{max_bars}``, prefixed with a tp/sl tag so
single- and 2-segment grids can coexist in one result table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class BarrierConfig:
    tp_mult: float
    sl_mult: float  # wide (phase-1) stop, in bar-widths
    sl_tight_mult: float  # phase-2 stop; == sl_mult → single-segment
    phase1_bars: int
    max_bars: int
    name: str | None = None  # explicit id (gen600 profile names)

    @property
    def barrier_id(self) -> str:
        if self.name is not None:
            return self.name
        return (
            f"tp{int(self.tp_mult * 1000):04d}_sl{int(self.sl_mult * 1000):04d}"
            f"_p{self.phase1_bars}_slt{int(self.sl_tight_mult * 10):03d}"
            f"_mb{self.max_bars}"
        )


def gen200_grid() -> list[BarrierConfig]:
    """Single-segment grid in the reference gen200 value range
    (gen200_triple_barrier.sql:185-187): tp {0.25,0.5,1.0} ×
    sl {0.125,0.25,0.5} × max_bars {10,20}; sl_tight == sl."""
    return [
        BarrierConfig(tp, sl, sl, phase1_bars=5, max_bars=mb)
        for tp in (0.25, 0.5, 1.0)
        for sl in (0.125, 0.25, 0.5)
        for mb in (10, 20)
    ]


def gen720_grid() -> list[BarrierConfig]:
    """2-segment WFO-style grid (gen720_wf_wl1d_template.sql:118-134):
    wide SL {0.25,0.5} × tight {0.0625,0.125} × phase1 {3,5,7} ×
    max_bars {10,20}, constraint phase1_bars < max_bars — plus the
    Strategy-B "rev" schedule (gen720_wf_2up_ng_s_rev_template.sql:167-189:
    REVERSE time-decay, tight SL first to cut losers fast, then wide SL to
    give survivors room).  The simulator's phase-1 scan price comes from
    ``sl_mult`` and phase-2 from ``sl_tight_mult`` with no magnitude
    assumption, so rev configs are the same grid with the two roles
    swapped; every eval/WFO twin derives the grid from here so both
    engines stay in lockstep."""
    rev = [
        BarrierConfig(
            0.5, slt, slw, phase1_bars=p1, max_bars=20,
            name=f"rev_slt{int(slt * 10000):04d}_slw{int(slw * 1000):04d}_p{p1}_mb20",
        )
        for slw in (0.5,)
        for slt in (0.0625, 0.125)
        for p1 in (3, 5, 7)
    ]
    return [
        BarrierConfig(0.5, slw, slt, phase1_bars=p1, max_bars=mb)
        for slw in (0.25, 0.5)
        for slt in (0.0625, 0.125)
        for p1 in (3, 5, 7)
        for mb in (10, 20)
        if p1 < mb
    ] + rev


def gen720_wf_grid() -> list[BarrierConfig]:
    """The reference's FULL-width gen720 walk-forward barrier grid
    (gen720_wf_wl1d_template.sql:118-135): fixed TP 2.5× / wide SL 5.0×,
    phase1_bars {2,3,5,7,10,15,20,30} × sl_tight {7.5,5.0,3.5,2.5,1.0,
    0.5,0.0} × max_bars {10,15,20,30,50,75,100,150,200}, constraint
    ``phase1_bars < max_bars`` → 8×7×9 − 70 = 434 combos.  barrier_id
    matches the reference's ``p{phase1}_slt{tight*10:03d}_mb{max_bars}``
    concat exactly.  sl_tight 0.0 is a breakeven stop (phase-2 SL at the
    entry price); sl_tight 7.5 > sl_wide inverts the usual tighten-over-
    time shape — the simulator takes both roles from the grid with no
    magnitude assumption (config.py gen720_grid docstring)."""
    return [
        BarrierConfig(
            2.5, 5.0, slt, phase1_bars=p1, max_bars=mb,
            name=f"p{p1}_slt{int(slt * 10):03d}_mb{mb}",
        )
        for p1 in (2, 3, 5, 7, 10, 15, 20, 30)
        for slt in (7.5, 5.0, 3.5, 2.5, 1.0, 0.5, 0.0)
        for mb in (10, 15, 20, 30, 50, 75, 100, 150, 200)
        if p1 < mb
    ]


def gen600_profiles() -> list[BarrierConfig]:
    """The gen600 3-profile barrier grid (gen600_2down_template.sql:150-156):
    inverted 2.5/5.0×100, symmetric 5.0/5.0×50, momentum 7.5/2.5×50 —
    single-segment (sl_tight == sl, phase1 == max_bars)."""
    return [
        BarrierConfig(2.5, 5.0, 5.0, phase1_bars=100, max_bars=100, name="inverted"),
        BarrierConfig(5.0, 5.0, 5.0, phase1_bars=50, max_bars=50, name="symmetric"),
        BarrierConfig(7.5, 2.5, 2.5, phase1_bars=50, max_bars=50, name="momentum"),
    ]


def gen400_profile() -> list[BarrierConfig]:
    """The gen400 fixed 2:1 R:R barrier (gen400_3feature_template.sql
    header: TP=0.5x, SL=0.25x bar-widths, max_bars=50); single-segment."""
    return [
        BarrierConfig(0.5, 0.25, 0.25, phase1_bars=50, max_bars=50, name="rr2to1")
    ]


GRID_COLUMNS = [
    "barrier_id",
    "tp_mult",
    "sl_mult",
    "sl_tight_mult",
    "phase1_bars",
    "max_bars",
]


def grid_rows(grid: list[BarrierConfig]) -> list[tuple]:
    return [
        (c.barrier_id, c.tp_mult, c.sl_mult, c.sl_tight_mult, c.phase1_bars, c.max_bars)
        for c in grid
    ]


def grid_to_spark(spark: SparkSession, grid: list[BarrierConfig]) -> DataFrame:
    return spark.createDataFrame(
        grid_rows(grid),
        "barrier_id string, tp_mult double, sl_mult double, "
        "sl_tight_mult double, phase1_bars int, max_bars int",
    )


def grid_to_duckdb_values(grid: list[BarrierConfig]) -> str:
    """DuckDB CTE body: ``barrier_grid AS (SELECT ... FROM (VALUES ...))``."""
    rows = ",\n        ".join(
        f"('{c.barrier_id}', CAST({c.tp_mult!r} AS DOUBLE), CAST({c.sl_mult!r} AS DOUBLE), "
        f"CAST({c.sl_tight_mult!r} AS DOUBLE), {c.phase1_bars}, {c.max_bars})"
        for c in grid
    )
    return (
        "barrier_grid AS (\n    SELECT * FROM (VALUES\n        "
        + rows
        + f"\n    ) AS t({', '.join(GRID_COLUMNS)})\n)"
    )


def max_bars_cap(grid: list[BarrierConfig]) -> int:
    return max(c.max_bars for c in grid)


@dataclass(frozen=True)
class TrailingConfig:
    """gen201/gen202 trailing-stop barrier cell (gen201_trailing_stop.sql:
    130-158): fixed TP + per-bar ratcheting trailing SL + time barrier.
    gen202 shares identical mechanics (gen202_combined_barrier.sql header:
    "Identical barrier mechanics ... exists to compare against Gen200")."""

    tp_mult: float
    trail_mult: float
    max_bars: int

    @property
    def barrier_id(self) -> str:
        return (
            f"tp{int(self.tp_mult * 1000):05d}"
            f"_tr{int(self.trail_mult * 1000):05d}_mb{self.max_bars}"
        )


def gen201_grid() -> list[TrailingConfig]:
    """Reference grid subset (gen201:136-139 uses 5×5×4=100 combos; the
    catalog fixture sweeps a 3×2×2 corner of the same value ranges)."""
    return [
        TrailingConfig(tp, tr, mb)
        for tp in (5.0, 15.0, 30.0)
        for tr in (2.5, 7.5)
        for mb in (5, 20)
    ]


def trailing_grid_to_spark(
    spark: SparkSession, grid: list[TrailingConfig]
) -> DataFrame:
    return spark.createDataFrame(
        [(c.barrier_id, c.tp_mult, c.trail_mult, c.max_bars) for c in grid],
        "barrier_id string, tp_mult double, trail_mult double, max_bars int",
    )


def trailing_grid_to_duckdb_values(grid: list[TrailingConfig]) -> str:
    rows = ",\n        ".join(
        f"('{c.barrier_id}', CAST({c.tp_mult!r} AS DOUBLE), "
        f"CAST({c.trail_mult!r} AS DOUBLE), {c.max_bars})"
        for c in grid
    )
    return (
        "trail_grid AS (\n    SELECT * FROM (VALUES\n        "
        + rows
        + "\n    ) AS t(barrier_id, tp_mult, trail_mult, max_bars)\n)"
    )
