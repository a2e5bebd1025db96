"""Per-host politeness scheduling (operator O4, north_star extension).

Each wave may crawl at most ``budget[host]`` pages per host; within a
host, lowest ``seq`` first (FIFO, O1).  Unscheduled rows carry over
with their seq unchanged — the oracle implements the identical rule so
crawl-order equality stays well-defined under any budget.

Physical shape: ``row_number() OVER (PARTITION BY host ORDER BY seq)``
filtered by a rank bound.  Spark ≥3.5 rewrites the constant-bound rank
filter into ``WindowGroupLimit`` — a map-side partial top-K per host
BEFORE the shuffle — so a hot host with 10^7 pending URLs ships only
``limit`` rows to the window stage instead of all of them
(tests/test_plans.py pins this).  The per-host exact budget (from the
broadcast budgets dim) is applied after the cheap global cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def schedule_wave(pending: DataFrame, budgets: DataFrame | None,
                  default_budget: int, host_col: str = "host",
                  seq_col: str = "seq",
                  priority_col: str | None = None,
                  broadcast_budgets: bool = True,
                  max_budget: int | None = None) -> tuple[DataFrame, int]:
    """Split pending frontier into (scheduled, cap) for this wave.

    budgets: per-host dim (host, max_pages_per_wave).
    broadcast_budgets: True = broadcast-hint the dim join (right for
    the common small dim); False = plain equi-join, letting the
    planner shuffle both sides — the 10^7-host dim at target scale is
    NOT a broadcast (VERDICT r3 #4); callers gate on the dim's size
    (SparkCrawler.BUDGETS_BROADCAST_MAX).  The constant-cap
    WindowGroupLimit prefilter is unaffected either way.
    priority_col: optional score ranked ASCENDING before FIFO seq —
    the north_star's "depth + host-budget priority" uses ``depth``, so
    shallower carryover URLs win a budget-constrained wave over deeper
    fresh discoveries (pure BFS ≡ priority None, the Go-oracle mode).
    Returns the scheduled DataFrame with a ``host_rank`` column.
    """
    order = ([F.col(priority_col).asc(), F.col(seq_col).asc()]
             if priority_col else [F.col(seq_col).asc()])
    w = Window.partitionBy(host_col).orderBy(*order)
    ranked = pending.withColumn("host_rank", F.row_number().over(w))
    # A constant rank bound must dominate every host's effective budget
    # (dim value, or default for hosts missing from the dim).
    # max_budget: the dim's precomputed max — callers that keep the dim
    # across waves (SparkCrawler) pass it so the cap costs no per-call
    # agg job; None falls back to computing it here.
    cap = default_budget
    if budgets is not None and default_budget < (1 << 40):
        m = (max_budget if max_budget is not None
             else budgets.agg(F.max("max_pages_per_wave")).collect()[0][0])
        if m is not None:
            cap = max(int(m), default_budget)
    if cap < (1 << 40):
        # constant bound → WindowGroupLimit (map-side top-K per host)
        ranked = ranked.filter(F.col("host_rank") <= F.lit(cap))
    if budgets is not None:
        # join only the budget column — the dim may carry extra columns
        # (e.g. wave_period, consumed by the crawler's period gate)
        bud = budgets.select(host_col, "max_pages_per_wave")
        if broadcast_budgets:
            bud = F.broadcast(bud)
        ranked = (ranked.join(bud, on=host_col, how="left")
                  .filter(F.col("host_rank") <=
                          F.coalesce(F.col("max_pages_per_wave"),
                                     F.lit(default_budget)))
                  .drop("max_pages_per_wave"))
    elif default_budget < (1 << 40):
        ranked = ranked.filter(F.col("host_rank") <= F.lit(default_budget))
    return ranked, cap
