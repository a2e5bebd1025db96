"""Fetcher-fleet host assignment — rendezvous (HRW) hashing.

A distributed crawl pins every host to exactly one fetcher so the
per-host politeness state (token bucket, robots cache, keep-alive
connection pool — the state the reference keeps in ONE process,
``pkg/linkprocessor/linkprocessor.go:51-75``) lives in one place.
Plain ``hash(host) % K`` reshuffles ~all hosts when the fleet resizes;
rendezvous hashing (Thaler & Ravishankar 1998 — highest random weight)
moves ONLY the hosts whose new-worker weight beats every old one, an
expected 1/(K+1) of them, and every displaced host lands on the NEW
worker — warm politeness state survives a fleet resize.

Scale shape: the host dim explodes ×K (K = fleet size, ≤ a few
hundred) and collapses back through one map-side-combinable
aggregation on the host key — uniform by construction, no window, no
sort.  10^8 hosts × K=64 is 6.4×10^9 tiny rows through a partial agg:
scan-bound.

Determinism: weights are the repo's cross-engine hex16 recipe
(``graph_algos._hex16``), ties broken toward the smaller worker id,
so Spark and the SQL oracle assign bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from web_graph_spark.operators.graph_algos import _hex16


def rendezvous_assign(hosts: DataFrame, n_workers: int,
                      host_col: str = "host",
                      out_col: str = "worker") -> DataFrame:
    """Assign each row of ``hosts`` (one row per distinct host) to the
    worker in ``[0, n_workers)`` with the highest rendezvous weight
    ``hex16(md5(host || '#' || w))``; ties go to the smaller ``w``.
    Returns the input columns plus ``out_col``."""
    if n_workers <= 0:
        raise ValueError(f"n_workers must be positive, got {n_workers}")
    w = F.explode(F.sequence(F.lit(0), F.lit(n_workers - 1))).alias("__w")
    weighted = hosts.select("*", w).withColumn(
        "__weight",
        _hex16(F.concat(F.col(host_col), F.lit("#"),
                        F.col("__w").cast("string"))))
    # argmax by (weight, -w): max(struct) compares field-by-field, so
    # the higher weight wins and the SMALLER worker id breaks ties.
    best = (weighted.groupBy(*hosts.columns)
            .agg(F.max(F.struct(
                F.col("__weight"),
                (-F.col("__w")).alias("__neg"),
                F.col("__w").alias("__pick"))).alias("__best"))
            .withColumn(out_col, F.col("__best.__pick").cast("int"))
            .drop("__best"))
    return best


def snake_assign(df: DataFrame, n_slots: int, weight_col: str,
                 key_col: str = "host",
                 small_hint: int | None = None) -> DataFrame:
    """Weight-BALANCED slot assignment by snake placement (the
    boustrophedon schedule fantasy-draft orders and HPC block-cyclic
    layouts use): rank items by weight desc (ties by key), deal rank
    r to slot ``pos`` on even passes and ``n_slots−1−pos`` on odd
    passes (pass = r div S, pos = r mod S) — each consecutive
    S-window reverses direction so a slot that just received a heavy
    item receives the lightest of the next window.

    The complement of :func:`rendezvous_assign`: HRW optimizes
    STABILITY under fleet resize and ignores weights; snake optimizes
    LOAD BALANCE for a known weight distribution and reassigns freely
    — the right tool when a wave's host budgets are already known and
    the fetch slots should finish together.  Guarantees: slot item
    counts differ by ≤ 1 exactly; load spread is bounded by the
    heaviest item on every workload tested (pinned, incl. adversarial
    geometric weights — where round-robin dealing without the
    reversal concentrates every window's heavy end on slot 0).

    Ranks come from :func:`operators.frontier.ordered_seq` — the
    range-partitioned dense rank, NO single-partition window at scale
    (``small_hint`` forwards to its small-path switch).  Slot
    arithmetic is one codegen projection.

    → ``(key_col, weight_col, rank, slot)``.

    Reference analog: none — engine extension (SURVEY §2.10 E136).
    """
    from .frontier import ordered_seq

    base = df.select(F.col(key_col), F.col(weight_col),
                     (-F.col(weight_col).cast("long")).alias("__negw"))
    ranked = ordered_seq(base, ["__negw", key_col], out_col="rank",
                         small_hint=small_hint)
    s = n_slots
    pas = F.expr(f"rank div {s}")
    pos = F.col("rank") % s
    slot = (F.when(pas % 2 == 0, pos)
            .otherwise(F.lit(s - 1) - pos)).cast("int")
    out = ranked.select(key_col, weight_col,
                        F.col("rank").cast("long").alias("rank"),
                        slot.alias("slot"))
    # hand the rank stage's cache handle through — caller releases
    # with operators.frontier.release AFTER acting on the result
    out._wgs_cached_parent = getattr(ranked, "_wgs_cached_parent", None)
    return out
