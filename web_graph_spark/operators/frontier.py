"""Deterministic frontier sequencing.

The crawl-order spec keys every frontier row with a dense global
``seq`` assigned in (parent_seq, link_index) discovery order
(SURVEY.md §3.1 — equal to the Go loop run with numConsumers=1,
/root/reference/pkg/linkqueue/linkqueue.go:50,72 FIFO).

A naive ``row_number() over (ORDER BY ...)`` collapses to a single
partition — a non-starter at 10^10 rows.  :func:`ordered_seq` instead
range-partitions by the order key, sorts within partitions, counts per
partition (tiny driver-side array), and assigns ``offset + local rank``
in ``mapInPandas`` — a fully parallel, deterministic dense rank.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SMALL_SEQ_THRESHOLD = 200_000


def ordered_seq(df: DataFrame, order_cols: list[str], start: int = 0,
                out_col: str = "seq", num_partitions: int | None = None,
                small_hint: int | None = None) -> DataFrame:
    """Assign ``out_col`` = start, start+1, … densely in the total order
    of ``order_cols`` (which must be a unique key), without a global
    single-partition sort.

    ``small_hint``: an upper bound on ``df``'s row count when the
    caller already knows one (the crawler passes the wave's link
    count).  At or below :data:`SMALL_SEQ_THRESHOLD` the rank runs as a
    plain global ``row_number()`` window — a single tiny partition IS
    the right plan there, and it replaces the range-partition path's
    sampling job + persist + per-partition count collect + Python
    assign stage with one JVM window (the range path's fixed cost
    dominates small waves).  Both paths produce the identical dense
    sequence; only the physical strategy switches.
    """
    if small_hint is not None and small_hint <= SMALL_SEQ_THRESHOLD:
        from pyspark.sql import Window

        w = Window.orderBy(*[F.col(c) for c in order_cols])
        return df.withColumn(
            out_col, (F.row_number().over(w) - 1 + start).cast("long"))
    if num_partitions is None:
        num_partitions = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        num_partitions = int(num_partitions)
    parted = (df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
                .sortWithinPartitions(*order_cols))
    parted = parted.withColumn("__pid", F.spark_partition_id())
    # cache so the count pass and the assignment pass see identical
    # partitioning (repartitionByRange samples — must not re-plan).
    parted = parted.persist()
    counts = {r["__pid"]: r["n"] for r in
              parted.groupBy("__pid").agg(F.count("*").alias("n")).collect()}
    offsets = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    schema = parted.drop("__pid").schema.add(out_col, "long")
    cols = [f.name for f in schema.fields]

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            base = offsets[pid] + local
            out = pdf.drop(columns="__pid")
            out[out_col] = range(base, base + len(pdf))
            local += len(pdf)
            yield out[cols]

    result = parted.mapInPandas(assign, schema=schema)
    # materialization note: caller should act on `result` before long
    # chains; `parted` stays cached until then.
    result._wgs_cached_parent = parted  # keep a handle for unpersist
    return result


def take_global(df: DataFrame, k: int, order_cols: list[str],
                num_partitions: int | None = None,
                small_hint: int | None = None) -> DataFrame:
    """Exact global top-``k`` in the total order of ``order_cols``
    (a unique key) WITHOUT a global single-partition sort — the wave
    admission cut for a frontier whose budget-cut schedule can still
    exceed what one wave should carry (``SparkCrawler(max_wave_urls=)``).

    Physical shape: range-partition by the order key, count per
    partition (tiny driver-side array, same machinery as
    :func:`ordered_seq`), pass every partition strictly below the
    boundary through UNTOUCHED, and take the first ``r`` rows of the
    single boundary partition locally (partitions are sorted within, so
    the take is a streaming head — no rank computed for any row past
    the boundary).  Per-task memory is one partition regardless of
    |df| or ``k`` — at a 10^10-row schedule nothing ever converges on
    one task, unlike ``ORDER BY ... LIMIT k`` (TakeOrderedAndProject
    merges n_partitions × k rows on a single reducer).

    Small waves (``small_hint`` ≤ :data:`SMALL_SEQ_THRESHOLD`) use one
    JVM ``row_number()`` window instead — same rows, one job.
    Rows at or past ``k`` stay pending for later waves by simply not
    being admitted (frontier carryover is dedupe-side, not here).
    """
    if small_hint is not None and small_hint <= SMALL_SEQ_THRESHOLD:
        from pyspark.sql import Window

        w = Window.orderBy(*[F.col(c) for c in order_cols])
        return (df.withColumn("__grank", F.row_number().over(w))
                  .filter(F.col("__grank") <= k).drop("__grank"))
    if num_partitions is None:
        num_partitions = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
        num_partitions = int(num_partitions)
    parted = (df.repartitionByRange(num_partitions,
                                    *[F.col(c) for c in order_cols])
                .sortWithinPartitions(*order_cols)
                .withColumn("__pid", F.spark_partition_id())
                .persist())
    counts = {r["__pid"]: r["n"] for r in
              parted.groupBy("__pid").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    if total <= k:
        parted.unpersist()
        return df
    # boundary partition b: cumulative count crosses k after it
    acc = 0
    boundary, r = None, 0
    for pid in sorted(counts):
        if acc + counts[pid] > k:
            boundary, r = pid, k - acc
            break
        acc += counts[pid]
    body = parted.filter(F.col("__pid") < boundary).drop("__pid")
    schema = parted.drop("__pid").schema
    cols = [f.name for f in schema.fields]

    def head(it: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        taken = 0
        for pdf in it:
            if taken >= r or len(pdf) == 0:
                continue
            take = pdf.iloc[: r - taken]
            taken += len(take)
            yield take.drop(columns="__pid")[cols]

    edge = parted.filter(F.col("__pid") == boundary).mapInPandas(
        head, schema=schema)
    result = body.unionByName(edge)
    result._wgs_cached_parent = parted  # caller releases after acting
    return result


def release(df: DataFrame) -> None:
    parent = getattr(df, "_wgs_cached_parent", None)
    if parent is not None:
        parent.unpersist()
