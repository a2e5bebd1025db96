"""As-of join — match each left row to the latest right row at or
before its timestamp, per key.

The time-series join Spark famously lacks as a built-in (Flink interval
joins / kdb aj / pandas merge_asof / DuckDB ASOF JOIN are all this
operator): sessions to their latest config change, fetches to the
robots snapshot in force, clicks to the view that led to them.

Spark-first mechanism — no join node at all: tag both inputs, union
them into one stream, and run ONE window per key ordered by
``(ts, tag, right-id)`` carrying ``last(right payload, ignorenulls)``
up to the current row; left rows then read the latest right payload at
or before their timestamp directly.  Right rows sort before left rows
at equal timestamps (tag 0 < 1), which defines the tie rule: an
exactly-simultaneous right row matches — the same ``>=`` semantics as
DuckDB's ``ASOF JOIN``, which the contract query uses as a genuinely
independent oracle (different algorithm, same relation).

Scale shape: one hash shuffle on the key + one per-key sort — the
sort-merge half of a join without its probe side; per-task memory is
one key-group page, never |left| × |right|.  A key whose history is
too hot for one task is the same skew problem (and the same salting
fix) as any keyed window in this repo.

Reference analog: none — engine extension (SURVEY §2.10 E73); the
reference's tables carry no event-time joins (linkstorage.go has only
point lookups).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, by: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: tuple[str, ...] = ("event_id",),
              prefix: str = "asof_") -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``right_cols`` from
    the latest ``right`` row with ``right.ts <= left.ts`` and the same
    ``by`` key (NULLs when no prior right row exists — left-outer).

    ``right_cols`` must include a unique id when exact-tie right rows
    are possible; the union stream orders by ``(ts, tag, right id)``
    so the winner is deterministic either way.
    """
    lcols = left.columns
    rpay = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(F.col(by).alias("__k"),
                     F.col(right_ts).alias("__ts"),
                     F.lit(0).alias("__tag"),
                     rpay.alias("__rpay"),
                     F.lit(None).cast(
                         left.select(F.struct(*lcols).alias("s"))
                         .schema["s"].dataType).alias("__lrow"))
    lrow = F.struct(*[F.col(c) for c in lcols])
    l = left.select(F.col(by).alias("__k"),
                    F.col(left_ts).alias("__ts"),
                    F.lit(1).alias("__tag"),
                    F.lit(None).cast(
                        right.select(rpay.alias("s"))
                        .schema["s"].dataType).alias("__rpay"),
                    lrow.alias("__lrow"))
    w = (Window.partitionBy("__k")
         .orderBy("__ts", "__tag",
                  F.col("__rpay").getField(right_cols[0]))
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = (r.unionByName(l)
               .withColumn("__m", F.last("__rpay", ignorenulls=True)
                           .over(w))
               .filter(F.col("__tag") == 1))
    out = [F.col("__lrow").getField(c).alias(c) for c in lcols]
    out += [F.col("__m").getField(c).alias(f"{prefix}{c}")
            for c in right_cols]
    return carried.select(*out)
