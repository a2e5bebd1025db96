"""Bucketed range (interval) join — point-in-interval matching as an
equi-join Catalyst can shuffle or broadcast.

Spark has no native interval-join operator: ``f JOIN r ON f.v >= r.lo
AND f.v < r.hi`` plans as BroadcastNestedLoopJoin (every fact probes
every range — quadratic, the audit's first forbidden pattern).  The
classic fix (the same binning trick Databricks' range-join hint and
KDB's bucketed asof use) maps both sides onto integer buckets of a
fixed width so candidates meet on an equality key:

* a fact lands in bucket ``v div B``;
* a range ``[lo, hi)`` is exploded to every bucket it overlaps —
  ``sequence(lo div B, (hi-1) div B)`` — which for ranges of width w
  is ceil(w/B)+1 rows, a SMALL constant for B chosen near the typical
  width;
* the equi-join on bucket runs as an ordinary BroadcastHashJoin /
  SortMergeJoin, and the exact predicate re-checked after the join
  keeps only true containments.

Scale shape at 10^10 facts × 10^6 ranges (the IP-geolocation shape):
the fact side never replicates (one bucket per fact — the explosion
is on the SMALL side), the bucket key is as uniform as the fact
values, and Catalyst broadcasts the exploded range dim whenever it
fits (typical geo dims: a few ×10^6 rows after explosion) or falls
back to a bucket-keyed shuffle that AQE can skew-split.  Hot buckets
(many facts sharing one value band) salt like any hot join key —
``operators/skew.py``.

Semantics: inclusive lower, exclusive upper (``lo <= v < hi``), the
half-open convention of every interval table; overlapping ranges each
match (a fact can emit multiple rows — this is a join, not a lookup);
facts in gaps and empty ranges drop (inner join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(facts: DataFrame, ranges: DataFrame, v: str,
               lo: str, hi: str, bucket_width: int = 128) -> DataFrame:
    """Inner-join ``facts`` to every row of ``ranges`` whose half-open
    interval ``[lo, hi)`` contains ``facts[v]``.  All three columns
    must be integral (exact containment — no float edge ambiguity)
    and NON-NEGATIVE (``div`` truncates toward zero, so a negative
    axis would route boundary values to the wrong bucket and silently
    miss matches — shift the axis first); ``bucket_width`` trades
    range-side duplication (wide ranges, small B) against
    candidate-pair fan-in (narrow ranges, large B); the exact
    predicate makes any choice correct for completeness' dual —
    no FALSE match survives any B.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    fb = facts.withColumn("__bucket", F.expr(f"{v} div {bucket_width}"))
    rb = ranges.withColumn(
        "__bucket",
        F.explode(F.sequence(F.expr(f"{lo} div {bucket_width}"),
                             F.expr(f"({hi} - 1) div {bucket_width}"))))
    return (fb.join(rb, "__bucket")
              .filter((F.col(v) >= F.col(lo)) & (F.col(v) < F.col(hi)))
              .drop("__bucket"))
