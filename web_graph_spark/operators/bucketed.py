"""Bucketed-table co-located joins — the shuffle-free seen-set path.

The per-wave seen-set anti-join is the one stage whose shuffle volume
grows with the |seen| table (10^10 rows at target scale); BENCH/
BASELINE.md shows that shuffle is what stops single-box scaling past
~8 cores.  The cluster answer is to make the join co-located: store
both the ``seen`` table and the wave's candidates bucketed by the join
key, and Spark's bucketed scan feeds SortMergeJoin with **zero
Exchange nodes** (pinned in tests/test_plans.py::
test_bucketed_anti_join_has_no_exchange).

On a real deployment this is the Iceberg partition/sort spec
``bucket(N, page_id)`` (SURVEY.md §4); locally it is parquet
``bucketBy`` through ``saveAsTable`` (bucketed scans require catalog
tables — plain ``.parquet(path)`` reads discard bucket metadata).
``page_id`` is a sha1 hex, so buckets are uniform by construction: no
skew handling needed on this key.

WaveStore keeps its path-based wave-partition layout for checkpoint
semantics; these helpers are the storage layout for the big immutable
sides (seen, edges, pages) once a deployment graduates them out of the
per-wave log — the write is one extra shuffle ONCE, repaid on every
subsequent wave's join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["save_bucketed", "bucketed_anti_join"]


def save_bucketed(df: DataFrame, table: str, key: str = "page_id",
                  n_buckets: int = 64, mode: str = "overwrite") -> None:
    """Persist ``df`` as a catalog table bucketed+sorted by ``key``."""
    (df.write.bucketBy(n_buckets, key).sortBy(key)
       .mode(mode).format("parquet").saveAsTable(table))


def bucketed_anti_join(spark: SparkSession, candidates_table: str,
                       seen_table: str, key: str = "page_id") -> DataFrame:
    """candidates ∖ seen over two same-bucketed tables — planner emits
    a SortMergeJoin with no Exchange on either side."""
    return (spark.table(candidates_table)
            .join(spark.table(seen_table).select(key), key, "left_anti"))
