"""Change-log application — the MERGE INTO / CDC-apply primitive.

A mutable-table store (the reference's ON CONFLICT upsert path,
pkg/linkstorage/linkstorage.go:119-131) applies each change as it
arrives; a lakehouse applies them in BATCH: given an immutable base
table and a change log of upserts and deletes with a total order
(sequence number), produce the post-image — what Delta/Iceberg MERGE
INTO computes, and the compaction step every CDC ingestion pipeline
(Debezium → parquet) runs.

Spark-first shape: NO window and NO join — the base is folded into
the log as sequence −1 rows, and the post-image per key is ONE
``max_by``-style struct aggregation (map-side partials absorb hot
keys: a key with 10^6 log entries reduces inside each map task
before the single shuffle).  Deletes survive the agg and are dropped
by a codegen filter at the end, so a delete followed by a re-insert
resolves correctly by sequence order.

Reference analog: linkstorage.go ON CONFLICT upserts (row-at-a-time);
engine extension E118 (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_cdc_log(base: DataFrame, log: DataFrame,
                  id_col: str = "id", payload_col: str = "payload",
                  seq_col: str = "seq", op_col: str = "op"
                  ) -> DataFrame:
    """Apply a CDC log to a base table, last-writer-wins by sequence.

    ``base``: one row per key ``(id, payload)`` — the pre-image.
    ``log``: ``(seq, op, id, payload)`` with ``op`` in {'U','D'}
    (upsert / delete); ``seq`` must be unique per key and > −1.

    Returns the post-image ``(id, payload, last_seq, src)`` where
    ``src`` is 'base' for untouched rows and 'log' for rows whose
    final state came from the log; keys whose final op is a delete
    are absent.  One hash aggregation, one shuffle, no windows.
    """
    b = base.select(F.col(id_col).alias("id"),
                    F.lit(-1).cast("long").alias("seq"),
                    F.lit("U").alias("op"),
                    F.col(payload_col).alias("payload"))
    l = log.select(F.col(id_col).alias("id"),
                   F.col(seq_col).cast("long").alias("seq"),
                   F.col(op_col).alias("op"),
                   F.col(payload_col).alias("payload"))
    folded = (b.unionByName(l)
              .groupBy("id")
              .agg(F.max(F.struct("seq", "op", "payload"))
                   .alias("last")))
    return (folded
            .where(F.col("last.op") != "D")
            .select(F.col("id").alias(id_col),
                    F.col("last.payload").alias(payload_col),
                    F.col("last.seq").alias("last_seq"),
                    F.when(F.col("last.seq") == -1, F.lit("base"))
                    .otherwise(F.lit("log")).alias("src")))
