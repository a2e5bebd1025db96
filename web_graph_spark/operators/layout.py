"""Multi-dimensional storage layout — Z-order (Morton) clustering.

A parquet store is pruned by per-file/per-row-group min-max stats, so
a layout sorted on ONE key prunes only that key's predicates.  Bit-
interleaving several keys into one Morton code and range-partitioning
on it bounds EVERY interleaved dimension's span within each file —
point/range predicates on any of the dimensions then skip most files
(the standard lakehouse "Z-ORDER BY" maintenance action, e.g. Delta's
OPTIMIZE ZORDER; the reference's Postgres relies on btree indexes for
the same queries, linkstorage.go:119-131 — at 100 TB min-max pruning
over immutable files is what replaces them).

Everything here is exact integer bit arithmetic (shift/and/or), JVM
codegen end-to-end, and SQL-oracle replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def zvalue_col(dims, bits: int = 16):
    """Morton code: interleave the low ``bits`` bits of each integer
    dimension column (dim d's bit i lands at position i·D + d).  With
    D dims of ``bits`` bits the code fits D·bits ≤ 63 bits — callers
    pre-bucket real values into the [0, 2^bits) range (hash chunks,
    quantile buckets, truncated ranks all work; what matters for
    pruning is monotone-ish locality per dimension, not the exact
    recipe)."""
    d_n = len(dims)
    if d_n * bits > 63:
        raise ValueError(f"{d_n} dims x {bits} bits exceeds a long")
    terms = []
    for d, c in enumerate(dims):
        col = c if not isinstance(c, str) else F.col(c)
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(col.cast("long"), i)
                            .bitwiseAND(F.lit(1)), i * d_n + d))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def write_zordered(df: DataFrame, path: str, dims,
                   bits: int = 16, n_files: int = 32) -> None:
    """Materialize ``df`` Z-ordered on ``dims``: compute the Morton
    code, range-partition into ``n_files`` on it (sampled boundaries —
    no single-task global sort), sort within each partition, write
    parquet without the helper column.  Every written file then holds
    a contiguous Morton range, so its min-max envelope is tight in
    every interleaved dimension — the pruning contract the locality
    test pins."""
    (df.withColumn("__z", zvalue_col(dims, bits))
       .repartitionByRange(n_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))
