"""Similarity search over an embedding column (array<float>).

* :func:`cosine_topk` — brute-force exact top-k: broadcast the (small)
  query set against the item table; similarity computed JVM-side with
  higher-order array functions (zip_with + aggregate, double
  accumulation in array order — bit-reproducible); top-k per query via
  a rank window with a constant bound (WindowGroupLimit: map-side
  partial top-k, so the full similarity matrix never shuffles).
* :func:`lsh_ann_topk` — the scale path: random-hyperplane LSH.
  Deterministic projection matrix (seeded numpy) applied in one
  Arrow-batched pandas UDF; candidates = bucket collisions across
  ``n_tables`` independent tables; exact re-rank within candidates.
  At 100 TB the bucket join replaces the O(Q·N) scan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double precision, sequential array order (matches
    DuckDB list_dot_product on double lists for oracle compare)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y:
                                  x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(items: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Exact top-k neighbors per query (excluding self-id matches):
    (q_id, rank, vec_id, sim_bp)."""
    j = items.crossJoin(F.broadcast(queries))
    j = j.withColumn("sim", cosine(F.col(vec_col), F.col(q_vec_col))) \
         .filter(F.col(id_col) != F.col(q_id_col))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (j.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id_col, "rank", id_col,
                    F.floor(F.col("sim") * 1000000).cast("long")
                     .alias("sim_ppm")))


def _projection_udf(n_bits: int, dim: int, seed: int):
    import numpy as np

    planes = np.random.RandomState(seed).standard_normal((dim, n_bits))

    @F.pandas_udf("long")
    def _sig(vecs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (m @ planes) > 0
        weights = (1 << np.arange(n_bits, dtype=np.uint64))
        return pd.Series((bits * weights).sum(axis=1).astype(np.int64))

    return _sig


def lsh_signatures(df: DataFrame, dim: int, n_bits: int = 16,
                   n_tables: int = 4, seed: int = 42,
                   vec_col: str = "embedding") -> DataFrame:
    """Add sig_0..sig_{n_tables-1} hyperplane-signature columns."""
    out = df
    for t in range(n_tables):
        udf = _projection_udf(n_bits, dim, seed + 1000 * t)
        out = out.withColumn(f"sig_{t}", udf(F.col(vec_col)))
    return out


def lsh_ann_topk(items: DataFrame, queries: DataFrame, dim: int, k: int = 10,
                 n_bits: int = 12, n_tables: int = 6, seed: int = 42,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 q_id_col: str = "q_id", q_vec_col: str = "q_vec") -> DataFrame:
    """Approximate top-k: union of bucket collisions over n_tables
    hash tables, exact cosine re-rank within candidates."""
    isig = lsh_signatures(items, dim, n_bits, n_tables, seed, vec_col)
    qsig = lsh_signatures(queries, dim, n_bits, n_tables, seed, q_vec_col)
    pieces = []
    for t in range(n_tables):
        pieces.append(
            isig.select(id_col, vec_col, F.col(f"sig_{t}").alias("sig"),
                        F.lit(t).alias("tbl"))
            .join(F.broadcast(
                qsig.select(q_id_col, q_vec_col,
                            F.col(f"sig_{t}").alias("sig"),
                            F.lit(t).alias("tbl"))), ["tbl", "sig"]))
    cand = pieces[0]
    for p in pieces[1:]:
        cand = cand.unionByName(p)
    cand = (cand.select(id_col, vec_col, q_id_col, q_vec_col).distinct()
            .filter(F.col(id_col) != F.col(q_id_col)))
    cand = cand.withColumn("sim", cosine(F.col(vec_col), F.col(q_vec_col)))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(q_id_col, "rank", id_col,
                    F.floor(F.col("sim") * 1000000).cast("long")
                     .alias("sim_ppm")))


def embedding_near_dup_pairs(items: DataFrame, tau: float = 0.95,
                             dim: int = 64, n_bits: int = 10,
                             n_tables: int = 8, seed: int = 7,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets + exact
    verify: (id_a, id_b, sim_ppm ≥ tau)."""
    sigs = lsh_signatures(items, dim, n_bits, n_tables, seed, vec_col)
    pieces = []
    for t in range(n_tables):
        s = sigs.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                        F.col(f"sig_{t}").alias("sig"))
        a, b = s.alias("a"), s.alias("b")
        pieces.append(a.join(b, (F.col("a.sig") == F.col("b.sig"))
                             & (F.col("a.id") < F.col("b.id")))
                      .select(F.col("a.id").alias("id_a"),
                              F.col("b.id").alias("id_b"),
                              F.col("a.v").alias("v_a"),
                              F.col("b.v").alias("v_b")))
    cand = pieces[0]
    for p in pieces[1:]:
        cand = cand.unionByName(p)
    cand = cand.distinct()
    out = cand.withColumn("sim", cosine(F.col("v_a"), F.col("v_b")))
    return (out.filter(F.col("sim") >= tau)
            .select("id_a", "id_b",
                    F.floor(F.col("sim") * 1000000).cast("long")
                     .alias("sim_ppm")))
