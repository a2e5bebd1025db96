"""Redirect-chain resolution — batch 3xx graph flattening.

The live fetcher follows redirects inline per request (fetch.py:
``MAX_REDIRECTS``, mirroring Go's http.Client default of 10 —
reference analog ``pkg/crawler/crawler.go`` via its client), which is
the right shape while fetching.  But a crawl STORE accumulates a
redirect relation of its own — every (src → Location) pair observed —
and batch consumers need it flattened: canonical-URL election, link
rewriting (edges pointing at a 301 source should credit the target),
and re-crawl planning (a page whose redirect target changed is a
change event) all want ``src → final`` with loop detection, computed
once over the whole relation rather than re-followed per lookup.

Spark-first mechanism: POINTER DOUBLING (the classic parallel
list-ranking trick).  Each round composes the mapping with itself —
``M' (s) = M(M(s))`` where defined — so a chain of length L flattens
in ceil(log2 L) self-joins, not L of them: 10-deep chains (the
fetcher's own cap) cost 4 shuffles at ANY corpus size.  The relation
is functional (one Location per source), so composition is a plain
equi-join on the uniform url key; hop counts compose additively and
stay exact.  Rows still pointing into the redirect domain after the
final round are cycles or over-long chains — flagged ``loop``, the
batch analog of the fetcher's redirect-loop RuntimeError
(fetch.py:408).

Scale: every round shuffles only the (src, dst, hops) projection of
the UNRESOLVED rows on a uniform key; resolved rows exit the join via
the left-outer null side.  No driver materialization, no per-row
Python.  At 10^10 URLs with real-web chain depths (≪ 16) this is 4
self-joins of a thin relation.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def resolve_redirects(redirects: DataFrame, src_col: str = "src_url",
                      dst_col: str = "dst_url",
                      max_rounds: int = 4) -> DataFrame:
    """Flatten a functional redirect relation to terminal targets.

    Input: one row per redirect source — (src_col, dst_col).  Output:
    (src_col, final_url, n_hops, status) where status='ok' rows carry
    the first non-redirecting URL on the chain and the exact hop
    count, and status='loop' rows (cycles, or chains longer than
    2**max_rounds) carry NULLs — the caller quarantines those, as the
    fetcher does live.
    """
    m = (redirects.select(F.col(src_col).alias("src"),
                          F.col(dst_col).alias("dst"))
         .withColumn("hops", F.lit(1).cast("int")))
    for _ in range(max_rounds):
        nxt = m.select(F.col("src").alias("j_src"),
                       F.col("dst").alias("j_dst"),
                       F.col("hops").alias("j_hops"))
        m = (m.join(nxt, m["dst"] == nxt["j_src"], "left")
             .select(F.col("src"),
                     F.coalesce(F.col("j_dst"), F.col("dst"))
                     .alias("dst"),
                     (F.col("hops")
                      + F.coalesce(F.col("j_hops"), F.lit(0)))
                     .alias("hops")))
    domain = redirects.select(F.col(src_col).alias("dst")).distinct() \
                      .withColumn("__in_domain", F.lit(1))
    out = m.join(domain, "dst", "left")
    looped = F.col("__in_domain").isNotNull()
    return out.select(
        F.col("src").alias(src_col),
        F.when(looped, F.lit(None)).otherwise(F.col("dst"))
         .alias("final_url"),
        F.when(looped, F.lit(None).cast("int"))
         .otherwise(F.col("hops")).alias("n_hops"),
        F.when(looped, F.lit("loop")).otherwise(F.lit("ok"))
         .alias("status"))


def rewrite_edges(edges: DataFrame, resolved: DataFrame,
                  dst_col: str = "dst_url") -> DataFrame:
    """Rewrite edge targets through a resolved redirect map: edges
    into an 'ok' redirect source re-point at its terminal URL; edges
    into a 'loop' source drop (the fetcher would never commit a page
    there).  One left join on the uniform url key."""
    ok = resolved.filter(F.col("status") == "ok").select(
        F.col(resolved.columns[0]).alias("__r_src"), "final_url")
    loop = resolved.filter(F.col("status") == "loop").select(
        F.col(resolved.columns[0]).alias("__l_src"),
        F.lit(1).alias("__is_loop"))
    out = (edges.join(ok, edges[dst_col] == ok["__r_src"], "left")
           .join(loop, edges[dst_col] == loop["__l_src"], "left")
           .filter(F.col("__is_loop").isNull()))
    return (out.withColumn(dst_col, F.coalesce(F.col("final_url"),
                                               F.col(dst_col)))
            .drop("__r_src", "final_url", "__l_src", "__is_loop"))
