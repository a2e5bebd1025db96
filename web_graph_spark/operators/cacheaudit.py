"""Exact LRU(+TTL) cache hit-ratio audit over a keyed access log —
reuse-distance (stack-distance) analysis as bounded relational algebra.

The pooled fetcher resolves hosts through a 1000-entry LRU DNS cache
(``operators/fetch.py`` — the honest stdlib translation of the Go
reference's DoH cache, ``pkg/linkprocessor/linkprocessor.go:52-56``).
Sizing that cache is a real capacity decision at the 10^10-URL
frontier: too small and every wave re-resolves its working set, too
big and executors carry dead weight.  This operator REPLAYS the cache
exactly — per access: hit or miss, and why — from the access log
alone, with no sequential simulation.

The classic result this leans on (Mattson et al., IBM Sys J 1970): a
key is still resident in an LRU cache of capacity C at its next
access iff the number of DISTINCT keys touched since its previous
access (the reuse/stack distance) is < C.  With lazy TTL expiry
(entries linger until capacity evicts them; a hit additionally
requires the entry's own age ≤ TTL — exactly how a dict-based TTL-LRU
behaves), the rule stays exact:

* ``cold``  — first access of the key ever;
* ``ttl``   — previous access more than ``window`` positions ago
              (the entry expired on its own clock);
* ``evict`` — within TTL but ≥ ``capacity`` distinct keys intervened
              (LRU pushed it out);
* ``hit``   — otherwise.

Distributed shape: the TTL bound is what makes the audit tractable —
a reuse distance only needs COUNTING when the gap spans ≤ ``window``
positions (wider gaps are ``ttl`` misses unconditionally), so the
distinct-count join is bounded by ``window`` rows per access instead
of the unbounded gap an exact stack simulation walks.  Distinct
keys in a gap are counted WITHOUT a distinct agg: a gap row
contributes 1 iff it is the LAST occurrence of its key inside the
gap, i.e. its next-occurrence position falls at/after the gap end —
one lead() window turns the distinct count into a plain filtered
count.  The gap join itself is the bucketed interval join
(``operators/rangejoin.py``) — an equality shuffle on position
buckets, never a BroadcastNestedLoopJoin.

Per-key shuffles: one dense global rank (``frontier.py:ordered_seq``,
the 10^10-safe range-partitioned rank), one key-partitioned
lag/lead window, one bucket-keyed interval join, one uniform
(key, pos) agg, one per-key rollup.  Everything JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from web_graph_spark.operators.frontier import ordered_seq
from web_graph_spark.operators.rangejoin import range_join


def lru_hit_audit(accesses: DataFrame, key_col: str, ord_col: str,
                  capacity: int, window: int) -> DataFrame:
    """Classify every access in a log against a lazy-expiry TTL+LRU
    cache of ``capacity`` entries and ``window``-position TTL, and
    roll the verdicts up per key.

    ``accesses``: one row per cache probe; ``ord_col`` is a unique
    integral arrival order (any gaps allowed — positions are
    densified first so TTL/window count ACCESSES, not ord gaps).
    Returns (key, n_access, n_hit, n_cold, n_ttl, n_evict, hit_ppm)
    with hit_ppm = n_hit·10⁶ div n_access.
    """
    if capacity <= 0 or window <= 0:
        raise ValueError(f"capacity/window must be positive, "
                         f"got {capacity}/{window}")
    seqd = ordered_seq(
        accesses.select(F.col(key_col).alias("key"),
                        F.col(ord_col).cast("long").alias("ord")),
        ["ord"], out_col="pos")
    w = Window.partitionBy("key").orderBy("pos")
    acc = (seqd.select("key", "pos",
                       F.lag("pos").over(w).alias("prev"),
                       F.lead("pos").over(w).alias("next"))
           .localCheckpoint())
    # gaps that need an exact reuse-distance count: within TTL and
    # non-empty (an empty gap — back-to-back accesses — is d = 0)
    gaps = (acc.filter(F.col("prev").isNotNull()
                       & (F.col("pos") - F.col("prev") <= window)
                       & (F.col("pos") - F.col("prev") > 1))
            .select(F.col("key").alias("a_key"),
                    F.col("pos").alias("a_pos"),
                    (F.col("prev") + 1).alias("lo"),
                    F.col("pos").alias("hi")))
    probes = acc.select(F.col("pos").alias("b_pos"),
                        F.col("next").alias("b_next"))
    d = (range_join(probes, gaps, v="b_pos", lo="lo", hi="hi",
                    bucket_width=window)
         .groupBy("a_key", "a_pos")
         .agg(F.sum(F.when(F.col("b_next").isNull()
                           | (F.col("b_next") >= F.col("a_pos")), 1)
                    .otherwise(0)).alias("dn")))
    cls = (acc.join(d, (acc["key"] == d["a_key"])
                    & (acc["pos"] == d["a_pos"]), "left")
           .select("key", "pos", "prev",
                   F.coalesce("dn", F.lit(0)).alias("dn"))
           .withColumn("verdict", F.when(
               F.col("prev").isNull(), F.lit("cold")).when(
               F.col("pos") - F.col("prev") > window, F.lit("ttl")).when(
               F.col("dn") >= capacity, F.lit("evict")).otherwise(
               F.lit("hit"))))
    n = lambda v: F.sum((F.col("verdict") == v).cast("long"))  # noqa: E731
    return (cls.groupBy("key")
            .agg(F.count(F.lit(1)).cast("long").alias("n_access"),
                 n("hit").alias("n_hit"), n("cold").alias("n_cold"),
                 n("ttl").alias("n_ttl"), n("evict").alias("n_evict"))
            .withColumn("hit_ppm", F.expr(
                "n_hit * 1000000 div n_access").cast("long")))
