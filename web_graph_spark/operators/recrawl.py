"""Re-crawl (freshness) scheduling — operator E46.

A crawler that only ever fetches a page once serves a stale corpus;
the production loop re-visits pages at a rate matched to how often
they actually change (Cho & Garcia-Molina, "Synchronizing a database
to improve freshness", SIGMOD 2000 — the classic result that revisit
frequency should follow the page's observed change rate, not uniform
recency).  The reference crawler never re-visits (its seen set is
permanent, pkg/linkprocessor/linkprocessor.go:80-92); this extension
is what a large-scale deployment adds on top.

Spark-first shape, all JVM and all integer:

* :func:`change_stats` — one ``lag`` window per page over the fetch
  history (page-keyed: uniform partitioning, no skew) counting digest
  transitions, then one uniform-key agg.
* :func:`recrawl_priority` — Laplace-smoothed change ratio in ppm
  ``(n_changes+1)*10^6 div (n_obs+1)`` times integer staleness
  seconds: a 64-bit score with NO float logs to drift between engines
  (the exact-λ Poisson estimator needs ``ln``; at ranking time the
  monotone integer surrogate orders pages identically for any fixed
  observation window, and it hashes bit-identically in any engine —
  same design choice as tfidf_topk's integer idf).

The score plugs straight into ``schedule_wave(priority_col=...)`` —
politeness budgets apply to re-crawls exactly as to discoveries (the
score is negated: schedule_wave ranks ascending).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def change_stats(history: DataFrame, id_col: str = "page_id",
                 ts_col: str = "fetched_at",
                 digest_col: str = "content_digest") -> DataFrame:
    """Per-page observation stats from a fetch-history relation
    ``(id, fetched_at, content_digest)``: number of observations,
    number of observed CHANGES (digest differs from the previous
    fetch's, in fetch-time order), and the last fetch time.

    One window partitioned by the page id (uniform keys — no hot
    partitions at any corpus size) + one uniform-key agg.
    """
    w = Window.partitionBy(id_col).orderBy(ts_col)
    marked = history.withColumn("__prev", F.lag(digest_col).over(w))
    return (marked.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_obs"),
                 F.sum((F.col("__prev").isNotNull()
                        & (F.col("__prev") != F.col(digest_col)))
                       .cast("long")).alias("n_changes"),
                 F.max(ts_col).alias("last_fetch")))


def recrawl_priority(stats: DataFrame, now_ts,
                     id_col: str = "page_id") -> DataFrame:
    """Integer re-crawl score per page: ``change_ppm * age_s``.

    change_ppm = (n_changes+1)*10^6 div (n_obs+1) — Laplace-smoothed
    so a page never observed changing still ages back into the queue
    instead of starving forever; age_s = seconds since last fetch at
    ``now_ts`` (a literal or column).  Both factors and the product
    are exact 64-bit integers.
    """
    change_ppm = ((F.col("n_changes") + 1) * PPM).cast("long") \
        / (F.col("n_obs") + 1)
    change_ppm = F.floor(change_ppm).cast("long")
    age_s = (F.unix_timestamp(F.lit(now_ts))
             if not isinstance(now_ts, F.Column)
             else F.unix_timestamp(now_ts)) \
        - F.unix_timestamp(F.col("last_fetch"))
    return (stats.withColumn("change_ppm", change_ppm)
            .withColumn("age_s", age_s.cast("long"))
            .withColumn("recrawl_score",
                        (F.col("change_ppm") * F.col("age_s"))
                        .cast("long")))


def snapshot_delta(a: DataFrame, b: DataFrame, id_col: str = "page_id",
                   digest_col: str = "content_digest") -> DataFrame:
    """Crawl snapshot diff — ``(id, kind, digest_a, digest_b)`` with
    kind ∈ added | removed | changed, comparing an earlier crawl ``a``
    to a later crawl ``b`` of the same scope.  The operational query
    behind every continuous-crawl dashboard ("what did this week's
    crawl change?") and the input to incremental downstream refresh
    (only `changed ∪ added` re-enters the dedup/index pipelines;
    `removed` tombstones them).

    One full-outer equi-join on the uniform page key; UNCHANGED pages
    (the overwhelming majority of a mature crawl) are filtered out, so
    the output is proportional to the CHANGE volume, never the corpus.
    No window, no skew: page ids are uniform hashes by construction.
    """
    aa = a.select(F.col(id_col).alias("id"),
                  F.col(digest_col).alias("digest_a"))
    bb = b.select(F.col(id_col).alias("id"),
                  F.col(digest_col).alias("digest_b"))
    j = aa.join(bb, "id", "full_outer")
    kind = (F.when(F.col("digest_a").isNull(), "added")
            .when(F.col("digest_b").isNull(), "removed")
            .when(F.col("digest_a") != F.col("digest_b"), "changed"))
    return (j.select("id", kind.alias("kind"), "digest_a", "digest_b")
            .filter(F.col("kind").isNotNull()))
