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


def scd2_history(snapshots: DataFrame, id_col: str = "page_id",
                 snap_col: str = "snap", digest_col: str = "digest",
                 current_snap: int | None = None) -> DataFrame:
    """Compact per-snapshot observations into a type-2 slowly-changing
    dimension (Kimball SCD2) — the history table a 100 TB pipeline
    keeps INSTEAD of S full snapshots: one row per maximal run of
    consecutive snapshots over which a page's content digest was
    stable, with ``valid_from``/``valid_to`` snapshot bounds.

    Semantics (gaps-and-islands): a new version row opens when the
    digest CHANGES or when the page was ABSENT from the previous
    snapshot (an observation gap closes the interval — re-appearance
    opens a fresh row even if the digest matches an older one, so the
    history never asserts continuity it didn't observe).
    ``is_current`` marks rows whose run reaches ``current_snap`` (the
    compactor's newest snapshot id; defaults to max(snap) in the
    input, computed distributively).

    Shape at scale: ONE shuffle on the uniform page key, a per-page
    lag window (rows per page = S snapshots, a literal constant), one
    uniform-key agg — output ∝ change volume, never S × corpus.  The
    classic alternative (self-join snap s with s−1) shuffles S times.

    Reference analog: none — engine extension (SURVEY §2.10 E114);
    the reference stores only the newest capture per page
    (pkg/linkstorage/linkstorage.go page upsert).
    """
    w = Window.partitionBy(id_col).orderBy(snap_col)
    flagged = snapshots.select(
        id_col, snap_col, digest_col,
        F.when(
            F.lag(snap_col).over(w).isNull()
            | (F.lag(snap_col).over(w) != F.col(snap_col) - 1)
            | (F.lag(digest_col).over(w) != F.col(digest_col)),
            F.lit(1)).otherwise(F.lit(0)).alias("__new"))
    runs = flagged.withColumn(
        "__ver", F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    out = (runs.groupBy(id_col, "__ver")
           .agg(F.min(snap_col).alias("valid_from"),
                F.max(snap_col).alias("valid_to"),
                F.first(digest_col).alias(digest_col),
                F.count(F.lit(1)).alias("n_snaps")))
    if current_snap is None:
        cur = out.agg(F.max("valid_to").alias("__cur"))
        out = out.join(F.broadcast(cur))
    else:
        out = out.withColumn("__cur", F.lit(int(current_snap)))
    return out.select(
        id_col, digest_col,
        F.col("valid_from").cast("long").alias("valid_from"),
        F.col("valid_to").cast("long").alias("valid_to"),
        F.col("n_snaps").cast("long").alias("n_snaps"),
        (F.col("valid_to") == F.col("__cur")).cast("int")
        .alias("is_current"))


def revalidation_savings(visits: DataFrame,
                         host_col: str = "host",
                         id_col: str = "page_id",
                         wave_col: str = "wave",
                         digest_col: str = "digest",
                         bytes_col: str = "n_bytes") -> DataFrame:
    """Conditional-GET savings audit (E157) — the bandwidth-planning
    question behind ``If-None-Match``: of the re-fetches the crawl
    actually performed, how many would have come back ``304 Not
    Modified`` (same payload digest as the previous visit) had the
    fetcher sent the validator, and how many bytes per host that
    revalidation would have kept off the wire?  The measured case
    for teaching the fetch seam ETags — the same price-the-change-
    first discipline as the zonemap/gap/dedup audits, applied to the
    crawler's own bandwidth bill.

    Semantics: per page, visits ordered by wave; a visit is
    revalidatable iff it has a predecessor AND its digest equals the
    predecessor's (first fetches are never savable; any change
    forces a full body).  Exact integers per host: fetch/304 counts,
    total vs savable bytes, ``saved_ppm = 10⁶·bytes_saved div
    bytes_total``.

    Shape: ONE shuffle on page id (the lag window) then a host agg
    — page → host is a projection, no join; at 10^10 visit rows both
    keys are uniform.

    → ``(host, n_fetches, n_revalidatable, bytes_total,
    bytes_saved, saved_ppm)``.

    Reference analog: the reference re-fetches unconditionally
    (client.Do with no validator headers, pkg/linkprocessor);
    engine extension (SURVEY §2.10 E157).
    """
    w = Window.partitionBy(id_col).orderBy(wave_col)
    prev = F.lag(F.col(digest_col)).over(w)
    lab = (visits.withColumn(
        "reval", prev.isNotNull()
        & (F.col(digest_col) == prev)))
    return (lab.groupBy(F.col(host_col).alias("host"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_fetches"),
                 F.sum(F.col("reval").cast("int")).cast("long")
                 .alias("n_revalidatable"),
                 F.sum(bytes_col).cast("long").alias("bytes_total"),
                 F.sum(F.when(F.col("reval"), F.col(bytes_col))
                       .otherwise(0)).cast("long")
                 .alias("bytes_saved"))
            .withColumn("saved_ppm",
                        F.expr("1000000 * bytes_saved "
                               "div bytes_total")))
