"""Throughput-scale benchmark jobs for the north_rule scaling evidence.

The end-to-end crawl at sf0.1 schedules only a few hundred URLs per
wave — per-wave fixed cost (job scheduling, checkpoint commits)
dominates, so it cannot evidence the ≥0.8 N→4N scaling criterion; that
criterion is about throughput at 10^10-frontier scale where fixed cost
amortizes to nothing.  These two jobs measure the actual per-URL /
per-page dataflows at multi-million-row scale with fully distributed
synthetic input (generated from ``spark.range`` on the executors — no
driver materialization, no disk dependency), exactly the wave-loop hot
stages:

* :func:`frontier_throughput_job` — canonicalize (JVM tier) → seen-set
  anti-join → per-host politeness window cut (WindowGroupLimit), over a
  Zipf-skewed host distribution (3 hot hosts carry 30% of URLs).
  Metric: frontier URLs deduped+scheduled per second.
* :func:`fetch_throughput_job` — posexplode span documents → resolve +
  admission in the Arrow-vectorized canonicalizer UDF → first-wins edge
  dedupe agg.  Metric: pages fetch-extracted per second.

Both are pure dataflow (one count() action at the end), so wall-clock
scales with cores until the shuffle/HOF stages saturate — the honest
proxy this sandbox has for N vs 4N executors.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .canon import canonicalize_df
from .operators.extract import extract_links
from .operators.politeness import schedule_wave


SYNTH_PARTS = 64  # fixed input-split count: a real 100 TB table has a
# file-determined partitioning that does NOT change with cluster size,
# so the scaling runs must see identical task granularity.


def synth_frontier(spark: SparkSession, n: int,
                   n_hosts: int = 10007) -> DataFrame:
    """n candidate URLs, Zipf-ish hosts: ids ≡ 0-2 (mod 10) land on 3
    hot hosts (10% of traffic each), the rest spread over n_hosts.
    Every 7th URL carries a query string + fragment (canonicalizer must
    strip both); every 11th is an inadmissible .png."""
    host_idx = (F.when(F.col("id") % 10 < 3, F.col("id") % 10)
                .otherwise(F.col("id") % n_hosts))
    host = F.concat(F.lit("h"), host_idx.cast("string"),
                    F.lit(".example.test"))
    ext = F.when(F.col("id") % 11 == 0, F.lit(".png")).otherwise(
        F.lit(".html"))
    path = F.concat(F.lit("/p/"), F.col("id").cast("string"), ext)
    tail = F.when(F.col("id") % 7 == 0, F.lit("?b=2&a=1#frag")).otherwise(
        F.lit(""))
    return spark.range(0, n, 1, SYNTH_PARTS).select(
        F.col("id").alias("seq"),
        F.concat(F.lit("https://"), host, path, tail).alias("url"))


def frontier_throughput_job(spark: SparkSession, n: int = 4_000_000,
                            seen_mod: int = 3, budget: int = 5_000) -> dict:
    """Dedupe+schedule ``n`` synthetic frontier URLs; returns metrics.

    seen set = every ``seen_mod``-th URL's page_id, derived identically
    (same expressions) so the anti-join does real hash matching.

    ``budget`` is deliberately ≪ hot-host pending (realistic politeness:
    a host never gets 10^5 fetches in one wave) — WindowGroupLimit then
    prunes the 3 hot hosts map-side BEFORE the window shuffle, so the
    skewed hosts can't serialize the reduce stage."""
    cand = synth_frontier(spark, n)
    c = canonicalize_df(cand, url_col="url", mode="sql")
    pending = (c.filter(F.col("canon.admissible"))
               .select("seq",
                       F.col("canon.page_id").alias("page_id"),
                       F.col("canon.host").alias("host")))
    seen = (canonicalize_df(
        synth_frontier(spark, n).filter(F.col("seq") % seen_mod == 0),
        url_col="url", mode="sql")
        .select(F.col("canon.page_id").alias("page_id")))
    unseen = pending.join(seen, "page_id", "left_anti")
    scheduled, _ = schedule_wave(unseen, None, default_budget=budget)
    t0 = time.monotonic()
    n_sched = scheduled.count()
    wall = time.monotonic() - t0
    return {"n_urls": n, "n_scheduled": n_sched,
            "wall_sec": round(wall, 3),
            "urls_per_sec": round(n / wall, 1)}


def synth_span_web(spark: SparkSession, n_pages: int,
                   links_per_page: int = 8) -> DataFrame:
    """n_pages span documents in the BASELINE.json input_hint shape;
    hrefs are a mix of absolute, query-string'd, root-relative, and
    inadmissible .png — same variant scheme as webgen."""
    host = F.concat(F.lit("h"), (F.col("id") % 997).cast("string"),
                    F.lit(".example.test"))
    url = F.concat(F.lit("https://"), host, F.lit("/d/"),
                   F.col("id").cast("string"), F.lit(".html"))
    spans = F.transform(
        F.sequence(F.lit(1), F.lit(links_per_page)),
        lambda k: F.struct(
            F.lit("link").alias("kind"),
            F.concat(F.lit("anchor-"), k.cast("string")).alias("text"),
            F.when(k % 4 == 0,
                   F.concat(F.lit("/img"), ((F.col("id") + k) % 1000000)
                            .cast("string"), F.lit(".png")))
            .when(k % 4 == 3,
                  F.concat(F.lit("/d/"), ((F.col("id") * 31 + k) % 1000000)
                           .cast("string"), F.lit(".html")))
            .when(k % 4 == 2,
                  F.concat(F.lit("https://h"),
                           ((F.col("id") + k * 7) % 997).cast("string"),
                           F.lit(".example.test/d/"),
                           ((F.col("id") * 13 + k) % 1000000).cast("string"),
                           F.lit(".html?x=1#f")))
            .otherwise(
                F.concat(F.lit("https://h"),
                         ((F.col("id") + k) % 997).cast("string"),
                         F.lit(".example.test/d/"),
                         ((F.col("id") * 7 + k) % 1000000).cast("string"),
                         F.lit(".html"))).alias("media_ref"),
            k.cast("int").alias("offset")))
    return spark.range(0, n_pages, 1, SYNTH_PARTS).select(
        F.sha1(url).alias("page_id"), url.alias("url"), spans.alias("spans"))


def synth_consistent_web(spark: SparkSession, n_pages: int,
                         links_per_page: int = 8) -> DataFrame:
    """Internally-consistent crawlable web: every admissible href
    resolves to a page that actually exists in the table (host =
    h<target %997> — unlike :func:`synth_span_web`, whose hrefs
    exercise the canonicalizer but mostly point nowhere).  Shape:
    (page_id=sha1(host+path), url, host, path, content_type, fetch_ok,
    spans) — the SparkCrawler web contract."""
    primes = [7, 13, 31, 17, 23, 11, 19, 29]

    def host_of(num):
        return F.concat(F.lit("h"), (num % 997).cast("string"),
                        F.lit(".example.test"))

    def path_of(num):
        return F.concat(F.lit("/d/"), num.cast("string"), F.lit(".html"))

    pid = F.col("id")
    host, path = host_of(pid), path_of(pid)
    url = F.concat(F.lit("https://"), host, path)

    def span_k(k):
        p = primes[(k - 1) % len(primes)]
        tgt = (pid * p + k) % n_pages
        t_url = F.concat(F.lit("https://"), host_of(tgt), path_of(tgt))
        href = (
            # inadmissible media ref (filtered by F3)
            F.when(F.lit(k % 4 == 0),
                   F.concat(F.lit("https://"), host_of(tgt), F.lit("/img"),
                            tgt.cast("string"), F.lit(".png")))
            # root-relative only when same-host (else absolute)
            .when(F.lit(k % 4 == 3),
                  F.when(tgt % 997 == pid % 997, path_of(tgt))
                   .otherwise(t_url))
            # absolute with query+fragment (canonicalizer strips)
            .when(F.lit(k % 4 == 2), F.concat(t_url, F.lit("?b=2&a=1#s")))
            .otherwise(t_url))
        return F.struct(
            F.lit("link").alias("kind"),
            F.concat(F.lit("anchor-"), F.lit(k).cast("string")).alias("text"),
            href.alias("media_ref"), F.lit(k).cast("int").alias("offset"))

    spans = F.array(*[span_k(k) for k in range(1, links_per_page + 1)])
    return spark.range(0, n_pages, 1, SYNTH_PARTS).select(
        F.sha1(F.concat(host, path)).alias("page_id"), url.alias("url"),
        host.alias("host"), path.alias("path"),
        F.lit("text/html").alias("content_type"),
        F.lit(True).alias("fetch_ok"), spans.alias("spans"))


def crawl_scale_job(spark: SparkSession, n_pages: int = 1_000_000,
                    n_seeds: int = 500, max_waves: int = 5,
                    links_per_page: int = 8, state_dir: str | None = None,
                    budget: int | None = None,
                    bucketed_state: bool = False,
                    n_buckets: int = 32,
                    seen_mode: str = "exact") -> dict:
    """End-to-end SparkCrawler throughput over a big synthetic span
    web: the wave loop (dedupe → schedule → fetch-extract → append ×6
    tables → checkpoint) at wave sizes where per-wave fixed cost
    amortizes.  Returns aggregate URLs/s and pages/s — the
    BASELINE.json headline metric measured through the REAL loop, not
    the stage-level jobs."""
    import tempfile

    from pyspark.sql import functions as F

    from .crawler import UNBOUNDED, SparkCrawler

    # persist ≙ the web being a stored table: without it the generator
    # expressions (sha1 + 8 struct hrefs per row) re-run at every
    # wave's fetch join.
    web = synth_consistent_web(spark, n_pages, links_per_page).persist()
    doc_num = F.regexp_extract("url", r"/d/([0-9]+)\.html", 1).cast("long")
    seeds = (web.withColumn("__n", doc_num)
             .filter(F.col("__n") < n_seeds)
             .select(F.col("__n").alias("seq"), "url"))
    c = SparkCrawler(spark, state_dir or tempfile.mkdtemp(prefix="wgs_big_"),
                     web, max_waves=max_waves,
                     default_budget=budget or UNBOUNDED,
                     bucketed_state=bucketed_state, n_buckets=n_buckets,
                     seen_mode=seen_mode)
    t0 = time.monotonic()
    c.init_from_seeds(seeds)
    c.run()
    wall = time.monotonic() - t0
    n_sched = sum(m.n_scheduled for m in c.metrics)
    n_fetched = sum(m.n_expanded for m in c.metrics)
    return {"n_pages_web": n_pages, "waves": len(c.metrics),
            "bucketed_state": bucketed_state, "seen_mode": seen_mode,
            "urls_scheduled": n_sched, "pages_fetched": n_fetched,
            "urls_enqueued": sum(m.n_enqueued for m in c.metrics),
            "wall_sec": round(wall, 3),
            "per_wave_sec": [round(m.wall_ms / 1000, 2) for m in c.metrics],
            "frontier_urls_per_sec": round(n_sched / wall, 1),
            "pages_per_sec": round(n_fetched / wall, 1)}


def seen_antijoin_scale_job(spark: SparkSession, n_seen: int = 20_000_000,
                            n_cand: int = 200_000, n_waves: int = 3,
                            n_buckets: int = 32) -> dict:
    """The layout decision isolated: candidates ⟕̸ seen at the regime
    the bucketed layout exists for — |seen| ≫ |wave| (a mature crawl:
    10^10 seen, 10^6/wave).  The end-to-end --big-crawl bench can't
    show this (5 waves from seeds ⇒ state ≈ wave size, so the extra
    bucket-aligned write shuffle costs more than the join saves — see
    BENCH/BASELINE.md for both numbers and the crossover rule).

    plain    : seen as plain parquet — every wave re-shuffles ALL of
               seen into the anti-join (shuffle ∝ |seen|).
    bucketed : seen bucketed+sorted on page_id — zero Exchange on the
               seen side; per-wave shuffle ∝ |wave| only.

    Reports per-wave anti-join wall (median of n_waves) per layout plus
    the one-time write cost of each layout.
    """
    import statistics
    import tempfile

    from .storage import WaveStore

    root = tempfile.mkdtemp(prefix="wgs_aj_")
    seen_src = spark.range(0, n_seen, 1, SYNTH_PARTS).select(
        F.sha1(F.col("id").cast("string")).alias("page_id"))
    out: dict = {"n_seen": n_seen, "n_cand": n_cand,
                 "n_buckets": n_buckets}
    for layout, bucketed in (("plain", False), ("bucketed", True)):
        store = WaveStore(spark, f"{root}/{layout}", bucketed=bucketed,
                          n_buckets=n_buckets)
        t0 = time.monotonic()
        store.write("seen", seen_src, wave=0)
        store.commit(0)
        write_sec = time.monotonic() - t0
        seen = store.read("seen").select("page_id")
        walls = []
        for w in range(n_waves):
            # fresh candidate ids per wave (half seen, half new)
            cand = spark.range(
                n_seen - n_cand // 2 + w, n_seen + n_cand // 2 + w, 1,
                SYNTH_PARTS).select(
                F.sha1(F.col("id").cast("string")).alias("page_id"))
            t0 = time.monotonic()
            n_new = cand.join(seen, "page_id", "left_anti").count()
            walls.append(time.monotonic() - t0)
        out[layout] = {"write_sec": round(write_sec, 2),
                       "antijoin_sec_per_wave": [round(x, 2) for x in walls],
                       "antijoin_median_sec": round(
                           statistics.median(walls), 2),
                       "n_new_last": n_new}
    out["speedup_antijoin"] = round(
        out["plain"]["antijoin_median_sec"]
        / out["bucketed"]["antijoin_median_sec"], 2)
    return out


def fetch_throughput_job(spark: SparkSession, n_pages: int = 300_000,
                         links_per_page: int = 8) -> dict:
    """Fetch-extract ``n_pages`` span docs through the Arrow UDF path +
    first-wins edge dedupe; returns metrics."""
    web = synth_span_web(spark, n_pages, links_per_page)
    links = extract_links(web)
    edges = (links.groupBy(F.col("page_id").alias("from_page_id"),
                           F.col("canon.page_id").alias("to_page_id"))
             .agg(F.min("link_index").alias("first_idx")))
    t0 = time.monotonic()
    n_edges = edges.count()
    wall = time.monotonic() - t0
    return {"n_pages": n_pages, "n_links_per_page": links_per_page,
            "n_edges": n_edges, "wall_sec": round(wall, 3),
            "pages_per_sec": round(n_pages / wall, 1)}
