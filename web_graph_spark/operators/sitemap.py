"""Sitemap discovery + ingestion — operator E54.

The reference discovers URLs only by following links
(/root/reference/pkg/linkprocessor/linkprocessor.go:104-121); real
crawl deployments also ingest the URLs hosts PUBLISH: the ``Sitemap:``
directive in robots.txt (RFC 9309 §2.3 — group-independent, any number
of occurrences) pointing at sitemaps.org XML documents, which are
either a ``<urlset>`` of page URLs or a ``<sitemapindex>`` of child
sitemaps to expand.  Sitemap URLs are the highest-precision frontier
seed source there is (host-curated, no extraction noise), and the
natural feed for the crawler's streaming inbox
(``SparkCrawler(inbox_dir=...)``).

Spark-first shape: everything is JVM ``split`` / ``regexp`` /
``posexplode`` — no Python, no XML parser dependency (the sitemaps.org
schema is flat enough that ``<loc>`` extraction with entity unescape
is the whole job; a full XML parser would add a dependency to parse
two element names).  Bodies are a few KiB; the explode is partitioned
by host, so 10^8 hosts is one host-keyed shuffle of small rows —
identical scaling argument to ``parse_robots_txt``.

Deviations from a full sitemaps.org implementation, documented:

* ``<lastmod>/<changefreq>/<priority>`` are ignored (the re-crawl
  scheduler derives freshness from observed change rates instead —
  operators/recrawl.py);
* entity unescape covers the five XML built-ins (``&amp; &lt; &gt;
  &quot; &apos;``), which is the complete legal set for a ``<loc>``
  value per the protocol;
* gzipped sitemaps are a transport concern for the fetch seam, not
  the parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sitemap_directives", "sitemap_locs"]

# longest-first so &amp;lt; style double escapes resolve the inner
# entity only after the outer pass — matching every mainstream
# unescaper's single-pass order (built-ins first, ampersand last).
_XML_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&apos;", "'"), ("&amp;", "&"))


def _xml_unescape(col):
    for ent, ch in _XML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def sitemap_directives(df: DataFrame, host_col: str = "host",
                       text_col: str = "robots_txt") -> DataFrame:
    """``(host, pos, sitemap_url)`` — every ``Sitemap:`` directive in
    the robots body, in document order.  RFC 9309 §2.3: the directive
    is independent of user-agent groups, so unlike rule parsing there
    is no group state — one explode, one regexp, no window."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"))
    line = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    url = F.regexp_extract(line, r"(?i)^sitemap\s*:\s*(\S+)$", 1)
    return (lines.select("host", "pos", url.alias("sitemap_url"))
            .filter(F.col("sitemap_url") != ""))


def sitemap_locs(df: DataFrame, host_col: str = "host",
                 xml_col: str = "xml") -> DataFrame:
    """``(host, pos, loc, is_index)`` — the ``<loc>`` values of a
    sitemap document in document order, entity-unescaped and trimmed
    (the protocol allows surrounding whitespace).  ``is_index`` is
    true when the document root is ``<sitemapindex>``: the locs are
    CHILD SITEMAPS to fetch and expand, not page URLs — the caller
    loops until only urlset pages remain (sitemap indexes nest one
    level per the protocol, so one round of expansion suffices)."""
    locs = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"<loc>\s*([^<]*?)\s*</loc>"), 1)
    is_index = F.col(xml_col).contains("<sitemapindex")
    return (df.select(F.col(host_col).alias("host"),
                      is_index.alias("is_index"),
                      F.posexplode(locs).alias("pos", "rawloc"))
            .select("host", "pos",
                    _xml_unescape(F.col("rawloc")).alias("loc"),
                    "is_index"))


def sitemap_to_inbox(locs: DataFrame, arrival_ts) -> DataFrame:
    """Project :func:`sitemap_locs` output into the streaming
    front-door's inbox schema ``(url string, arrival_ts timestamp)``
    (streaming.INBOX_SCHEMA).  Only page URLs flow — ``is_index`` rows
    are child sitemaps for the fetch loop to expand first.  Write the
    result as parquet files into the crawler's ``inbox_dir`` and the
    existing enqueue pipeline does the rest: canonicalize → admission
    → exactly-once dedupe → wave ingestion
    (streaming.enqueue_stream → SparkCrawler(inbox_dir=...)).

    ``arrival_ts``: a datetime / ISO string stamping this sitemap
    snapshot — ingestion order among equal stamps falls back to the
    URL (the inbox drain orders by (arrival_ts, url)), keeping the
    feed deterministic.
    """
    return locs.filter(~F.col("is_index")).select(
        F.col("loc").alias("url"),
        F.lit(arrival_ts).cast("timestamp").alias("arrival_ts"))


def sitemap_coverage(declared: DataFrame, crawled: DataFrame,
                     host_col: str = "host",
                     url_col: str = "url") -> DataFrame:
    """Per-host audit of what a host PUBLISHES vs what the crawler
    actually FOUND — the closing of the sitemap loop (E149): after
    ingesting ``Sitemap:`` feeds (:func:`sitemap_locs`) and crawling,
    the operational questions are (a) how much of the declared
    surface did we reach (dead/stale sitemap entries inflate the
    frontier for nothing) and (b) how much of what we crawled the
    host never declared (orphans reachable only via links — the
    pages a sitemap-only crawler would miss).

    Exact integer verdicts per host over the union of both URL sets:

    * ``n_declared`` / ``n_crawled`` — distinct URLs on each side;
    * ``n_both`` — the intersection;
    * ``n_phantom = n_declared − n_both`` — declared, never crawled;
    * ``n_orphan = n_crawled − n_both`` — crawled, never declared;
    * ``coverage_pct = 100·n_both div n_declared`` (integer floor —
      engine-safe), NULL for a host that declared nothing (crawled-
      only hosts have no sitemap to be covered).

    Shape at 10^10 URLs: tag each side (d, c), union, ONE
    (host, url) hash agg (map-side partials absorb the duplicate
    declarations real sitemap indexes are full of), then ONE
    per-host agg — no join, both shuffles on uniform keys; a
    full-outer join on URL would shuffle the same bytes and add a
    null-handling surface.  All JVM codegen.

    → ``(host, n_declared, n_crawled, n_both, n_phantom, n_orphan,
    coverage_pct)``.

    Reference analog: none — the reference discovers URLs only by
    link extraction (linkprocessor.go:104-121); engine extension
    (SURVEY §2.10 E149).
    """
    d = declared.select(F.col(host_col).alias("host"),
                        F.col(url_col).alias("url"),
                        F.lit(1).alias("d"), F.lit(0).alias("c"))
    cr = crawled.select(F.col(host_col).alias("host"),
                        F.col(url_col).alias("url"),
                        F.lit(0).alias("d"), F.lit(1).alias("c"))
    per_url = (d.unionByName(cr)
               .groupBy("host", "url")
               .agg(F.max("d").alias("d"), F.max("c").alias("c")))
    agg = (per_url.groupBy("host")
           .agg(F.sum("d").cast("long").alias("n_declared"),
                F.sum("c").cast("long").alias("n_crawled"),
                F.sum(F.col("d") * F.col("c")).cast("long")
                .alias("n_both")))
    return agg.select(
        "host", "n_declared", "n_crawled", "n_both",
        (F.col("n_declared") - F.col("n_both")).alias("n_phantom"),
        (F.col("n_crawled") - F.col("n_both")).alias("n_orphan"),
        F.expr("CASE WHEN n_declared > 0 "
               "THEN 100 * n_both div n_declared END")
        .alias("coverage_pct"))
