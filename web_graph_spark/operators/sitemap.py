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
