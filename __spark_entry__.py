"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: a real 3-wave crawl (SparkCrawler) over
the deterministic web derived from sf0.001 documents.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator
(SURVEY.md §2 ids cited per query); the driver cross-checks each pair
via DuckDB at sf0.01 (row count + schema + order-insensitive value
hash), so every computed column is aliased identically on both sides.

Identity note: engine-internal page identity is sha1(host+path)
(reference parity, /root/reference/pkg/linkutils/linkutils.go:66-71);
DuckDB 1.0 lacks sha1, so oracle-compared ids use md5(host||path)
(same dedupe semantics).  sha1 parity is pinned by tests/test_canon.py.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from web_graph_spark import webgen
from web_graph_spark.canon import canonicalize_df


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _links_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All derived links, canonicalized by the engine's JVM SQL tier
    (operator F5-F8 surface; root-relative hrefs resolved first)."""
    l = webgen.links_full_df(spark, sf_dir)
    href_abs = F.when(F.col("href").startswith("/"),
                      F.concat(F.lit("https://"), F.col("src_host"),
                               F.col("href"))).otherwise(F.col("href"))
    l = l.withColumn("href_abs", href_abs)
    c = canonicalize_df(l, url_col="href_abs", mode="sql")
    return c.select(
        "src_doc_id", "k", "href", "tgt_doc_id",
        F.col("canon.host").alias("host"),
        F.col("canon.path").alias("path"),
        F.col("canon.admissible").alias("admissible"),
        F.md5(F.concat(F.col("canon.host"), F.col("canon.path")))
         .alias("check_id"))


def _oracle(body: str, *, seeds: bool = False) -> str:
    parts = [webgen.PAGES_SQL.strip(), webgen.links_sql().strip()]
    if seeds:
        parts.append(webgen.SEEDS_SQL.strip())
    return "WITH " + ",\n".join(p.strip().rstrip() for p in parts) + "\n" + body


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def build_span_web(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived web in the BASELINE.json input_hint shape:
    (page_id, url, host, path, content_type, fetch_ok,
     spans: array<struct<kind,text,media_ref,offset>>)."""
    l = webgen.links_full_df(spark, sf_dir)
    spans = (
        l.groupBy("src_doc_id")
        .agg(F.sort_array(F.collect_list(F.struct(
            F.col("k").alias("offset"), F.lit("link").alias("kind"),
            F.col("anchor").alias("text"),
            F.col("href").alias("media_ref")))).alias("raw"))
        .select("src_doc_id",
                F.transform("raw", lambda x: F.struct(
                    x["kind"].alias("kind"), x["text"].alias("text"),
                    x["media_ref"].alias("media_ref"),
                    x["offset"].cast("int").alias("offset"))).alias("spans")))
    pages = webgen.pages_df(spark, sf_dir)
    return (pages.join(spans, pages.doc_id == spans.src_doc_id, "left")
            .select(F.sha1(F.concat("host", "path")).alias("page_id"),
                    "url", "host", "path",
                    F.lit("text/html").alias("content_type"),
                    F.lit(True).alias("fetch_ok"),
                    F.coalesce("spans", F.array().cast(
                        "array<struct<kind:string,text:string,"
                        "media_ref:string,offset:int>>")).alias("spans")))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 3 crawl waves over the sf0.001-derived span web;
    returns the crawl order joined with crawled page rows."""
    from web_graph_spark.crawler import SparkCrawler

    sf_dir = "/root/testdata/sf0.001"
    web = build_span_web(spark, sf_dir)
    seeds = webgen.seeds_df(spark, sf_dir).withColumnRenamed("seed_seq", "seq")
    state = tempfile.mkdtemp(prefix="wgs_entry_")
    c = SparkCrawler(spark, state, web, max_waves=3)
    c.init_from_seeds(seeds)
    c.run()
    order = c.store.read("crawl_order").select("wave", "seq", "page_id")
    pages = c.store.read("pages").select("page_id", "host", "url")
    return order.join(pages, "page_id").orderBy("wave", "seq")


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def q_crawl_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5-F8 + X1: canonicalize every derived href (JVM tier)."""
    return _links_canon(spark, sf_dir).select(
        "src_doc_id", "k", "href", "host", "path", "admissible", "check_id")


def q_crawl_admission_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F3 aggregated: admissible/filtered link counts per host."""
    return (_links_canon(spark, sf_dir)
            .groupBy("host", "admissible")
            .agg(F.count("*").alias("n"))
            .select("host", "admissible", "n"))


def q_crawl_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: frontier candidates minus the seen set (left-anti join);
    seen ≡ pages with doc_id % 3 = 0."""
    l = _links_canon(spark, sf_dir).filter("admissible")
    cand = l.select("check_id", "host", "path").distinct()
    seen = (webgen.pages_df(spark, sf_dir).filter(F.col("doc_id") % 3 == 0)
            .select("check_id"))
    return cand.join(seen, "check_id", "left_anti")


def q_crawl_frontier_wave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3+D3+O1: one wave expansion — links from seed pages, admission
    via the canonicalizer, first-discovery-wins dedupe, dense FIFO seq."""
    seeds = webgen.seeds_df(spark, sf_dir)
    l = (_links_canon(spark, sf_dir)
         .join(seeds.select(F.col("seed_seq").alias("src_doc_id")),
               "src_doc_id")
         .filter("admissible")
         .join(seeds.select(F.col("seed_seq").alias("tgt_doc_id")),
               "tgt_doc_id", "left_anti"))
    first = (l.withColumn("ord", F.col("src_doc_id") * 8 + F.col("k"))
             .groupBy("tgt_doc_id", "check_id")
             .agg(F.min("ord").alias("ord")))
    w = Window.orderBy("ord")
    return (first.withColumn("seq", F.row_number().over(w) - 1)
            .select("seq", F.col("tgt_doc_id").alias("doc_id"), "check_id"))


def q_graph_links_from(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 GetLinksFrom(41, 100): distinct out-neighbors, limit 100."""
    return (webgen.links_full_df(spark, sf_dir)
            .filter((F.col("src_doc_id") == 41) & (F.col("k") % 4 != 0))
            .select(F.col("tgt_doc_id").alias("to_doc_id")).distinct()
            .orderBy("to_doc_id").limit(100))


def q_graph_links_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 GetLinksTo(7, 100): distinct in-neighbors (backlinks)."""
    return (webgen.links_full_df(spark, sf_dir)
            .filter((F.col("tgt_doc_id") == 7) & (F.col("k") % 4 != 0))
            .select(F.col("src_doc_id").alias("from_doc_id")).distinct()
            .orderBy("from_doc_id").limit(100))


def q_graph_page_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 /page/:id composite for doc_id < 10: node ⋈ out-edges with
    collect_list; neighbors as sorted csv for cross-engine compare."""
    pages = webgen.pages_df(spark, sf_dir).filter(F.col("doc_id") < 10)
    l = (webgen.links_full_df(spark, sf_dir).filter(F.col("k") % 4 != 0)
         .select(F.col("src_doc_id").alias("doc_id"), "tgt_doc_id"))
    agg = (l.groupBy("doc_id")
           .agg(F.countDistinct("tgt_doc_id").alias("outdeg"),
                F.array_join(F.sort_array(F.collect_set(
                    F.col("tgt_doc_id").cast("string"))), ",")
                 .alias("neighbors")))
    return (pages.join(agg, "doc_id", "left")
            .select("doc_id", "host", "url",
                    F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
                    F.coalesce("neighbors", F.lit("")).alias("neighbors")))


def q_graph_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 CountPages/CountLinks (exact, vs reference's reltuples
    estimate /root/reference/pkg/linkstorage/linkstorage.go:323-366)."""
    pages = webgen.pages_df(spark, sf_dir)
    l = webgen.links_full_df(spark, sf_dir).filter(F.col("k") % 4 != 0)
    return (pages.agg(F.count("*").alias("n_pages"),
                      F.countDistinct("host").alias("n_hosts"))
            .crossJoin(l.select("src_doc_id", "tgt_doc_id").distinct()
                       .agg(F.count("*").alias("n_links"))))


def q_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 + J2 index rationale: per-page out/in degree over distinct
    admissible edges."""
    e = (webgen.links_full_df(spark, sf_dir).filter(F.col("k") % 4 != 0)
         .select("src_doc_id", "tgt_doc_id").distinct())
    out_d = e.groupBy(F.col("src_doc_id").alias("doc_id")) \
             .agg(F.count("*").alias("out_deg"))
    in_d = e.groupBy(F.col("tgt_doc_id").alias("doc_id")) \
            .agg(F.count("*").alias("in_deg"))
    pages = webgen.pages_df(spark, sf_dir).select("doc_id")
    return (pages.join(out_d, "doc_id", "left").join(in_d, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
                    F.coalesce("in_deg", F.lit(0)).alias("in_deg")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "crawl_canonicalize": q_crawl_canonicalize,
        "crawl_admission_stats": q_crawl_admission_stats,
        "crawl_seen_antijoin": q_crawl_seen_antijoin,
        "crawl_frontier_wave": q_crawl_frontier_wave,
        "graph_links_from": q_graph_links_from,
        "graph_links_to": q_graph_links_to,
        "graph_page_composite": q_graph_page_composite,
        "graph_counts": q_graph_counts,
        "graph_degrees": q_graph_degrees,
    }


def oracle_sql() -> dict[str, str]:
    canon_path = ("CASE WHEN l.k % 4 = 0 THEN '/img' || CAST(l.tgt_doc_id AS"
                  " VARCHAR) || '.png' ELSE l.tgt_path END")
    return {
        "crawl_canonicalize": _oracle(f"""
SELECT l.src_doc_id, l.k, l.href, l.tgt_host AS host,
       {canon_path} AS path,
       l.k % 4 <> 0 AS admissible,
       md5(l.tgt_host || {canon_path}) AS check_id
FROM web_links_full l"""),
        "crawl_admission_stats": _oracle("""
SELECT tgt_host AS host, k % 4 <> 0 AS admissible, count(*) AS n
FROM web_links_full GROUP BY 1, 2"""),
        "crawl_seen_antijoin": _oracle("""
SELECT DISTINCT tgt_check_id AS check_id, tgt_host AS host,
       tgt_path AS path
FROM web_links_full l
WHERE l.k % 4 <> 0
  AND NOT EXISTS (SELECT 1 FROM web_pages p
                  WHERE p.doc_id % 3 = 0 AND p.check_id = l.tgt_check_id)"""),
        "crawl_frontier_wave": _oracle("""
, first AS (
  SELECT tgt_doc_id, tgt_check_id, min(src_doc_id * 8 + k) AS ord
  FROM web_links_full l
  WHERE src_doc_id IN (SELECT seed_seq FROM web_seeds)
    AND k % 4 <> 0
    AND tgt_doc_id NOT IN (SELECT seed_seq FROM web_seeds)
  GROUP BY tgt_doc_id, tgt_check_id
)
SELECT CAST(row_number() OVER (ORDER BY ord) - 1 AS INTEGER) AS seq,
       tgt_doc_id AS doc_id, tgt_check_id AS check_id
FROM first""", seeds=True),
        "graph_links_from": _oracle("""
SELECT DISTINCT tgt_doc_id AS to_doc_id FROM web_links_full
WHERE src_doc_id = 41 AND k % 4 <> 0 ORDER BY 1 LIMIT 100"""),
        "graph_links_to": _oracle("""
SELECT DISTINCT src_doc_id AS from_doc_id FROM web_links_full
WHERE tgt_doc_id = 7 AND k % 4 <> 0 ORDER BY 1 LIMIT 100"""),
        "graph_page_composite": _oracle("""
, agg AS (
  SELECT src_doc_id AS doc_id,
         count(DISTINCT tgt_doc_id) AS outdeg,
         string_agg(DISTINCT CAST(tgt_doc_id AS VARCHAR), ','
                    ORDER BY CAST(tgt_doc_id AS VARCHAR)) AS neighbors
  FROM web_links_full WHERE k % 4 <> 0 GROUP BY 1
)
SELECT p.doc_id, p.host, p.url,
       coalesce(a.outdeg, 0) AS outdeg,
       coalesce(a.neighbors, '') AS neighbors
FROM web_pages p LEFT JOIN agg a ON p.doc_id = a.doc_id
WHERE p.doc_id < 10"""),
        "graph_counts": _oracle("""
SELECT (SELECT count(*) FROM web_pages) AS n_pages,
       (SELECT count(DISTINCT host) FROM web_pages) AS n_hosts,
       (SELECT count(*) FROM (SELECT DISTINCT src_doc_id, tgt_doc_id
                              FROM web_links_full WHERE k % 4 <> 0)) AS n_links"""),
        "graph_degrees": _oracle("""
, e AS (SELECT DISTINCT src_doc_id, tgt_doc_id FROM web_links_full
        WHERE k % 4 <> 0)
SELECT p.doc_id,
       coalesce(o.n, 0) AS out_deg, coalesce(i.n, 0) AS in_deg
FROM web_pages p
LEFT JOIN (SELECT src_doc_id, count(*) AS n FROM e GROUP BY 1) o
       ON o.src_doc_id = p.doc_id
LEFT JOIN (SELECT tgt_doc_id, count(*) AS n FROM e GROUP BY 1) i
       ON i.tgt_doc_id = p.doc_id"""),
    }
