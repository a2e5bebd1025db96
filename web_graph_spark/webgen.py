"""Deterministic synthetic web derived from the sf testdata tables.

The driver's correctness gate cross-checks every ``queries()`` entry
against DuckDB SQL over the SAME parquet tables — so the crawl-family
queries need a web graph both engines can derive identically.  This
module defines it once: pure arithmetic/string derivation from
``documents`` (no randomness, no UDFs), with a Spark DataFrame builder
and a matching DuckDB ``WITH``-clause SQL text.

Shape: one page per document row; hosts are Zipf-skewed (hosts h00/h01
hold ~50% of pages — the hot-host case); out-links follow fixed
congruences ``(doc_id * p_k + k) % N``; href variants exercise the
canonicalizer (absolute, query-string'd, root-relative, and
inadmissible ``.png`` targets).

Identity note: engine-internal identity is sha1 (canon.page_id_of);
DuckDB 1.0 has no sha1, so oracle-checked queries expose
``check_id = md5(host || path)`` — same dedupe semantics, comparable
in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINK_PRIMES = [7, 13, 31, 17, 23]


def pages_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, host, path, url, check_id) one row per document."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    host_idx = (
        F.when(F.col("doc_id") % 10 < 3, F.lit(0))
         .when(F.col("doc_id") % 10 < 5, F.lit(1))
         .otherwise(F.col("doc_id") % 20)
    )
    host = F.concat(F.lit("h"), F.lpad(host_idx.cast("string"), 2, "0"),
                    F.lit(".example.test"))
    path = F.concat(F.lit("/d/"), F.col("doc_id").cast("string"),
                    F.lit(".html"))
    return (docs.select("doc_id")
            .withColumn("host", host)
            .withColumn("path", path)
            .withColumn("url", F.concat(F.lit("https://"), host, path))
            .withColumn("check_id", F.md5(F.concat(host, path))))


# DuckDB equivalent of pages_df (kept textually in sync — tests pin it).
PAGES_SQL = """
web_pages AS (
  SELECT doc_id,
         'h' || lpad(CAST(CASE WHEN doc_id % 10 < 3 THEN 0
                               WHEN doc_id % 10 < 5 THEN 1
                               ELSE doc_id % 20 END AS VARCHAR), 2, '0')
             || '.example.test' AS host,
         '/d/' || CAST(doc_id AS VARCHAR) || '.html' AS path,
         'https://' || 'h' || lpad(CAST(CASE WHEN doc_id % 10 < 3 THEN 0
                               WHEN doc_id % 10 < 5 THEN 1
                               ELSE doc_id % 20 END AS VARCHAR), 2, '0')
             || '.example.test' || '/d/' || CAST(doc_id AS VARCHAR)
             || '.html' AS url,
         md5('h' || lpad(CAST(CASE WHEN doc_id % 10 < 3 THEN 0
                               WHEN doc_id % 10 < 5 THEN 1
                               ELSE doc_id % 20 END AS VARCHAR), 2, '0')
             || '.example.test' || '/d/' || CAST(doc_id AS VARCHAR)
             || '.html') AS check_id
  FROM documents
)
"""


_N_DOCS_CACHE: dict[str, int] = {}


def _n_docs(spark: SparkSession, sf_dir: str) -> int:
    """|documents| per sf_dir, cached — every links_df caller was
    paying one count job per query otherwise (testdata is immutable
    for a session, so the cache is safe)."""
    if sf_dir not in _N_DOCS_CACHE:
        _N_DOCS_CACHE[sf_dir] = spark.read.parquet(
            f"{sf_dir}/documents.parquet").count()
    return _N_DOCS_CACHE[sf_dir]


def links_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_doc_id, k, tgt_doc_id, href, anchor) — out-links per page.

    out_degree(d) = d % 6; link k (1-based, k ≤ out_degree) targets
    (d * prime_k + k) % N.  href variants:
      k%4==1 → absolute target url
      k%4==2 → target url + '?ref=1&x=2' (same identity)
      k%4==3 → root-relative '/d/<t>.html'
      k%4==0 → inadmissible 'https://<host>/img<t>.png' (filtered)
    """
    pages = pages_df(spark, sf_dir).select(
        "doc_id", F.col("host").alias("src_host"),
        F.col("url").alias("src_url"))
    n = _n_docs(spark, sf_dir)
    # NB: Spark sequence(1, 0) is DESCENDING [1, 0] — guard out-deg 0.
    deg = (F.col("doc_id") % 6).cast("int")
    ks = F.when(deg >= 1, F.sequence(F.lit(1), deg)) \
          .otherwise(F.array().cast("array<int>"))
    exploded = (pages.withColumn("k", F.explode(ks))
                .withColumn("tgt_doc_id",
                            (F.col("doc_id")
                             * F.element_at(F.array(*[F.lit(p) for p in LINK_PRIMES]),
                                            F.col("k"))
                             + F.col("k")) % F.lit(n)))
    tgt = pages_df(spark, sf_dir).select(
        F.col("doc_id").alias("tgt_doc_id"), F.col("url").alias("tgt_url"),
        F.col("path").alias("tgt_path"), F.col("host").alias("tgt_host"))
    j = exploded.join(tgt, "tgt_doc_id")
    # root-relative hrefs are only valid for same-host targets —
    # cross-host targets fall back to the absolute URL.
    href = (F.when(F.col("k") % 4 == 1, F.col("tgt_url"))
             .when(F.col("k") % 4 == 2, F.concat(F.col("tgt_url"),
                                                 F.lit("?ref=1&x=2")))
             .when((F.col("k") % 4 == 3)
                   & (F.col("src_host") == F.col("tgt_host")),
                   F.col("tgt_path"))
             .when(F.col("k") % 4 == 3, F.col("tgt_url"))
             .otherwise(F.concat(F.lit("https://"), F.col("tgt_host"),
                                 F.lit("/img"),
                                 F.col("tgt_doc_id").cast("string"),
                                 F.lit(".png"))))
    anchor = F.concat(F.lit("anchor-"),
                      ((F.col("doc_id") + F.col("k")) % 7).cast("string"))
    return j.select(F.col("doc_id").alias("src_doc_id"), "src_host",
                    "src_url", "k", "tgt_doc_id", "tgt_host", "tgt_path",
                    "tgt_url", href.alias("href"), anchor.alias("anchor"))


N_DOCS_SQL = "(SELECT count(*) FROM documents)"


def links_sql(n_docs: int | str = N_DOCS_SQL) -> str:
    return f"""
web_links AS (
  SELECT p.doc_id AS src_doc_id, p.host AS src_host, p.url AS src_url,
         k.k AS k,
         (p.doc_id * CASE k.k WHEN 1 THEN 7 WHEN 2 THEN 13 WHEN 3 THEN 31
                              WHEN 4 THEN 17 ELSE 23 END + k.k)
             % {n_docs} AS tgt_doc_id,
         'anchor-' || CAST((p.doc_id + k.k) % 7 AS VARCHAR) AS anchor
  FROM web_pages p
  JOIN (SELECT unnest(generate_series(1, 5)) AS k) k
    ON k.k <= p.doc_id % 6
),
web_links_full AS (
  SELECT l.*, t.host AS tgt_host, t.path AS tgt_path, t.url AS tgt_url,
         t.check_id AS tgt_check_id,
         CASE WHEN l.k % 4 = 1 THEN t.url
              WHEN l.k % 4 = 2 THEN t.url || '?ref=1&x=2'
              WHEN l.k % 4 = 3 AND l.src_host = t.host THEN t.path
              WHEN l.k % 4 = 3 THEN t.url
              ELSE 'https://' || t.host || '/img'
                   || CAST(l.tgt_doc_id AS VARCHAR) || '.png' END AS href
  FROM web_links l JOIN web_pages t ON t.doc_id = l.tgt_doc_id
)
"""


def links_full_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """links_df + tgt_check_id (matches web_links_full)."""
    l = links_df(spark, sf_dir)
    return l.withColumn("tgt_check_id",
                        F.md5(F.concat(F.col("tgt_host"), F.col("tgt_path"))))


def seeds_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages with doc_id % 97 == 0, seed order = doc_id."""
    return (pages_df(spark, sf_dir).filter(F.col("doc_id") % 97 == 0)
            .select(F.col("doc_id").alias("seed_seq"), "url"))


SEEDS_SQL = """
web_seeds AS (
  SELECT doc_id AS seed_seq, url FROM web_pages WHERE doc_id % 97 = 0
)
"""


def _url_of(idc: F.Column) -> F.Column:
    """URL of an arbitrary doc id by the pages_df formula — targets of
    synthetic redirects may fall past |documents| (a terminal URL need
    not be a crawled page), so the URL is built from arithmetic, not
    joined against web_pages."""
    host_idx = (F.when(idc % 10 < 3, F.lit(0))
                 .when(idc % 10 < 5, F.lit(1))
                 .otherwise(idc % 20))
    return F.concat(F.lit("https://h"),
                    F.lpad(host_idx.cast("string"), 2, "0"),
                    F.lit(".example.test/d/"), idc.cast("string"),
                    F.lit(".html"))


def _url_of_sql(expr: str) -> str:
    return (f"'https://h' || lpad(CAST(CASE WHEN ({expr}) % 10 < 3 THEN 0 "
            f"WHEN ({expr}) % 10 < 5 THEN 1 ELSE ({expr}) % 20 END "
            f"AS VARCHAR), 2, '0') || '.example.test/d/' || "
            f"CAST(({expr}) AS VARCHAR) || '.html'")


def redirects_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src_url, dst_url) — the functional 3xx relation a crawl store
    accumulates, derived so every resolution case exists at any SF:
    doc_id % 100 == 0 heads a 2-hop chain (0 → +1, which is % 100 == 1
    → +2, terminal), 40 is a single hop, 59 points into the 60 ↔ 61
    two-cycle (a chain INTO a loop), and 60/61 form the cycle itself.
    One outgoing edge per source — functional, like real Location
    headers."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
                .select("doc_id")
    m = F.col("doc_id") % 100
    off = (F.when(m.isin(0, 59, 60), F.lit(1))
            .when(m == 1, F.lit(2))
            .when(m == 40, F.lit(3))
            .when(m == 61, F.lit(-1)))
    return (docs.withColumn("__off", off).filter(F.col("__off").isNotNull())
            .select(_url_of(F.col("doc_id")).alias("src_url"),
                    _url_of(F.col("doc_id") + F.col("__off"))
                    .alias("dst_url")))


REDIRECTS_SQL = f"""
web_redirects AS (
  SELECT {_url_of_sql('doc_id')} AS src_url,
         {_url_of_sql('doc_id + off')} AS dst_url
  FROM (SELECT doc_id,
               CASE WHEN doc_id % 100 IN (0, 59, 60) THEN 1
                    WHEN doc_id % 100 = 1 THEN 2
                    WHEN doc_id % 100 = 40 THEN 3
                    WHEN doc_id % 100 = 61 THEN -1 END AS off
        FROM documents)
  WHERE off IS NOT NULL
)
"""
