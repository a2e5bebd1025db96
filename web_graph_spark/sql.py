"""SQL front-door: register the engine's tables as temp views so every
query runs through plain ``spark.sql`` as well as the DataFrame API.

Two surfaces:

* :func:`register_testdata` — the benchmark/test parquet tables
  (``region nation customer supplier part orders lineitem events
  documents embeddings``) as views named after the files, plus the
  derived synthetic web (``web_pages``, ``web_links_full``,
  ``web_seeds``) used by the crawl-family contract queries.
* :func:`register_store` — a crawl :class:`~web_graph_spark.storage.
  WaveStore`'s committed state (``pages edges seen frontier_log
  crawl_order docs_out metrics``), optionally prefixed, so the read
  API's J1-J5 queries are one ``spark.sql`` away::

      register_store(spark, store)
      spark.sql("SELECT to_page_id FROM edges "
                "WHERE from_page_id = '...' LIMIT 100")

Views are lazy plans over the live data (temp views re-resolve the
underlying DataFrame plan, so a view registered before wave N still
sees wave N after re-registration; call again after new commits —
cheap, it is pure metadata).  Catalyst treats view queries and
DataFrame queries identically, so every plan property the tests pin
(pushdown, broadcast, WindowGroupLimit) holds for the SQL spelling
too.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

TESTDATA_TABLES = ("region", "nation", "customer", "supplier", "part",
                   "orders", "lineitem", "events", "documents",
                   "embeddings")

STORE_TABLES = ("pages", "edges", "seen", "frontier_log", "crawl_order",
                "docs_out", "metrics")


def register_testdata(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the sf parquet tables + derived synthetic web as temp
    views; returns the view names."""
    from . import webgen

    names = []
    for t in TESTDATA_TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet") \
            .createOrReplaceTempView(t)
        names.append(t)
    webgen.pages_df(spark, sf_dir).createOrReplaceTempView("web_pages")
    webgen.links_full_df(spark, sf_dir) \
        .createOrReplaceTempView("web_links_full")
    webgen.seeds_df(spark, sf_dir).createOrReplaceTempView("web_seeds")
    names += ["web_pages", "web_links_full", "web_seeds"]
    return names


def register_store(spark: SparkSession, store,
                   prefix: str = "") -> list[str]:
    """Register a WaveStore's committed tables as temp views
    (``<prefix><table>``); returns the view names."""
    names = []
    for t in STORE_TABLES:
        store.read(t).createOrReplaceTempView(prefix + t)
        names.append(prefix + t)
    return names
