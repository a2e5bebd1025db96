"""Bucketed state-table layout: equality with the plain layout, the
zero-Exchange anti-join plan it exists for, and fresh-session resume
(catalog re-registration over existing files)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_graph_spark.plans import physical_plan

TABLES = ("crawl_order", "pages", "edges", "seen", "frontier_log")


def _run(spark, fixture_dir, d, max_waves, **kw):
    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    c = SparkCrawler(spark, d, web, max_waves=max_waves, **kw)
    c.init_from_seeds(seeds)
    c.run()
    return c


def _rows(store, t):
    return sorted(map(tuple, store.read(t).drop("wave").collect()))


@pytest.mark.spark
def test_bucketed_crawl_equals_plain(spark, fixture_dir, tmp_path):
    """bucketed_state is a pure physical layout change: crawl_order,
    pages, edges, seen and frontier_log are bit-identical."""
    a = _run(spark, fixture_dir, str(tmp_path / "plain"), 3)
    b = _run(spark, fixture_dir, str(tmp_path / "bucket"), 3,
             bucketed_state=True, n_buckets=8)
    for t in TABLES:
        assert _rows(a.store, t) == _rows(b.store, t), t


@pytest.mark.spark
def test_bucketed_pending_antijoin_no_exchange(spark, fixture_dir,
                                               tmp_path):
    """The wave hot loop's pending = frontier_log ⟕̸ seen over the
    bucketed layout must be a SortMergeJoin with ZERO Exchange — the
    per-wave shuffle no longer scales with |seen| (the 4→16-core
    ceiling identified in BENCH/BASELINE.md)."""
    c = _run(spark, fixture_dir, str(tmp_path / "b"), 2,
             bucketed_state=True, n_buckets=8)
    flog = c.store.read("frontier_log")
    seen = c.store.read("seen").select("page_id")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pending = flog.join(seen, "page_id", "left_anti")
        plan = physical_plan(pending)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # edges anti-join: stored side likewise exchange-free — the
        # bucketed scan feeds the SMJ directly; only the computed probe
        # side aligns via one Exchange (formatted plans list each node
        # twice: tree + detail).
        prev_edges = c.store.read("edges").select("edge_id")
        probe = (c.store.read("pages")
                 .select(F.concat("page_id", "page_id").alias("edge_id")))
        ep = physical_plan(probe.join(prev_edges, "edge_id", "left_anti"))
        assert "Bucketed: true" in ep, ep
        assert ep.count("Exchange") <= 2, ep
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.mark.spark
def test_bucketed_resume_fresh_session(spark, fixture_dir, tmp_path):
    """Resume over bucketed state after the catalog entries vanish (a
    new session): WaveStore re-creates the tables over the existing
    files (CREATE TABLE + MSCK) and the finished crawl matches an
    uninterrupted run."""
    d = str(tmp_path / "resume")
    c1 = _run(spark, fixture_dir, d, 2, bucketed_state=True, n_buckets=8)
    # simulate a fresh session: drop every catalog entry (files remain)
    for t in TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {c1.store._table_name(t)}")
    c2 = _run(spark, fixture_dir, d, 4, bucketed_state=True, n_buckets=8)
    ref = _run(spark, fixture_dir, str(tmp_path / "ref"), 4)
    for t in TABLES:
        assert _rows(c2.store, t) == _rows(ref.store, t), t
