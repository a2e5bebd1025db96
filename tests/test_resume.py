"""Checkpoint/resume (T5, north_rule): a crawl killed after wave k and
resumed must reach exactly the final state of an uninterrupted run —
manifests gate visibility, uncommitted partitions are swept on open,
and re-running a finished crawl is a no-op.
"""

from __future__ import annotations

import os
import shutil

import pytest

from web_graph_spark import fixtures
from web_graph_spark.crawler import SparkCrawler, load_web
from web_graph_spark.storage import WaveStore
from tests.test_crawl_equality import run_oracle, assert_equal_states


@pytest.fixture(scope="module")
def small_fix(tmp_path_factory):
    d = tmp_path_factory.mktemp("resumefix")
    fixtures.generate_fixtures(str(d), seed=42, n_pages=70, n_hosts=8)
    return str(d)


def _crawler(spark, small_fix, state_dir, max_waves=500):
    web = load_web(spark, small_fix)
    seeds = spark.read.parquet(f"{small_fix}/seeds.parquet")
    c = SparkCrawler(spark, str(state_dir), web, default_budget=3,
                     max_waves=max_waves)
    c.init_from_seeds(seeds)
    return c


@pytest.mark.spark
def test_kill_and_resume_equals_oracle(spark, small_fix, tmp_path):
    state = tmp_path / "state"

    # phase 1: run only 2 waves, then "die"
    c1 = _crawler(spark, small_fix, state, max_waves=2)
    c1.run()
    assert c1.store.committed_wave() == 1

    # simulate a crash mid-wave-2: leftover partition dirs with NO
    # manifest must be swept when the store reopens
    for table in ("seen", "frontier_log"):
        src = os.path.join(state, table, "wave=1")
        junk = os.path.join(state, table, "wave=2")
        shutil.copytree(src, junk)
    assert os.path.isdir(os.path.join(state, "seen", "wave=2"))

    # phase 2: fresh crawler over the same state dir resumes at wave 2
    c2 = _crawler(spark, small_fix, state, max_waves=500)
    assert not os.path.isdir(os.path.join(state, "seen", "wave=2")) or \
        c2.store.committed_wave() >= 2  # swept before any new commit
    c2.run()

    o = run_oracle(small_fix, default_budget=3)
    assert_equal_states(c2, o)


@pytest.mark.spark
def test_rerun_finished_crawl_is_noop(spark, small_fix, tmp_path):
    state = tmp_path / "state"
    c1 = _crawler(spark, small_fix, state)
    waves = c1.run()

    c2 = _crawler(spark, small_fix, state)      # init_from_seeds: no-op
    assert c2.store.committed_wave() == c1.store.committed_wave()
    c2.run()
    assert c2.store.committed_wave() <= waves   # at most the empty probe
    o = run_oracle(small_fix, default_budget=3)
    assert_equal_states(c2, o)


@pytest.mark.spark
def test_per_partition_metrics_written(spark, small_fix, tmp_path):
    c = _crawler(spark, small_fix, tmp_path / "state", max_waves=1)
    c.run()
    met = c.store.read("metrics")
    part = met.filter(met["scope"] == "partition").collect()
    keys = {r["key"] for r in part}
    assert {"fetch_urls_scheduled", "fetch_links_extracted",
            "dedupe_enqueued"} <= keys
    assert all(r["partition_id"] >= 0 for r in part)
    # totals must reconcile with the wave-scope rows (lineage-auditable)
    wave_rows = {r["key"]: r["value"] for r in
                 met.filter((met["scope"] == "wave")
                            & (met["wave"] == 0)).collect()}
    got = sum(r["value"] for r in part
              if r["key"] == "fetch_urls_scheduled" and r["wave"] == 0)
    assert got == wave_rows["n_scheduled"]


@pytest.mark.spark
def test_kill_and_resume_bloom_mode(spark, small_fix, tmp_path):
    """Resume under the bloom seen-tier: kill after wave 1, resume with
    seen_mode='bloom' — final state equals the oracle (the bloom is
    rebuilt from the seen table, never from volatile state)."""
    state = tmp_path / "state"
    web = load_web(spark, small_fix)
    seeds = spark.read.parquet(f"{small_fix}/seeds.parquet")

    c1 = SparkCrawler(spark, str(state), web, default_budget=3,
                      max_waves=2, seen_mode="bloom")
    c1.init_from_seeds(seeds)
    c1.run()
    assert c1.store.committed_wave() == 1

    c2 = SparkCrawler(spark, str(state), web, default_budget=3,
                      max_waves=500, seen_mode="bloom")
    c2.init_from_seeds(seeds)
    c2.run()
    o = run_oracle(small_fix, default_budget=3)
    assert_equal_states(c2, o)


@pytest.mark.spark
def test_injected_store_seam(spark, tmp_path):
    """SparkCrawler(store=...) uses the injected store verbatim — the
    seam the Iceberg backend plugs into; results must equal the
    default-constructed store's."""
    from pyspark.sql import functions as F

    from web_graph_spark.benchjobs import synth_consistent_web
    from web_graph_spark.crawler import SparkCrawler
    from web_graph_spark.storage import WaveStore

    web = synth_consistent_web(spark, 1000)
    num = F.regexp_extract("url", r"/d/([0-9]+)\.html", 1).cast("long")
    seeds = (web.withColumn("__n", num).filter(F.col("__n") < 10)
             .select(F.col("__n").alias("seq"), "url"))
    mine = WaveStore(spark, str(tmp_path / "injected"))
    a = SparkCrawler(spark, "(ignored)", web, max_waves=2,
                     default_budget=5, store=mine)
    assert a.store is mine
    a.init_from_seeds(seeds)
    a.run()
    b = SparkCrawler(spark, str(tmp_path / "default"), web, max_waves=2,
                     default_budget=5)
    b.init_from_seeds(seeds)
    b.run()
    for t in ("crawl_order", "pages", "seen", "edges"):
        ra = sorted(map(tuple, a.store.read(t).collect()))
        rb = sorted(map(tuple, b.store.read(t).collect()))
        assert ra and ra == rb, t


@pytest.mark.spark
def test_metrics_backfill_after_crash_window(spark, small_fix, tmp_path):
    """The metrics table write is async (post-commit): simulate a crash
    that lost one committed wave's metrics partition and check resume
    re-derives the wave-scope counter rows from the manifest, keeping
    the read API's no-scan counts exact."""
    import shutil

    from web_graph_spark.api import LinkApi

    state = tmp_path / "state"
    c1 = _crawler(spark, small_fix, state, max_waves=3)
    c1.run()
    lost = c1.store.committed_wave()
    man = c1.store.manifest(lost)
    assert man["scheduled"] > 0 and "pages_new" in man
    shutil.rmtree(state / "metrics" / f"wave={lost}")

    c2 = _crawler(spark, small_fix, state, max_waves=3)  # no new waves
    c2.run()
    met = c2.store.read("metrics")
    back = {r["key"]: r["value"] for r in
            met.filter((met["scope"] == "wave")
                       & (met["wave"] == lost)).collect()}
    assert back["n_scheduled"] == man["scheduled"]
    assert back["n_pages_new"] == man["pages_new"]
    api = LinkApi.from_store(c2.store)
    assert api.count_pages() == c2.store.read("pages").count()
    assert api.count_links() == c2.store.read("edges").count()


def test_revalidation_savings_hand(spark):
    """First fetches never save; unchanged revisits save their
    bytes; a change forces a full body; ppm algebra exact."""
    from web_graph_spark.operators.recrawl import revalidation_savings

    visits = spark.createDataFrame(
        # page 1 on host a: digests d,d,e over 3 waves
        [("a", 1, 0, "d", 100), ("a", 1, 1, "d", 100),
         ("a", 1, 2, "e", 100),
         # page 2 on host a: single visit
         ("a", 2, 0, "x", 50),
         # page 3 on host b: never changes, 3 visits
         ("b", 3, 0, "z", 10), ("b", 3, 1, "z", 10),
         ("b", 3, 2, "z", 10)],
        "host string, page_id long, wave int, digest string, "
        "n_bytes long")
    out = {r.host: r for r in revalidation_savings(visits).collect()}

    a = out["a"]
    # wave-1 revisit of page 1 is the only 304-able fetch on a
    assert (a.n_fetches, a.n_revalidatable) == (4, 1)
    assert (a.bytes_total, a.bytes_saved) == (350, 100)
    assert a.saved_ppm == 10**6 * 100 // 350
    b = out["b"]
    assert (b.n_revalidatable, b.bytes_saved) == (2, 20)
    assert b.saved_ppm == 10**6 * 20 // 30
