"""North-rule correctness gate: the Spark engine must equal the
reference-oracle simulator bit-for-bit — crawl order, URL-seen set,
pages, edges, and span documents — under the same seeds and politeness
budget (BASELINE.json north_rule / north_star)."""

from __future__ import annotations

import pytest

from web_graph_spark import fixtures, oracle
from web_graph_spark.crawler import SparkCrawler, load_web


def run_engine(spark, fixture_dir, state_dir, default_budget=None,
               max_waves=500, with_robots=False):
    from web_graph_spark.crawler import UNBOUNDED

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    robots = (spark.read.parquet(f"{fixture_dir}/robots_rules.parquet")
              if with_robots else None)
    c = SparkCrawler(spark, str(state_dir), web,
                     default_budget=default_budget or UNBOUNDED,
                     max_waves=max_waves, robots=robots)
    c.init_from_seeds(seeds)
    c.run()
    return c


def run_oracle(fixture_dir, default_budget=None, max_waves=500,
               with_robots=False):
    from web_graph_spark.operators.robots import load_rules_py

    web = fixtures.load_web_py(fixture_dir)
    seeds = fixtures.load_seeds_py(fixture_dir)
    robots = load_rules_py(fixture_dir) if with_robots else None
    return oracle.simulate_crawl(
        web, seeds, default_budget=default_budget or (1 << 60),
        max_waves=max_waves, robots=robots)


def assert_equal_states(c: SparkCrawler, o: oracle.CrawlResult):
    store = c.store
    # crawl order is (wave, seq)-lexicographic: carryover rows keep
    # their seq but run in a later wave.
    got_order = [(r["wave"], r["seq"], r["page_id"]) for r in
                 store.read("crawl_order").orderBy("wave", "seq")
                 .select("wave", "seq", "page_id").collect()]
    assert got_order == o.crawl_order

    got_seen = {r["page_id"] for r in store.read("seen").collect()}
    assert got_seen == o.seen

    got_pages = {r["page_id"]: (r["host"], r["path"], r["url"]) for r in
                 store.read("pages").collect()}
    assert got_pages == o.pages

    got_edges = {(r["from_page_id"], r["to_page_id"]): r["text"] for r in
                 store.read("edges").collect()}
    assert got_edges == o.edges

    got_docs = {r["doc_id"]: [s.asDict() for s in r["spans"]] for r in
                store.read("docs_out").collect()}
    # span-sequence equality (kind, text, media_ref, order) — input_hint
    assert set(got_docs) == set(o.docs)
    for pid, spans in o.docs.items():
        g = got_docs[pid]
        assert [(s["kind"], s["text"], s["media_ref"]) for s in g] == \
               [(s["kind"], s["text"], s["media_ref"]) for s in spans], pid


@pytest.mark.spark
def test_engine_matches_oracle_unbounded(spark, fixture_dir, tmp_path):
    c = run_engine(spark, fixture_dir, tmp_path / "state")
    o = run_oracle(fixture_dir)
    assert_equal_states(c, o)


@pytest.mark.spark
def test_engine_matches_oracle_tight_budget(spark, tmp_path):
    """Politeness budget = 3 pages/host/wave — carryover rule must agree.
    Smaller fixture: the tight budget multiplies wave count ~4×."""
    fd = tmp_path / "fix"
    fd.mkdir()
    fixtures.generate_fixtures(str(fd), seed=42, n_pages=120, n_hosts=10)
    c = run_engine(spark, str(fd), tmp_path / "state", default_budget=3)
    o = run_oracle(str(fd), default_budget=3)
    assert_equal_states(c, o)


@pytest.mark.spark
def test_n_pending_metric_matches_table_recount(spark, fixture_dir,
                                                tmp_path):
    """n_pending is counter arithmetic (next_seq − |seen| − blocked),
    not a per-wave count job (which re-ran the flog⟕̸seen anti-join a
    second time purely for the metric).  Pin it wave-by-wave against
    an independent table-level recount, robots-blocked rows included."""
    from pyspark.sql import functions as F

    c = run_engine(spark, fixture_dir, tmp_path / "s", default_budget=5,
                   max_waves=4, with_robots=True)
    store = c.store
    metric = {}
    for r in (store.read("metrics")
              .filter((F.col("scope") == "wave")
                      & (F.col("key") == "n_pending")).collect()):
        metric[r["wave"]] = int(r["value"])
    assert metric, "no waves ran"
    blocked_any = False
    for w in sorted(metric):
        m = store.manifest(w)
        n_blocked = int((m or {}).get("blocked", 0))
        blocked_any = blocked_any or n_blocked > 0
        flog = store.read("frontier_log", max_wave=w - 1)
        seen = store.read("seen", max_wave=w - 1).select("page_id")
        actual = flog.join(seen, "page_id", "left_anti").count() - n_blocked
        assert metric[w] == actual, (w, metric[w], actual)
    assert blocked_any, "fixture robots blocked nothing - weak test"


@pytest.mark.spark
def test_engine_matches_oracle_wave_cap(spark, tmp_path):
    """Global per-wave admission cap (max_wave_urls=17, unbounded host
    budget): engine ≡ oracle bit-for-bit — the cap changes which wave a
    URL runs in, and both sides must agree on every (wave, seq) pair.
    take_global's scale path runs here (no small_hint), so the
    range-partition + boundary-head machinery is what's being pinned."""
    fd = tmp_path / "fix"
    fd.mkdir()
    fixtures.generate_fixtures(str(fd), seed=7, n_pages=150, n_hosts=8)
    web = load_web(spark, str(fd))
    seeds = spark.read.parquet(f"{fd}/seeds.parquet")
    c = SparkCrawler(spark, str(tmp_path / "state"), web, max_waves=500,
                     max_wave_urls=17)
    c.init_from_seeds(seeds)
    c.run()
    o = oracle.simulate_crawl(fixtures.load_web_py(str(fd)),
                              fixtures.load_seeds_py(str(fd)),
                              max_wave_urls=17)
    assert_equal_states(c, o)
    per_wave = {r["wave"]: r["count"] for r in
                c.store.read("crawl_order").groupBy("wave").count()
                .collect()}
    assert all(n <= 17 for n in per_wave.values()), per_wave
    assert any(n == 17 for n in per_wave.values()), \
        f"cap never binding - weak test: {per_wave}"


@pytest.mark.spark
def test_wave_cap_final_state_equals_uncapped(spark, tmp_path):
    """The cap changes WHEN a URL is crawled, never WHETHER: a capped
    run converges to the identical seen / pages / edges sets as the
    uncapped oracle over the same web (more waves, same fixpoint)."""
    fd = tmp_path / "fix"
    fd.mkdir()
    fixtures.generate_fixtures(str(fd), seed=11, n_pages=120, n_hosts=6)
    web = load_web(spark, str(fd))
    seeds = spark.read.parquet(f"{fd}/seeds.parquet")
    c = SparkCrawler(spark, str(tmp_path / "state"), web, max_waves=500,
                     max_wave_urls=13)
    c.init_from_seeds(seeds)
    c.run()
    o = run_oracle(str(fd))  # uncapped
    store = c.store
    assert {r["page_id"] for r in store.read("seen").collect()} == o.seen
    got_pages = {r["page_id"]: (r["host"], r["path"], r["url"]) for r in
                 store.read("pages").collect()}
    assert got_pages == o.pages
    got_edges = {(r["from_page_id"], r["to_page_id"]): r["text"] for r in
                 store.read("edges").collect()}
    assert got_edges == o.edges
    capped_waves = store.read("crawl_order").agg(
        {"wave": "max"}).first()[0] + 1
    assert capped_waves > o.waves, "cap never deferred anything - weak"
