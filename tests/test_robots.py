"""Robots-rule evaluation (north_star: broadcast rules, Arrow UDF).

Covers: RFC 9309 longest-match decision semantics, the vectorized
batch evaluator vs the scalar twin, the Spark UDF tier over fixture
pages, and full crawl equality engine-vs-oracle with robots active.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from web_graph_spark.operators.robots import (_eval_batch, allowed_py,
                                              compile_rules, load_rules_py,
                                              with_robots_allowed)
from tests.test_crawl_equality import (assert_equal_states, run_engine,
                                       run_oracle)

RULES = compile_rules([
    dict(host="a.test", rule_type="disallow", path_prefix="/private"),
    dict(host="a.test", rule_type="allow", path_prefix="/"),
    dict(host="a.test", rule_type="allow", path_prefix="/private/open"),
    dict(host="b.test", rule_type="disallow", path_prefix="/"),
    # equal-length tie on c.test: allow must win
    dict(host="c.test", rule_type="disallow", path_prefix="/x/"),
    dict(host="c.test", rule_type="allow", path_prefix="/y/"),
    dict(host="c.test", rule_type="allow", path_prefix="/x/"),
])

TRUTH = [
    ("a.test", "/index.html", True),
    ("a.test", "/private", False),
    ("a.test", "/private/x.html", False),
    ("a.test", "/private/open/x.html", True),   # longest match overrides
    ("a.test", "/privateer", False),            # prefix, not path-segment
    ("b.test", "/anything", False),
    ("b.test", "", True),                       # no matching prefix
    ("c.test", "/x/q", True),                   # tie → allow wins
    ("c.test", "/y/q", True),
    ("unruled.test", "/private/x", True),       # no rules → allowed
]


def test_allowed_py_truth_table():
    for host, path, want in TRUTH:
        assert allowed_py(RULES, host, path) is want, (host, path)


def test_eval_batch_matches_scalar():
    rng = random.Random(7)
    hosts, paths = [], []
    pool = ["a.test", "b.test", "c.test", "unruled.test"]
    segs = ["/", "/private", "/private/open", "/x/", "/y/", "/news/", ""]
    for _ in range(500):
        hosts.append(rng.choice(pool))
        paths.append(rng.choice(segs) + rng.choice(["p1.html", "q", ""]))
    got = _eval_batch(RULES, pd.Series(hosts), pd.Series(paths))
    want = [allowed_py(RULES, h, p) for h, p in zip(hosts, paths)]
    assert got.tolist() == want


@pytest.mark.spark
def test_spark_udf_matches_scalar(spark, fixture_dir):
    rules_df = spark.read.parquet(f"{fixture_dir}/robots_rules.parquet")
    pages = spark.read.parquet(f"{fixture_dir}/page_urls.parquet")
    got = {r["page_id"]: r["robots_allowed"] for r in
           with_robots_allowed(spark, pages, rules_df).collect()}
    rules = load_rules_py(fixture_dir)
    rows = pages.select("page_id", "host", "path").collect()
    assert got == {r["page_id"]: allowed_py(rules, r["host"], r["path"])
                   for r in rows}
    # the fixture must actually exercise both verdicts + the override
    verdicts = set(got.values())
    assert verdicts == {True, False}


@pytest.mark.spark
def test_engine_matches_oracle_with_robots(spark, fixture_dir, tmp_path):
    c = run_engine(spark, fixture_dir, tmp_path / "state", with_robots=True)
    o = run_oracle(fixture_dir, with_robots=True)
    assert o.seen - {pid for (_, _, pid) in o.crawl_order}, \
        "robots blocked nothing — fixture regression"
    assert_equal_states(c, o)


@pytest.mark.spark
def test_budgets_from_crawl_delay(spark):
    """delay d sec + wave cadence W sec → budget floor(W/d), most
    conservative rule per host wins, no positive delay → no row;
    delay > W → budget 1 AND wave_period ceil(d/W) (fetched only every
    period-th wave, so the effective rate stays ≤ 1/d)."""
    from web_graph_spark.operators.robots import budgets_from_crawl_delay

    rules = spark.createDataFrame(
        [("h1.test", "disallow", "/a", 2.0),
         ("h1.test", "allow", "/b", 5.0),     # max(2,5)=5 wins
         ("h2.test", "disallow", "/", 0.5),
         ("h3.test", "allow", "/", 0.0),      # no delay → default budget
         ("h4.test", "allow", "/", 120.0)],   # delay > wave → budget 1,
        "host string, rule_type string, path_prefix string, "  # period 2
        "crawl_delay double")
    got = {r["host"]: (r["max_pages_per_wave"], r["wave_period"]) for r in
           budgets_from_crawl_delay(rules, wave_seconds=60.0).collect()}
    assert got == {"h1.test": (12, 1), "h2.test": (120, 1),
                   "h4.test": (1, 2)}


@pytest.mark.spark
def test_wave_period_gate_defers_long_delay_hosts(spark, fixture_dir,
                                                  tmp_path):
    """A host with crawl_delay > wave_seconds is scheduled only on
    waves matching its hash-stable phase — at most ceil(waves/period)
    fetches over the crawl — and deferred-only waves do NOT terminate
    the loop (run() keeps iterating until the frontier drains)."""
    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    hosts = web.select(
        F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("host")
    ).filter("host <> ''").distinct()
    # every host: 150s delay at a 60s cadence → budget 1, period 3
    rules = hosts.select(
        "host", F.lit("allow").alias("rule_type"),
        F.lit("/").alias("path_prefix"),
        F.lit(150.0).alias("crawl_delay"))
    c = SparkCrawler(spark, str(tmp_path / "s"), web, max_waves=9,
                     robots=rules, wave_seconds=60.0)
    c.init_from_seeds(seeds)
    c.run()
    order = c.store.read("crawl_order")
    pages = (order.join(
        c.store.read("pages").select("page_id", "host"), "page_id")
        # discovered offsite hosts carry no robots rule → ungated by
        # design (default politeness); assert only over ruled hosts
        .join(rules.select("host"), "host", "left_semi"))
    per = (pages.groupBy("host").agg(
        F.countDistinct("wave").alias("waves_hit"),
        (F.max("wave") - F.min("wave")).alias("span"),
        F.count("*").alias("n")).collect())
    assert per, "nothing crawled"
    for r in per:
        # a host hit on k distinct waves must span ≥ (k-1)·period waves
        assert r["span"] >= (r["waves_hit"] - 1) * 3, r
        # budget 1 → one fetch per eligible wave
        assert r["n"] == r["waves_hit"], r


@pytest.mark.spark
def test_crawler_derived_budget_equals_explicit(spark, fixture_dir,
                                                tmp_path):
    """SparkCrawler(robots=…, wave_seconds=W) must crawl identically to
    passing the derived dim by hand — politeness as a DERIVED dimension
    of the robots relation, parameterized by crawl_delay."""
    from web_graph_spark.crawler import SparkCrawler, load_web
    from web_graph_spark.operators.robots import budgets_from_crawl_delay

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    # give every host a real, host-dependent delay (fixture delays are
    # uniform 1.0 — too permissive to constrain a 3-wave crawl)
    hosts = web.select(
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host")
    ).filter("host <> ''").distinct()
    rules = hosts.select(
        "host", F.lit("allow").alias("rule_type"),
        F.lit("/").alias("path_prefix"),
        (F.pmod(F.xxhash64("host"), F.lit(4)) * 10 + 10)
        .cast("double").alias("crawl_delay"))

    def run(d, **kw):
        c = SparkCrawler(spark, str(d), web, max_waves=3, **kw)
        c.init_from_seeds(seeds)
        c.run()
        return c.store

    a = run(tmp_path / "derived", robots=rules, wave_seconds=60.0)
    b = run(tmp_path / "explicit",
            budgets=budgets_from_crawl_delay(rules, 60.0))
    for t in ("crawl_order", "pages", "seen"):
        ra = sorted(map(tuple, a.read(t).drop("wave").collect()))
        rb = sorted(map(tuple, b.read(t).drop("wave").collect()))
        assert ra == rb, t
    # the budget must actually bind somewhere (hosts with delay 40s →
    # 1-2 pages/wave)
    per_host_wave = (a.read("crawl_order")
                     .join(a.read("pages").select("page_id", "host"),
                           "page_id")
                     .groupBy("wave", "host").count())
    assert per_host_wave.agg(F.max("count")).first()[0] <= 6


@pytest.mark.spark
def test_pace_waves_enforces_cadence(spark, fixture_dir, tmp_path):
    """pace_waves=True makes run() enforce the declared wave cadence
    in wall-clock (the derived budgets/wave_period are rates per
    wave_seconds, so un-paced fast waves over-fetch); crawl results
    must be identical to the un-paced run."""
    import time

    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")

    def run(d, **kw):
        c = SparkCrawler(spark, str(d), web, max_waves=3,
                         default_budget=5, **kw)
        c.init_from_seeds(seeds)
        t0 = time.monotonic()
        waves = c.run()
        return c, waves, time.monotonic() - t0

    a, waves_a, wall_a = run(tmp_path / "paced", wave_seconds=3.0,
                             pace_waves=True)
    b, waves_b, _ = run(tmp_path / "plain")
    assert waves_a == waves_b
    # each wave slept out its remainder of the 3s cadence
    assert wall_a >= waves_a * 3.0, (wall_a, waves_a)
    for t in ("crawl_order", "pages", "seen"):
        ra = sorted(map(tuple, a.store.read(t).drop("wave").collect()))
        rb = sorted(map(tuple, b.store.read(t).drop("wave").collect()))
        assert ra == rb, t


@pytest.mark.spark
def test_robots_wave_scope_equals_full_and_never_overcollects(
        spark, fixture_dir, tmp_path):
    """Scale-safe robots evaluation (VERDICT r3 #1): robots_scope
    ='wave' prunes the rules relation to each wave's distinct pending
    hosts before any driver collect/compile.  Crawl state must be
    bit-identical to the full-broadcast path, and the compiled slice
    must never contain a host absent from that wave's pending set."""
    from pyspark.sql import functions as F

    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    rules = spark.read.parquet(f"{fixture_dir}/robots_rules.parquet")
    # pad the relation with rules for hosts the crawl never touches —
    # the wave path must prune them out before the collect
    ghost = spark.range(500).select(
        F.concat(F.lit("ghost-"), F.col("id"), F.lit(".test")).alias("host"),
        F.lit("disallow").alias("rule_type"),
        F.lit("/").alias("path_prefix"),
        F.lit(0.0).alias("crawl_delay"))
    padded = rules.unionByName(ghost)

    def crawl(d, scope):
        c = SparkCrawler(spark, str(d), web, max_waves=3,
                         default_budget=5, robots=padded,
                         robots_scope=scope)
        if scope == "wave":
            assert c._robots is None        # nothing compiled at init
            orig = c._wave_rules
            collected = []

            def spy(pending):
                r = orig(pending)
                hosts = {row["host"] for row in
                         pending.select("host").distinct().collect()}
                collected.append((set(r), hosts))
                return r
            c._wave_rules = spy
            c._spy = collected
        c.init_from_seeds(seeds)
        c.run()
        return c

    a = crawl(tmp_path / "full", "full")
    b = crawl(tmp_path / "wave", "wave")
    for t in ("crawl_order", "pages", "seen", "edges", "frontier_log"):
        ra = sorted(map(tuple, a.store.read(t).drop("wave").collect()))
        rb = sorted(map(tuple, b.store.read(t).drop("wave").collect()))
        assert ra == rb, t
    assert b._spy, "wave path never ran"
    for rule_hosts, wave_hosts in b._spy:
        assert rule_hosts <= wave_hosts      # no over-collection
        assert not any(h.startswith("ghost-") for h in rule_hosts)


@pytest.mark.spark
def test_robots_rules_lru_cache(spark, fixture_dir, tmp_path):
    """Cross-wave compiled-rules LRU: crawls with the cache on and off
    are bit-identical; a wave whose hosts are all cached never touches
    the rules relation; the cache honours its size bound and serves
    evicted hosts correctly by re-collecting them."""
    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    rules = spark.read.parquet(f"{fixture_dir}/robots_rules.parquet")

    def crawl(d, **kw):
        c = SparkCrawler(spark, str(d), web, max_waves=3,
                         default_budget=5, robots=rules,
                         robots_scope="wave", **kw)
        c.init_from_seeds(seeds)
        c.run()
        return c

    a = crawl(tmp_path / "cached")                      # LRU default-on
    b = crawl(tmp_path / "uncached", robots_cache_hosts=0)
    for t in ("crawl_order", "pages", "seen", "edges", "frontier_log"):
        ra = sorted(map(tuple, a.store.read(t).drop("wave").collect()))
        rb = sorted(map(tuple, b.store.read(t).drop("wave").collect()))
        assert ra == rb, t
    assert a._rules_cache and not b._rules_cache

    hosts = [r[0] for r in rules.select("host").distinct().collect()]
    ruled, extra = hosts[0], hosts[1]
    c = SparkCrawler(spark, str(tmp_path / "probe"), web, robots=rules,
                     robots_scope="wave")
    pend = spark.createDataFrame([(ruled, "/x")], "host string, path string")
    first = c._wave_rules(pend)
    assert ruled in first
    c._robots_df = None          # poison: any touch now raises
    assert c._wave_rules(pend) == first     # pure cache hit
    with pytest.raises(AttributeError):     # a MISS must still touch it
        c._wave_rules(spark.createDataFrame(
            [(extra, "/x")], "host string, path string"))

    d = SparkCrawler(spark, str(tmp_path / "lru"), web, robots=rules,
                     robots_scope="wave", robots_cache_hosts=2)
    for h in hosts[:3]:
        d._wave_rules(spark.createDataFrame(
            [(h, "/x")], "host string, path string"))
    assert len(d._rules_cache) == 2
    assert hosts[0] not in d._rules_cache   # LRU evicted the oldest
    # the evicted host is re-collected, not wrongly served as ruleless:
    # result must equal an uncached compile of the same slice
    p0 = spark.createDataFrame([(hosts[0], "/x")], "host string, path string")
    again = d._wave_rules(p0)
    d2 = SparkCrawler(spark, str(tmp_path / "ref"), web, robots=rules,
                      robots_scope="wave", robots_cache_hosts=0)
    assert again == d2._wave_rules(p0)


@pytest.mark.spark
def test_robots_scope_auto_picks_by_rule_count(spark, fixture_dir,
                                               tmp_path):
    """auto = full broadcast for small rule dims (zero per-wave jobs),
    wave pruning past the threshold."""
    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    rules = spark.read.parquet(f"{fixture_dir}/robots_rules.parquet")
    small = SparkCrawler(spark, str(tmp_path / "a"), web, robots=rules)
    assert small.robots_scope == "full" and small._robots is not None
    try:
        SparkCrawler.ROBOTS_FULL_BROADCAST_MAX = 1
        big = SparkCrawler(spark, str(tmp_path / "b"), web, robots=rules)
        assert big.robots_scope == "wave" and big._robots is None
    finally:
        SparkCrawler.ROBOTS_FULL_BROADCAST_MAX = 200_000


@pytest.mark.spark
def test_robots_cogroup_scope_equals_full(spark, fixture_dir, tmp_path):
    """Third tier (robots_scope='cogroup'): host-cogrouped evaluation
    with zero driver materialization must crawl bit-identically to the
    full-broadcast path."""
    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    rules = spark.read.parquet(f"{fixture_dir}/robots_rules.parquet")

    def crawl(d, scope):
        c = SparkCrawler(spark, str(d), web, max_waves=3,
                         default_budget=5, robots=rules,
                         robots_scope=scope)
        c.init_from_seeds(seeds)
        c.run()
        return c

    a = crawl(tmp_path / "full", "full")
    b = crawl(tmp_path / "cg", "cogroup")
    assert b._robots is None                 # nothing compiled driver-side
    assert sum(m.n_blocked for m in b.metrics) > 0
    for t in ("crawl_order", "pages", "seen", "edges", "frontier_log"):
        ra = sorted(map(tuple, a.store.read(t).drop("wave").collect()))
        rb = sorted(map(tuple, b.store.read(t).drop("wave").collect()))
        assert ra == rb, t


ROBOTS_BODY = """# demo
User-agent: *
Disallow: /tmp
Allow: /tmp/ok
Crawl-delay: 3

User-agent: OtherBot
Disallow: /

User-agent: Spark-Crawler
User-agent: friendbot
Disallow: /secret
Crawl-delay: 9
junk line without a colon directive
Disallow:
"""


@pytest.mark.spark
def test_parse_robots_txt_groups_and_precedence(spark):
    """Specific-agent group shadows '*' (RFC 9309 §2.2.1); the
    OtherBot group never leaks; consecutive ua lines share one group;
    empty Disallow and junk lines are ignored; case-insensitive agent
    match; delay folds to the applicable groups' max."""
    from web_graph_spark.operators.robots import parse_robots_txt

    df = spark.createDataFrame([("h1", ROBOTS_BODY)],
                               "host string, robots_txt string")
    spec = {(r["rule_type"], r["path_prefix"], r["crawl_delay"])
            for r in parse_robots_txt(df, agent="spark-crawler").collect()}
    assert spec == {("disallow", "/secret", 9)}
    star = {(r["rule_type"], r["path_prefix"], r["crawl_delay"])
            for r in parse_robots_txt(df, agent="unknownbot").collect()}
    assert star == {("disallow", "/tmp", 3), ("allow", "/tmp/ok", 3)}


@pytest.mark.spark
def test_parse_robots_txt_feeds_compile_and_budgets(spark):
    """End-to-end raw text → rules → verdicts + budget dim, including
    a delay-only host whose carrier row must not poison compile_rules
    (empty-prefix rows match nothing)."""
    from web_graph_spark.operators.robots import (budgets_from_crawl_delay,
                                                  parse_robots_txt)

    df = spark.createDataFrame(
        [("h1", ROBOTS_BODY),
         ("h2", "User-agent: *\nCrawl-delay: 5")],   # delay, no rules
        "host string, robots_txt string")
    out = parse_robots_txt(df, agent="spark-crawler")
    rows = out.collect()
    h2 = [r for r in rows if r["host"] == "h2"]
    assert [(r["rule_type"], r["path_prefix"], r["crawl_delay"])
            for r in h2] == [("crawl-delay", None, 5)]
    rules = compile_rules(r.asDict() for r in rows)
    assert "h2" not in rules                      # carrier row skipped
    assert allowed_py(rules, "h1", "/secret/x") is False
    assert allowed_py(rules, "h1", "/tmp") is True   # '*' group shadowed
    bud = {r["host"]: (r["max_pages_per_wave"], r["wave_period"])
           for r in budgets_from_crawl_delay(out, 10.0).collect()}
    assert bud == {"h1": (1, 1), "h2": (2, 1)}


@pytest.mark.spark
def test_sitemap_directives_case_and_comments(spark):
    """Sitemap: is case-insensitive, group-independent, repeatable;
    comments strip; non-directive lines are ignored."""
    from web_graph_spark.operators.sitemap import sitemap_directives

    body = ("User-agent: *\n"
            "Disallow: /x\n"
            "Sitemap: https://a.test/s1.xml  # primary\n"
            "SITEMAP: https://a.test/s2.xml\n"
            "sitemapish: https://a.test/nope.xml\n"
            "sitemap : https://a.test/s3.xml")
    df = spark.createDataFrame([("a.test", body)],
                               "host string, robots_txt string")
    got = [(r["pos"], r["sitemap_url"])
           for r in sitemap_directives(df).orderBy("pos").collect()]
    assert got == [(2, "https://a.test/s1.xml"),
                   (3, "https://a.test/s2.xml"),
                   (5, "https://a.test/s3.xml")]


@pytest.mark.spark
def test_sitemap_locs_urlset_index_and_entities(spark):
    """urlset vs sitemapindex classification, document order, loc
    trimming, and XML entity unescape."""
    from web_graph_spark.operators.sitemap import sitemap_locs

    urlset = ('<?xml version="1.0"?><urlset>'
              '<url><loc> https://a.test/p?x=1&amp;y=2 </loc></url>'
              '<url><loc>https://a.test/q&lt;3&gt;</loc></url></urlset>')
    index = ('<?xml version="1.0"?><sitemapindex>'
             '<sitemap><loc>https://b.test/child.xml</loc></sitemap>'
             '</sitemapindex>')
    df = spark.createDataFrame([("a.test", urlset), ("b.test", index)],
                               "host string, xml string")
    got = {(r["host"], r["pos"]): (r["loc"], r["is_index"])
           for r in sitemap_locs(df).collect()}
    assert got[("a.test", 0)] == ("https://a.test/p?x=1&y=2", False)
    assert got[("a.test", 1)] == ("https://a.test/q<3>", False)
    assert got[("b.test", 0)] == ("https://b.test/child.xml", True)


@pytest.mark.spark
def test_sitemap_urls_protocol_semantics(spark):
    """Sitemap discovery: UA-group-independent (a declaration inside
    a foreign group still surfaces), case-insensitive key, absolute
    URLs only, duplicates deduped, comments stripped."""
    from web_graph_spark.operators.robots import sitemap_urls

    body = "\n".join([
        "User-agent: otherbot",
        "Disallow: /",
        "Sitemap: https://a.test/s1.xml   # trailing comment",
        "SITEMAP: https://a.test/s2.xml",
        "sitemap: https://a.test/s2.xml",      # dup after casefold
        "Sitemap: /relative.xml",              # dropped
        "Sitemap:",                            # empty -> dropped
        "Sitemaps: https://a.test/wrongkey.xml",
    ])
    df = spark.createDataFrame([("a.test", body)],
                               "host string, robots_txt string")
    got = sorted(r.sitemap_url for r in sitemap_urls(df).collect())
    assert got == ["https://a.test/s1.xml", "https://a.test/s2.xml"]


def test_sitemap_coverage_hand_fixture(spark):
    """Hand-checkable coverage algebra: overlap, phantoms, orphans,
    duplicate declarations absorbed, a declared-only host (0 crawled,
    coverage 0), a crawled-only host (NULL coverage — no sitemap to
    cover), and the floor division pin (2/3 -> 66)."""
    from web_graph_spark.operators.sitemap import sitemap_coverage

    declared = spark.createDataFrame(
        [("a", "u1"), ("a", "u1"),           # duplicate declaration
         ("a", "u2"), ("a", "u9"),           # u9 = phantom
         ("b", "x1"), ("b", "x2"), ("b", "x3"),  # x3 phantom
         ("c", "only-declared")],            # host never crawled
        "host string, url string")
    crawled = spark.createDataFrame(
        [("a", "u1"), ("a", "u2"), ("a", "u3"),  # u3 = orphan
         ("b", "x1"), ("b", "x2"),
         ("d", "y1")],                       # host with no sitemap
        "host string, url string")
    out = {r.host: r for r in
           sitemap_coverage(declared, crawled).collect()}

    a = out["a"]
    assert (a.n_declared, a.n_crawled, a.n_both) == (3, 3, 2)
    assert (a.n_phantom, a.n_orphan, a.coverage_pct) == (1, 1, 66)
    b = out["b"]
    assert (b.n_declared, b.n_both, b.coverage_pct) == (3, 2, 66)
    c = out["c"]
    assert (c.n_declared, c.n_crawled, c.coverage_pct) == (1, 0, 0)
    d = out["d"]
    assert (d.n_declared, d.n_orphan) == (0, 1)
    assert d.coverage_pct is None


def test_robots_wildcard_eval_precedence(spark):
    """RFC 9309 §2.2.3 pins: longest pattern wins regardless of rule
    order; equal length -> allow; bare * blocks what no longer allow
    rescues; trailing $ anchors while mid-pattern $ is literal; regex
    metacharacters in patterns stay literal; no-rule hosts default
    allowed."""
    from web_graph_spark.operators.robots import robots_wildcard_eval

    rules = spark.createDataFrame(
        [("a", "disallow", "/d/*7.html$"),   # len 11
         ("a", "allow", "/d/1*"),            # len 5
         ("b", "allow", "/x*"),              # len 3
         ("b", "disallow", "*"),             # len 1
         ("c", "allow", "/t$"),              # anchored
         ("c", "disallow", "/t*"),           # len 3 beats len 3 tie?
         ("d", "disallow", "/a+b?.c$"),      # metachars literal
         ("e", "disallow", "/x$y*")],        # mid-$ literal
        "host string, rule_type string, pattern string")
    pending = spark.createDataFrame(
        [(1, "a", "/d/17.html"),   # both match: disallow longer
         (2, "a", "/d/18.html"),   # only allow matches
         (3, "b", "/x/page"),      # allow len 3 > * len 1
         (4, "b", "/y/page"),      # only * matches -> blocked
         (5, "c", "/t"),           # tie len 3: allow ($ counts) wins
         (6, "c", "/tmp"),         # anchored allow misses -> disallow
         (7, "d", "/a+b?.c"),      # literal metachars match
         (8, "d", "/axb.c"),       # regex reading would match; literal not
         (9, "e", "/x$y/z"),       # mid-$ literal matches
         (10, "zz", "/anything")], # no rules -> allowed
        "doc_id long, host string, path string")
    out = {r.doc_id: r for r in
           robots_wildcard_eval(pending, rules, ["doc_id"]).collect()}

    assert not out[1].allowed and out[1].m_pattern == "/d/*7.html$"
    assert out[2].allowed and out[2].m_type == "allow"
    assert out[3].allowed and out[3].m_pattern == "/x*"
    assert not out[4].allowed and out[4].m_pattern == "*"
    assert out[5].allowed and out[5].m_pattern == "/t$"
    assert not out[6].allowed and out[6].m_pattern == "/t*"
    assert not out[7].allowed
    assert out[8].allowed and out[8].m_pattern is None
    assert not out[9].allowed and out[9].m_pattern == "/x$y*"
    assert out[10].allowed and out[10].m_type is None


def test_robots_transition_labels(spark):
    """The four-way fold over two snapshots: tightening yields purge,
    loosening yields opened, unchanged verdicts keep/block; rule-less
    hosts stay kept (allowed both sides)."""
    from web_graph_spark.operators.robots import robots_transition

    v1 = spark.createDataFrame(
        [("a", "disallow", "/old*"), ("b", "disallow", "/b*")],
        "host string, rule_type string, pattern string")
    v2 = spark.createDataFrame(
        [("a", "disallow", "/old*"), ("a", "disallow", "/new*"),
         ("b", "disallow", "/b*"), ("b", "allow", "/b/ok$")],
        "host string, rule_type string, pattern string")
    pending = spark.createDataFrame(
        [(1, "a", "/old/p"),   # blocked both -> blocked
         (2, "a", "/new/p"),   # allowed -> blocked = purge
         (3, "a", "/other"),   # allowed both -> kept
         (4, "b", "/b/ok"),    # blocked -> allowed = opened
         (5, "zz", "/x")],     # no rules either side -> kept
        "doc_id long, host string, path string")
    out = {r.doc_id: r.transition for r in
           robots_transition(pending, v1, v2, ["doc_id"]).collect()}
    assert out == {1: "blocked", 2: "purge", 3: "kept",
                   4: "opened", 5: "kept"}
