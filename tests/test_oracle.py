"""Sanity checks on the fixture generator + pure-Python oracle."""

from __future__ import annotations

from web_graph_spark import fixtures, oracle


def test_fixture_deterministic(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(); b.mkdir()
    ia = fixtures.generate_fixtures(str(a), seed=42)
    ib = fixtures.generate_fixtures(str(b), seed=42)
    assert ia == ib
    wa, wb = fixtures.load_web_py(str(a)), fixtures.load_web_py(str(b))
    assert wa == wb
    assert ia["n_pages"] > 400


def test_oracle_crawl_shape(fixture_dir):
    web = fixtures.load_web_py(fixture_dir)
    seeds = fixtures.load_seeds_py(fixture_dir)
    res = oracle.simulate_crawl(web, seeds)
    # seeds: 12 rows, 1 inadmissible, 1 duplicate → 10 wave-0 pages
    wave0 = [t for t in res.crawl_order if t[0] == 0]
    assert len(wave0) == 10
    # BFS reaches a meaningful fraction of the web + offsite dead pages
    assert len(res.seen) > 300
    assert len(res.edges) > 500
    assert res.waves >= 3
    # crawl order: seq strictly increasing within and across waves
    seqs = [s for (_, s, _) in res.crawl_order]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)
    # every crawled page has a page row; edges reference known pages
    order_ids = {pid for (_, _, pid) in res.crawl_order}
    assert order_ids == res.seen
    assert order_ids <= set(res.pages)
    for (f, t) in res.edges:
        assert f in res.pages and t in res.pages


def test_oracle_budget_carryover(fixture_dir):
    web = fixtures.load_web_py(fixture_dir)
    seeds = fixtures.load_seeds_py(fixture_dir)
    free = oracle.simulate_crawl(web, seeds)
    tight = oracle.simulate_crawl(web, seeds, default_budget=2, max_waves=400)
    # same final seen set (politeness reorders, doesn't drop)
    assert tight.seen == free.seen
    assert set(tight.pages) == set(free.pages)
    assert set(tight.edges) == set(free.edges)
    # but more waves, and per-wave per-host ≤ 2
    assert tight.waves > free.waves
    from collections import Counter
    per = Counter()
    hosts = {pid: h for pid, (h, _, _) in tight.pages.items()}
    for (w, _, pid) in tight.crawl_order:
        per[(w, hosts[pid])] += 1
    assert max(per.values()) <= 2
