"""Read-API serving layer (S10/J1-J5/A1 + X7 JSON shaping): LinkApi
over a real crawl store must answer exactly what direct DataFrame
queries answer, and the stdlib HTTP front-end must serve the
reference's routes and JSON shapes (cmd/link-api/main.go:87-188)."""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F

from web_graph_spark import fixtures
from web_graph_spark.api import LinkApi, serve
from web_graph_spark.crawler import SparkCrawler, load_web


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("apifix")
    fixtures.generate_fixtures(str(d), seed=42, n_pages=70, n_hosts=8)
    web = load_web(spark, str(d))
    seeds = spark.read.parquet(f"{d}/seeds.parquet")
    c = SparkCrawler(spark, str(tmp_path_factory.mktemp("apistate")), web,
                     max_waves=3)
    c.init_from_seeds(seeds)
    c.run()
    return c.store


@pytest.mark.spark
def test_link_api_matches_dataframes(spark, store):
    api = LinkApi.from_store(store)
    pages = store.read("pages")
    edges = store.read("edges")
    some = pages.orderBy("page_id").limit(3).collect()
    assert some, "crawl produced no pages"

    for r in some:
        # J3 point lookup + shape
        got = api.get_page(r["page_id"])
        assert got == {"id": r["page_id"], "group": r["host"],
                       "url": r["url"]}
        # J1/J2 vs direct filters (limit 100 >> fixture degree)
        want_from = {x[0] for x in edges.filter(
            F.col("from_page_id") == r["page_id"])
            .select("to_page_id").collect()}
        assert set(api.get_links_from(r["page_id"])) == want_from
        want_to = {x[0] for x in edges.filter(
            F.col("to_page_id") == r["page_id"])
            .select("from_page_id").collect()}
        assert set(api.get_links_to(r["page_id"])) == want_to

    # J4 per-host hashes
    host = some[0]["host"]
    want = {x[0] for x in pages.filter(F.col("host") == host)
            .select("page_id").collect()}
    got = api.get_page_hashes_from_host(host)
    assert set(got) <= want and len(got) == min(len(want), api.limit)

    # A1 metrics-backed counts == exact table counts (no-scan path)
    assert api.count_pages() == pages.count()
    assert api.count_links() == edges.count()

    # absent page → None (HTTP layer turns into 404)
    assert api.get_page("no-such-hash") is None
    assert api.page_composite("no-such-hash") is None


@pytest.mark.spark
def test_http_serving_routes(spark, store):
    api = LinkApi.from_store(store)
    srv = serve(api)
    base = "http://%s:%d" % srv.server_address
    try:
        def get(path):
            with urllib.request.urlopen(base + path) as r:
                return r.status, r.read().decode()

        st, body = get("/")
        assert st == 200 and "web-graph" in body

        pid = store.read("pages").orderBy("page_id").first()["page_id"]
        st, body = get(f"/page/{pid}")
        out = json.loads(body)
        # X7: the reference's OutputJSON field names, exactly
        assert st == 200 and set(out) == {"node", "links"}
        assert set(out["node"]) == {"id", "group", "url"}
        assert out["node"]["id"] == pid
        assert out["links"] == api.get_links_from(pid)

        st, body = get(f"/linksFrom/{pid}")
        assert st == 200 and json.loads(body) == api.get_links_from(pid)
        st, body = get(f"/linksTo/{pid}")
        assert st == 200 and json.loads(body) == api.get_links_to(pid)

        host = store.read("pages").first()["host"]
        st, body = get(f"/pages/{host}")
        assert st == 200 and set(json.loads(body)) == set(
            api.get_page_hashes_from_host(host))

        st, body = get("/countPages")
        assert json.loads(body) == {"countPages": api.count_pages()}
        st, body = get("/countLinks")
        assert json.loads(body) == {"countLinks": api.count_links()}

        # S11 graph UI served dependency-free at /ui
        st, body = get("/ui")
        assert st == 200 and "<canvas" in body and "SHA-1" in body

        # 404s: missing page and unknown route
        with pytest.raises(urllib.error.HTTPError) as e:
            get("/page/no-such-hash")
        assert e.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as e:
            get("/definitely/not/a/route")
        assert e.value.code == 404
    finally:
        srv.shutdown()
        srv.server_close()
