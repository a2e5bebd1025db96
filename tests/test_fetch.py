"""The fetch seam (S4): PandasFetcher ≡ JoinFetcher on the same web,
and budget-before-salt ordering."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from web_graph_spark.plans import physical_plan

N_PAGES = 2000


def _web(spark):
    from web_graph_spark.benchjobs import synth_consistent_web

    return synth_consistent_web(spark, N_PAGES)


def _seeds(spark):
    web = _web(spark)
    num = F.regexp_extract("url", r"/d/([0-9]+)\.html", 1).cast("long")
    return (web.withColumn("__n", num).filter(F.col("__n") < 20)
            .select(F.col("__n").alias("seq"), "url"))


def _crawl(spark, d, **kw):
    from web_graph_spark.crawler import SparkCrawler

    c = SparkCrawler(spark, d, max_waves=3, default_budget=7, **kw)
    c.init_from_seeds(_seeds(spark))
    c.run()
    return c.store


@pytest.mark.spark
def test_pandas_fetcher_equals_join_fetcher(spark, tmp_path):
    """Crawl equality through the injectable applyInPandas fetch stage:
    the fetch_fn computes the same web as the JoinFetcher's table, so
    every state table must come out bit-identical."""
    from web_graph_spark.operators.fetch import (PandasFetcher,
                                                 consistent_web_fetch_fn)

    a = _crawl(spark, str(tmp_path / "join"), web=_web(spark))
    b = _crawl(spark, str(tmp_path / "pandas"),
               fetcher=PandasFetcher(consistent_web_fetch_fn(N_PAGES)))
    for t in ("crawl_order", "pages", "edges", "seen", "docs_out"):
        ra = sorted(map(tuple, a.read(t).drop("wave").collect()))
        rb = sorted(map(tuple, b.read(t).drop("wave").collect()))
        assert ra == rb, t


@pytest.mark.spark
def test_budget_before_salt(spark):
    """Politeness is enforced UPSTREAM of fetch fan-out: with a hot
    host and budget B, the fetcher sees ≤ B rows per host, and the
    physical plan stacks the grouped-fetch stage ABOVE the politeness
    WindowGroupLimit (budget cut happens before salting)."""
    from web_graph_spark.operators.fetch import (FetchConfig, PandasFetcher,
                                                 consistent_web_fetch_fn)
    from web_graph_spark.operators.politeness import schedule_wave

    pending = spark.range(500).select(
        F.sha1(F.col("id").cast("string")).alias("page_id"),
        F.when(F.col("id") % 5 == 0, F.lit("hot.example.test"))
         .otherwise(F.concat(F.lit("h"), (F.col("id") % 97).cast("string"),
                             F.lit(".example.test"))).alias("host"),
        F.concat(F.lit("/d/"), F.col("id").cast("string"),
                 F.lit(".html")).alias("path"),
        F.col("id").alias("seq"), F.lit(0).alias("depth"))
    pending = pending.withColumn(
        "url", F.concat(F.lit("https://"), "host", "path"))
    scheduled, _ = schedule_wave(pending, None, default_budget=3)
    fetcher = PandasFetcher(consistent_web_fetch_fn(1000),
                            FetchConfig(), salt_buckets=4)
    fetched = fetcher.fetch(scheduled)
    per_host = {r["host"]: r["n"] for r in
                fetched.groupBy("host").agg(F.count("*").alias("n"))
                .collect()}
    assert per_host["hot.example.test"] <= 3
    assert max(per_host.values()) <= 3
    plan = physical_plan(fetched)
    fmg = plan.index("FlatMapGroupsInPandas")
    wgl = plan.index("WindowGroupLimit")
    assert fmg < wgl, plan  # fetch fan-out sits above the budget cut


@pytest.mark.spark
def test_paced_fetch_fn_spacing_and_equality(spark):
    """paced_fetch_fn must (a) keep same-host requests >= delay apart
    on a fake clock and (b) change nothing about the results."""
    from web_graph_spark.operators.fetch import (FetchConfig,
                                                 paced_fetch_fn)

    calls = []

    def inner(rows, cfg, cache):
        calls.append((rows["host"].iloc[0], clock_now[0]))
        return pd.DataFrame({
            "page_id": rows["page_id"].to_numpy(),
            "content_type": "text/html",
            "fetch_ok": True,
            "spans": [None] * len(rows)})

    clock_now = [100.0]

    def fake_clock():
        return clock_now[0]

    def fake_sleep(s):
        assert s > 0
        clock_now[0] += s

    paced = paced_fetch_fn(inner, crawl_delays={"a.test": 2.0},
                           default_delay_s=0.0, clock=fake_clock,
                           sleep=fake_sleep)
    rows = pd.DataFrame({
        "page_id": [f"p{i}" for i in range(4)],
        "url": ["u"] * 4, "host": ["a.test"] * 4, "path": ["/"] * 4})
    cache = {}
    out = paced(rows, FetchConfig(), cache)
    assert list(out["page_id"]) == [f"p{i}" for i in range(4)]
    times = [t for (_h, t) in calls]
    assert all(b - a >= 2.0 for a, b in zip(times, times[1:])), times
    # un-delayed host goes straight through, single inner call
    calls.clear()
    rows_b = rows.assign(host="b.test")
    paced(rows_b, FetchConfig(), cache)
    assert len(calls) == 1
    # cross-GROUP pacing: a second batch for a.test still honors the
    # last-fetch timestamp kept in the worker cache
    calls.clear()
    t_before = clock_now[0]
    paced(rows.iloc[:1], FetchConfig(), cache)
    assert calls[0][1] - t_before >= 0 and \
        cache["paced_last_fetch"]["a.test"] >= t_before


def test_pooled_http_fetch_fn_keepalive_dns_and_retry():
    """Reference-parity pooled fetcher against a real local socket:
    N requests to one host ride ONE kept-alive connection (the
    reference's pooled client, linkprocessor.go:51-75), the resolver
    memo is populated and reused, a stale pooled connection is retried
    once on a fresh socket, and an unreachable host degrades to
    fetch_ok=False."""
    import http.server
    import socket
    import threading

    from web_graph_spark.operators.fetch import (FetchConfig,
                                                 pooled_http_fetch_fn)

    conns: list[int] = []
    requests: list[str] = []

    class H(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # keep-alive

        def setup(self):  # one handler instance per CONNECTION
            conns.append(id(self))
            super().setup()

        def do_GET(self):
            requests.append(self.path)
            if self.path.startswith("/missing"):
                body = b"not found page"
                self.send_response(404)
            elif self.path.startswith("/moved"):
                self.send_response(301)
                self.send_header("Location", "/d/0.html")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            else:
                body = f"page:{self.path}".encode()
                self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    cfg = FetchConfig(timeout_s=5.0)
    try:
        def batch(n):
            return pd.DataFrame({
                "page_id": [f"p{i}" for i in range(n)],
                "url": [f"http://localhost:{port}/d/{i}.html"
                        for i in range(n)],
                "host": ["localhost"] * n,
                "path": [f"/d/{i}.html" for i in range(n)]})

        cache: dict = {}
        out = pooled_http_fetch_fn(batch(8), cfg, cache)
        assert list(out["fetch_ok"]) == [True] * 8
        assert [s[0]["text"] for s in out["spans"]] == \
            [f"page:/d/{i}.html" for i in range(8)]
        assert len(conns) == 1, f"keep-alive broken: {len(conns)} conns"
        assert "localhost" in cache["dns_memo"]

        # a second group/wave reuses the pooled connection
        out2 = pooled_http_fetch_fn(batch(3), cfg, cache)
        assert list(out2["fetch_ok"]) == [True] * 3
        assert len(conns) == 1

        # stale keep-alive socket (server idled it out between waves):
        # kill the pooled socket under the fetcher — the retry path
        # must transparently reconnect
        for conn in cache["http_pool"].values():
            conn.sock.shutdown(socket.SHUT_RDWR)
        out3 = pooled_http_fetch_fn(batch(2), cfg, cache)
        assert list(out3["fetch_ok"]) == [True] * 2
        assert len(conns) == 2  # exactly one fresh connection

        # status semantics: 404 → fetch_ok=False (error body is NOT
        # page content); 301 → followed to the target page
        mixed = batch(2).assign(
            url=[f"http://localhost:{port}/missing.html",
                 f"http://localhost:{port}/moved.html"])
        out5 = pooled_http_fetch_fn(mixed, cfg, cache)
        assert list(out5["fetch_ok"]) == [False, True]
        assert out5["spans"][1][0]["text"] == "page:/d/0.html"

        # unreachable port → fetch_ok False rows, no raise, and NO
        # double requests (fresh-connection failures are not retried)
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        dead_port = s.getsockname()[1]
        s.close()
        n_req_before = len(requests)
        bad = batch(2).assign(
            url=[f"http://localhost:{dead_port}/x" for _ in range(2)])
        out4 = pooled_http_fetch_fn(bad, FetchConfig(timeout_s=0.5), cache)
        assert list(out4["fetch_ok"]) == [False, False]
        assert len(requests) == n_req_before  # dead host saw no retry
    finally:
        srv.shutdown()
        srv.server_close()


def test_dns_wire_codec_roundtrip():
    """RFC 1035 wire helpers: query layout + response parsing with a
    compression-pointer owner name (the shape real resolvers emit)."""
    from web_graph_spark.operators.fetch import (_dns_wire_parse,
                                                 _dns_wire_query)

    q = _dns_wire_query("a.example.test")
    # header: ID=0, RD=1, QDCOUNT=1
    assert q[:4] == b"\x00\x00\x01\x00" and q[4:6] == b"\x00\x01"
    assert b"\x01a\x07example\x04test\x00" in q

    # response: same question, one A answer whose owner is a pointer
    # to offset 12 (the question name)
    ans = (b"\xc0\x0c"                 # NAME: pointer -> offset 12
           + b"\x00\x01\x00\x01"       # TYPE=A CLASS=IN
           + b"\x00\x00\x00\x3c"       # TTL 60
           + b"\x00\x04" + bytes([127, 0, 0, 1]))
    resp = (b"\x00\x00\x81\x80" + b"\x00\x01\x00\x01"
            + b"\x00\x00\x00\x00" + q[12:] + ans)
    assert _dns_wire_parse(resp) == ["127.0.0.1"]


def test_pooled_fetch_doh_resolution_and_fallback():
    """DoH parity (reference linkprocessor.go:52-56): with
    ``cfg.doh_url`` set, host resolution goes through RFC 8484
    wire-format GETs against the endpoint, is LRU-memoized (ONE DoH
    query per host across batches), and any DoH failure falls back to
    the OS resolver instead of failing the fetch."""
    import base64
    import http.server
    import socket
    import threading

    from web_graph_spark.operators.fetch import (FetchConfig,
                                                 _dns_wire_parse,
                                                 _dns_wire_query,
                                                 pooled_http_fetch_fn)

    doh_queries: list[str] = []

    class DoH(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            assert self.path.startswith("/dns-query?dns=")
            raw = self.path.split("dns=", 1)[1]
            q = base64.urlsafe_b64decode(raw + "=" * (-len(raw) % 4))
            # crude name extraction from the question section
            off, labels = 12, []
            while q[off]:
                labels.append(q[off + 1:off + 1 + q[off]].decode())
                off += 1 + q[off]
            doh_queries.append(".".join(labels))
            ans = (b"\xc0\x0c" + b"\x00\x01\x00\x01"
                   + b"\x00\x00\x00\x3c"
                   + b"\x00\x04" + bytes([127, 0, 0, 1]))
            body = (b"\x00\x00\x81\x80" + b"\x00\x01\x00\x01"
                    + b"\x00\x00\x00\x00" + q[12:] + ans)
            self.send_response(200)
            self.send_header("Content-Type", "application/dns-message")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    class Content(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def do_GET(self):
            body = f"page:{self.path}".encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    doh_srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), DoH)
    web_srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Content)
    for s in (doh_srv, web_srv):
        threading.Thread(target=s.serve_forever, daemon=True).start()
    doh_url = f"http://127.0.0.1:{doh_srv.server_address[1]}/dns-query"
    wport = web_srv.server_address[1]
    try:
        cfg = FetchConfig(timeout_s=5.0, doh_url=doh_url)
        rows = pd.DataFrame({
            "page_id": ["p0", "p1"],
            "url": [f"http://fake-host.test:{wport}/d/{i}.html"
                    for i in range(2)],
            "host": ["fake-host.test"] * 2,
            "path": [f"/d/{i}.html" for i in range(2)]})
        cache: dict = {}
        out = pooled_http_fetch_fn(rows, cfg, cache)
        # "fake-host.test" does NOT exist in any OS resolver — success
        # proves resolution went through the DoH endpoint
        assert list(out["fetch_ok"]) == [True, True]
        assert cache["dns_memo"]["fake-host.test"] == "127.0.0.1"
        assert doh_queries == ["fake-host.test"]   # one query, memoized

        # second batch: memo hit, still no extra DoH traffic
        out2 = pooled_http_fetch_fn(rows, cfg, cache)
        assert list(out2["fetch_ok"]) == [True, True]
        assert doh_queries == ["fake-host.test"]

        # fallback: dead DoH endpoint, resolvable host → OS resolver
        s = socket.socket(); s.bind(("127.0.0.1", 0))
        dead = s.getsockname()[1]; s.close()
        cfg_dead = FetchConfig(timeout_s=1.0,
                               doh_url=f"http://127.0.0.1:{dead}/dns-query")
        rows2 = rows.assign(
            url=[f"http://localhost:{wport}/d/{i}.html" for i in range(2)],
            host=["localhost"] * 2)
        out3 = pooled_http_fetch_fn(rows2, cfg_dead, {})
        assert list(out3["fetch_ok"]) == [True, True]
    finally:
        for s in (doh_srv, web_srv):
            s.shutdown(); s.server_close()


@pytest.mark.spark
def test_join_fetcher_cache_ownership(spark):
    """JoinFetcher persists the web on first fetch and releases it on
    close() — but NEVER unpersists a web the caller cached themselves
    (close() evicting a caller-owned cache would drop their state
    mid-session)."""
    from web_graph_spark.operators.fetch import JoinFetcher

    sched = _seeds(spark).select(
        F.sha1(F.col("url")).alias("page_id"), "url",
        F.lit("h.test").alias("host"), F.lit("/p").alias("path"),
        "seq", F.lit(0).alias("depth"))

    # fetcher-owned: persist on fetch, release on close
    own = _web(spark)
    f = JoinFetcher(own)
    f.fetch(sched).count()
    assert f.web.is_cached
    f.close()
    assert not f.web.is_cached

    # caller-owned: fetch must not re-persist, close must not evict
    theirs = _web(spark).persist()
    theirs.count()
    g = JoinFetcher(theirs)
    g.fetch(sched).count()
    g.close()
    assert theirs.is_cached
    theirs.unpersist()
