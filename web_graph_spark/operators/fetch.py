"""Pluggable page-fetch stage (operator S4).

The reference fetches with a shared HTTP client — custom User-Agent,
client timeout, DoH resolver cache
(/root/reference/pkg/linkprocessor/linkprocessor.go:51-75,104-121).
The Spark rebuild makes the fetch a *seam*: the crawler consumes a
:class:`Fetcher`, whose contract is

    fetch(scheduled) -> scheduled + (content_type, fetch_ok, spans)

with ``scheduled`` = the already-budgeted wave
(page_id, url, host, path, seq, depth).  Politeness is enforced
UPSTREAM in ``schedule_wave`` — a fetcher never sees more rows per
host than the wave budget allows (budget-before-salt; pinned in
tests/test_fetch.py).

Two implementations:

* :class:`JoinFetcher` — the synthetic web as a DataFrame, fetched by
  an equi-join on the uniform sha1 ``page_id`` (J7).  This is the
  sandbox/test mode and doubles as the replay mode for a stored crawl.
* :class:`PandasFetcher` — the real-deployment shape: group the wave
  by (host, salt) and run an injectable ``fetch_fn`` over each group
  in one Arrow-batched ``applyInPandas`` task.  Grouping by host gives
  connection/DNS reuse per host; the salt (on the uniform ``page_id``)
  fans a hot host out over up to ``salt_buckets`` tasks so one
  mega-host can't pin a straggler — safe precisely because the budget
  was already enforced upstream.  A worker-process-global cache dict
  is passed to every ``fetch_fn`` call for cross-group state (HTTP
  sessions, resolver cache) — per-partition executor state, never on
  the driver.

``http_fetch_fn`` is the reference-parity real fetcher (stdlib
urllib + UA + timeout + resolver memo); the sandbox has no network,
so its coverage is the seam contract via deterministic fetch_fns
(tests/test_fetch.py proves PandasFetcher ≡ JoinFetcher on the same
synthetic web).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPAN_TYPE = ("array<struct<kind:string,text:string,"
             "media_ref:string,offset:int>>")

FETCH_COLS = ["page_id", "url", "host", "path", "seq", "depth",
              "content_type", "fetch_ok", "spans"]


@dataclass(frozen=True)
class FetchConfig:
    """Per-request knobs, reference parity: UA and timeout
    (linkprocessor.go:51-75); per_request_delay_s is the in-partition
    pacing hook for crawl-delay compliance beyond the wave budget.

    doh_url: RFC 8484 DNS-over-HTTPS endpoint (e.g.
    ``https://cloudflare-dns.com/dns-query`` — the reference resolves
    through exactly that with a 1000-entry cache,
    linkprocessor.go:52-56).  When set, the pooled fetcher resolves
    hosts via wire-format DoH GETs (same LRU bound) and falls back to
    the OS resolver if the endpoint errs; None keeps the plain OS
    resolver."""
    user_agent: str = "web-graph-spark/2.0 (+https://example.test/bot)"
    timeout_s: float = 10.0
    per_request_delay_s: float = 0.0
    doh_url: str | None = None


class JoinFetcher:
    """Synthetic/replay fetch: scheduled ⋈ web on page_id (left join —
    URLs missing from the web come back fetch_ok=null → not expandable,
    exactly a 404).

    cache=True (default) persists the web side (MEMORY_AND_DISK) on
    first fetch: a multi-wave crawl otherwise RE-DERIVES the web's
    whole plan every wave — for a span web built from parquet that is
    a per-wave groupBy/sort_array re-aggregation the phase metrics
    showed dominating the write group.  Spill-safe (disk overflow) at
    replay scale; ``close()`` releases the cache (the crawler calls it
    for fetchers it constructed itself)."""

    def __init__(self, web: DataFrame, cache: bool = True):
        self.web = web
        self._cache = cache
        self._materialized = False

    def fetch(self, scheduled: DataFrame) -> DataFrame:
        if self._cache and not self._materialized:
            # skip (and never later unpersist) a web the CALLER already
            # cached — persist-on-persisted is a no-op warning in Spark,
            # but close() unpersisting a caller-owned cache would evict
            # state out from under them mid-session.
            if not self.web.is_cached:
                from pyspark import StorageLevel

                self.web = self.web.persist(StorageLevel.MEMORY_AND_DISK)
                self._materialized = True
            self._cache = False
        return (scheduled.alias("s")
                .join(self.web.alias("w"), "page_id", "left")
                .select("page_id", F.col("s.url").alias("url"),
                        F.col("s.host").alias("host"),
                        F.col("s.path").alias("path"),
                        F.col("s.seq").alias("seq"),
                        F.col("s.depth").alias("depth"),
                        "content_type", "fetch_ok", "spans"))

    def close(self) -> None:
        if self._materialized:
            self.web.unpersist()
            self._materialized = False


# one dict per python worker PROCESS: survives across groups/tasks, so
# fetch_fns can keep HTTP sessions / resolver entries warm for a whole
# executor slot (the Spark analog of the reference's shared client).
_WORKER_CACHE: dict = {}


class PandasFetcher:
    """Real-deployment fetch: (host, salt)-grouped applyInPandas over an
    injectable ``fetch_fn(pdf, cfg, cache) -> pd.DataFrame`` returning
    (page_id, content_type, fetch_ok, spans) for every input row —
    spans as a list of {kind,text,media_ref,offset} dicts or None."""

    def __init__(self, fetch_fn: Callable, cfg: FetchConfig | None = None,
                 salt_buckets: int = 8):
        self.fetch_fn = fetch_fn
        self.cfg = cfg or FetchConfig()
        self.salt_buckets = salt_buckets

    def fetch(self, scheduled: DataFrame) -> DataFrame:
        fetch_fn, cfg = self.fetch_fn, self.cfg
        out_schema = (
            "page_id string, url string, host string, path string, "
            f"seq long, depth int, content_type string, fetch_ok boolean, "
            f"spans {SPAN_TYPE}")

        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            res = fetch_fn(
                pdf[["page_id", "url", "host", "path"]], cfg, _WORKER_CACHE)
            # validate='many_to_one' fails loudly on a fetch_fn that
            # returns duplicate page_id rows — an unchecked how='left'
            # would silently multiply wave rows into pages/edges/docs
            merged = pdf[["page_id", "url", "host", "path", "seq",
                          "depth"]].merge(
                res[["page_id", "content_type", "fetch_ok", "spans"]],
                on="page_id", how="left", validate="many_to_one")
            # a fetch_fn that dropped a row ≙ failed fetch
            merged["fetch_ok"] = merged["fetch_ok"].fillna(False)
            return merged

        keyed = scheduled.withColumn(
            "__salt", F.pmod(F.xxhash64("page_id"),
                             F.lit(self.salt_buckets)))
        return (keyed.groupBy("host", "__salt")
                .applyInPandas(run, schema=out_schema))


def http_fetch_fn(rows: pd.DataFrame, cfg: FetchConfig,
                  cache: dict) -> pd.DataFrame:
    """Reference-parity HTTP fetcher (UA, timeout, optional pacing).
    Page parsing into spans is the extract stage's job — this returns
    raw HTML as a single text span; real deployments swap in their own
    parser fetch_fn (typically requests/httpx with per-worker
    connection pooling + DNS caching through the ``cache`` dict —
    urllib resolves per request, so there is deliberately no
    half-measure resolver memo here).  Untestable in this sandbox (no
    network); the seam itself is covered by deterministic fetch_fns in
    tests/test_fetch.py."""
    import time
    import urllib.request

    out = []
    for r in rows.itertuples(index=False):
        if cfg.per_request_delay_s:
            time.sleep(cfg.per_request_delay_s)
        try:
            req = urllib.request.Request(
                r.url, headers={"User-Agent": cfg.user_agent})
            with urllib.request.urlopen(req, timeout=cfg.timeout_s) as resp:
                ctype = resp.headers.get("Content-Type",
                                         "application/octet-stream")
                body = resp.read().decode("utf-8", "replace")
            out.append((r.page_id, ctype, True,
                        [{"kind": "text", "text": body,
                          "media_ref": None, "offset": 0}]))
        except Exception:
            out.append((r.page_id, None, False, None))
    return pd.DataFrame(
        out, columns=["page_id", "content_type", "fetch_ok", "spans"])


def _dns_wire_query(host: str, qtype: int = 1) -> bytes:
    """Minimal RFC 1035 wire-format query (A by default).  ID=0 as RFC
    8484 §4.1 recommends for HTTP-cache-friendly DoH GETs; RD=1."""
    hdr = b"\x00\x00" + b"\x01\x00" + b"\x00\x01" + b"\x00\x00" * 3
    qname = b"".join(
        bytes([len(label)]) + label.encode("idna" if any(
            ord(c) > 127 for c in label) else "ascii")
        for label in host.rstrip(".").split("."))
    return hdr + qname + b"\x00" + qtype.to_bytes(2, "big") + b"\x00\x01"


def _dns_wire_parse(resp: bytes, qtype: int = 1) -> list[str]:
    """Extract the A (or AAAA with qtype=28) record addresses from a
    wire-format DNS response — name compression handled by skipping
    (we never need the owner names, only RDATA)."""
    import socket
    import struct

    def skip_name(off: int) -> int:
        while True:
            ln = resp[off]
            if ln == 0:
                return off + 1
            if ln & 0xC0 == 0xC0:       # compression pointer
                return off + 2
            off += 1 + ln

    qd, an = struct.unpack(">HH", resp[4:8])
    off = 12
    for _ in range(qd):
        off = skip_name(off)
        off += 4                        # QTYPE + QCLASS
    out = []
    for _ in range(an):
        off = skip_name(off)
        rtype, rclass, _ttl, rdlen = struct.unpack(
            ">HHIH", resp[off:off + 10])
        off += 10
        rdata = resp[off:off + rdlen]
        off += rdlen
        if rclass == 1 and rtype == qtype == 1 and rdlen == 4:
            out.append(socket.inet_ntoa(rdata))
        elif rclass == 1 and rtype == qtype == 28 and rdlen == 16:
            out.append(socket.inet_ntop(socket.AF_INET6, rdata))
    return out


def doh_resolve(host: str, doh_url: str, timeout_s: float) -> str:
    """One RFC 8484 DoH GET (``?dns=<base64url(wire query)>``,
    ``accept: application/dns-message``) → first A record.  Raises on
    transport errors, non-200, or an empty answer section — callers
    fall back to the OS resolver (the stdlib analog of the reference's
    hardcoded fallback addresses, linkprocessor.go:54)."""
    import base64
    import urllib.request

    q = base64.urlsafe_b64encode(_dns_wire_query(host)).rstrip(b"=")
    sep = "&" if "?" in doh_url else "?"
    req = urllib.request.Request(
        f"{doh_url}{sep}dns={q.decode('ascii')}",
        headers={"Accept": "application/dns-message"})
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        if resp.status != 200:
            raise RuntimeError(f"DoH status {resp.status}")
        addrs = _dns_wire_parse(resp.read())
    if not addrs:
        raise RuntimeError(f"DoH empty answer for {host}")
    return addrs[0]


def pooled_http_fetch_fn(rows: pd.DataFrame, cfg: FetchConfig,
                         cache: dict) -> pd.DataFrame:
    """Reference-parity POOLED fetcher (closes the last S4 gap): the
    reference shares one HTTP client with keep-alive, a DoH resolver
    and a 1000-entry DNS cache across all workers
    (/root/reference/pkg/linkprocessor/linkprocessor.go:51-75).  The
    Spark analog keeps both in the per-worker ``cache`` dict, so they
    survive across (host, salt) groups AND across waves for the
    lifetime of the python worker:

    * ``cache['http_pool']``: (scheme, host, port) → live
      ``http.client`` connection, LRU-bounded to ``_POOL_MAX`` (evicted
      connections are closed).  A stale kept-alive connection (server
      closed it between waves) is retried once on a fresh one.
    * ``cache['dns_memo']``: host → resolved address, LRU-bounded to
      1000 entries like the reference.  With ``cfg.doh_url`` set the
      lookup itself is RFC 8484 DNS-over-HTTPS (:func:`doh_resolve` —
      full reference parity with linkprocessor.go:52-56, OS resolver
      as the fallback path); otherwise the OS resolver.  Plain-HTTP
      connections dial the memoized address directly (Host header
      carries the name); HTTPS connections still resolve through the
      OS (SNI/verification needs the hostname — the keep-alive pool
      amortizes resolution there; documented stdlib deviation).

    Each (host, salt) group is single-host, so in steady state a group
    costs ONE pooled connection however many rows it fetches.

    Status semantics match ``http_fetch_fn``/urllib: 3xx redirects are
    followed (≤5 hops), status ≥400 is a FAILED fetch (an error page's
    body must not become page content); a failure on a pooled socket is
    retried once on a fresh one (idle-timeout staleness), a fresh
    connection's failure is the host's answer and is not retried."""
    import http.client
    import socket
    from collections import OrderedDict
    from urllib.parse import urljoin, urlsplit

    _POOL_MAX = 64
    _DNS_MAX = 1000  # linkprocessor.go: lru.New(1000)
    pool: OrderedDict = cache.setdefault("http_pool", OrderedDict())
    dns: OrderedDict = cache.setdefault("dns_memo", OrderedDict())

    def resolve(host: str, port: int) -> str:
        if host in dns:
            dns.move_to_end(host)
            return dns[host]
        addr = None
        if cfg.doh_url:
            # reference parity: DoH first (linkprocessor.go:52-56),
            # OS resolver as the fallback path
            try:
                addr = doh_resolve(host, cfg.doh_url, cfg.timeout_s)
            except Exception:  # noqa: BLE001 — any DoH failure falls back
                addr = None
        if addr is None:
            addr = socket.getaddrinfo(
                host, port, proto=socket.IPPROTO_TCP)[0][4][0]
        dns[host] = addr
        while len(dns) > _DNS_MAX:
            dns.popitem(last=False)
        return addr

    def connect(scheme: str, host: str, port: int):
        """→ (conn, from_pool): a pooled keep-alive connection if one
        exists, else a fresh one (HTTP dials the memoized address; the
        explicit Host header below carries the name)."""
        key = (scheme, host, port)
        conn = pool.pop(key, None)
        if conn is not None:
            return conn, True
        if scheme == "https":
            conn = http.client.HTTPSConnection(host, port,
                                               timeout=cfg.timeout_s)
        else:
            conn = http.client.HTTPConnection(resolve(host, port), port,
                                              timeout=cfg.timeout_s)
        return conn, False

    def put_back(scheme: str, host: str, port: int, conn) -> None:
        pool[(scheme, host, port)] = conn
        pool.move_to_end((scheme, host, port))
        while len(pool) > _POOL_MAX:
            _, old = pool.popitem(last=False)
            old.close()

    MAX_REDIRECTS = 5  # urllib's handler allows 10; 5 matches crawlers

    def one(url: str):
        for _hop in range(MAX_REDIRECTS + 1):
            parts = urlsplit(url)
            scheme = parts.scheme or "http"
            host = parts.hostname or ""
            port = parts.port or (443 if scheme == "https" else 80)
            default_port = 443 if scheme == "https" else 80
            path = (parts.path or "/") + (f"?{parts.query}" if parts.query
                                          else "")
            headers = {"User-Agent": cfg.user_agent,
                       "Host": (host if port == default_port
                                else f"{host}:{port}"),
                       "Connection": "keep-alive"}
            last_err = None
            for _attempt in range(2):
                conn, from_pool = connect(scheme, host, port)
                try:
                    conn.request("GET", path, headers=headers)
                    resp = conn.getresponse()
                    body = resp.read()
                    status = resp.status
                    ctype = resp.headers.get("Content-Type",
                                             "application/octet-stream")
                    location = resp.headers.get("Location")
                    if resp.will_close:
                        conn.close()
                    else:
                        put_back(scheme, host, port, conn)
                except Exception as e:  # noqa: BLE001 — fetch_ok=False
                    conn.close()
                    last_err = e
                    # retry ONLY when the failure came off a pooled
                    # keep-alive socket (server may have idled it out);
                    # a fresh connection's failure is the host's answer
                    # — retrying doubles requests/timeouts to dead hosts
                    if from_pool:
                        continue
                    raise
                break
            else:
                raise last_err
            if 300 <= status < 400 and location:
                # follow redirects like urllib's default opener does
                url = urljoin(url, location)
                continue
            if status >= 400:
                # error pages are failed fetches, matching urllib's
                # HTTPError behavior in http_fetch_fn — a 404 body must
                # not become page content
                raise RuntimeError(f"HTTP {status} for {url}")
            return ctype, body.decode("utf-8", "replace")
        raise RuntimeError(f"redirect loop (> {MAX_REDIRECTS}) for {url}")

    import time

    out = []
    for r in rows.itertuples(index=False):
        if cfg.per_request_delay_s:
            time.sleep(cfg.per_request_delay_s)
        try:
            ctype, body = one(r.url)
            out.append((r.page_id, ctype, True,
                        [{"kind": "text", "text": body,
                          "media_ref": None, "offset": 0}]))
        except Exception:
            out.append((r.page_id, None, False, None))
    return pd.DataFrame(
        out, columns=["page_id", "content_type", "fetch_ok", "spans"])


def consistent_web_fetch_fn(n_pages: int, links_per_page: int = 8):
    """fetch_fn twin of benchjobs.synth_consistent_web: computes the
    SAME spans from the URL alone, numpy-vectorized — so a PandasFetcher
    crawl must equal a JoinFetcher crawl over the generated table
    (tests/test_fetch.py pins the equality).  This is what a real
    fetch_fn looks like when 'the web' is a pure function of the URL."""
    import re

    primes = [7, 13, 31, 17, 23, 11, 19, 29]

    def fn(rows: pd.DataFrame, cfg: FetchConfig,
           cache: dict) -> pd.DataFrame:
        nums = rows["path"].map(
            lambda p: int(re.search(r"/d/([0-9]+)\.html", p).group(1)))
        spans = []
        for num in nums:
            doc = []
            for k in range(1, links_per_page + 1):
                tgt = (num * primes[(k - 1) % len(primes)] + k) % n_pages
                t_host = f"h{tgt % 997}.example.test"
                t_url = f"https://{t_host}/d/{tgt}.html"
                if k % 4 == 0:
                    href = f"https://{t_host}/img{tgt}.png"
                elif k % 4 == 3:
                    href = (f"/d/{tgt}.html" if tgt % 997 == num % 997
                            else t_url)
                elif k % 4 == 2:
                    href = f"{t_url}?b=2&a=1#s"
                else:
                    href = t_url
                doc.append({"kind": "link", "text": f"anchor-{k}",
                            "media_ref": href, "offset": k})
            spans.append(doc)
        return pd.DataFrame({
            "page_id": rows["page_id"].to_numpy(),
            "content_type": "text/html",
            "fetch_ok": True,
            "spans": spans,
        })

    return fn


def paced_fetch_fn(inner: Callable, crawl_delays: dict | None = None,
                   default_delay_s: float = 0.0,
                   clock=None, sleep=None) -> Callable:
    """Wrap a fetch_fn with per-HOST request pacing — the intra-wave
    half of crawl-delay compliance (the inter-wave half is the budget
    dim from robots_eval's ``budgets_from_crawl_delay``).

    Each (host, salt) group is single-host, so the wrapper issues the
    group's requests one at a time, sleeping so consecutive requests to
    the host within this worker are ≥ its delay apart (last-fetch
    timestamps live in the per-worker cache, surviving across groups).
    Scope note: pacing is per python WORKER — a hot host fanned out
    over ``salt_buckets`` tasks can see up to salt_buckets× the rate.
    For a strict global per-host rate either keep salt_buckets=1 or
    rely on the wave budget (which is exact).  ``clock``/``sleep`` are
    injectable for deterministic tests.

    Results are pacing-independent: the wrapped fn must return exactly
    what ``inner`` returns (pinned by crawl-equality in
    tests/test_fetch.py).
    """
    import time as _time

    clock = clock or _time.monotonic
    sleep = sleep or _time.sleep
    delays = crawl_delays or {}

    def fn(rows: pd.DataFrame, cfg: FetchConfig,
           cache: dict) -> pd.DataFrame:
        if len(rows) == 0:
            return inner(rows, cfg, cache)
        host = rows["host"].iloc[0]
        d = float(delays.get(host, default_delay_s))
        if d <= 0:
            return inner(rows, cfg, cache)
        last = cache.setdefault("paced_last_fetch", {})
        outs = []
        for i in range(len(rows)):
            wait = last.get(host, float("-inf")) + d - clock()
            if wait > 0:
                sleep(wait)
            last[host] = clock()
            outs.append(inner(rows.iloc[i:i + 1], cfg, cache))
        return pd.concat(outs, ignore_index=True)

    return fn
