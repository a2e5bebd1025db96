"""Read API over a crawl WaveStore — the rebuild of the reference's
``link-api`` service (cmd/link-api/main.go:57-196) and its JSON
shaping (X7), Spark-first.

Reference parity:

* ``GetPage``            (linkstorage.go:149)  → :meth:`LinkApi.get_page`
* ``GetPageHashesFromHost`` (linkstorage.go:183) → :meth:`LinkApi.get_page_hashes_from_host`
* ``GetLinksFrom``       (linkstorage.go:255)  → :meth:`LinkApi.get_links_from`
* ``GetLinksTo``         (linkstorage.go:289)  → :meth:`LinkApi.get_links_to`
* ``CountLinks/Pages``   (linkstorage.go:323,346) → :meth:`count_links` /
  :meth:`count_pages` — the reference serves the pg_class ``reltuples``
  *estimate* (no table scan); the rebuild serves the exact sum of the
  per-wave ``n_pages_new`` / ``n_edges_new`` metrics rows — also no
  scan of the big tables.
* ``/page/:id`` composite JSON (main.go:91-132, ``OutputJSON``) →
  :meth:`page_composite` — ``{"node": {"id", "group", "url"},
  "links": [...]}``, byte-identical field names.
* The HTTP surface (main.go:87-188) → :func:`serve` /
  :class:`_Handler`: stdlib ``http.server`` routes ``/``,
  ``/page/:id``, ``/pages/:host``, ``/linksFrom/:id``,
  ``/linksTo/:id``, ``/countLinks``, ``/countPages`` with the same
  response shapes and the same ``queryLimit = 100`` default.

Scale design: every lookup is a single-column-pruned, filter-pushed
parquet read (tests/test_plans.py pins ``PushedFilters`` for the
point lookup).  Over a *bucketed* WaveStore (``bucketed_state=True``)
the equality filter on the bucket key additionally prunes to 1/N of
the files (Spark bucket pruning), and the per-bucket ``sortBy(key)``
gives parquet min/max row-group skipping within the file — the
serving story that survives a 10^10-page store.  For hard
interactive-latency SLOs the same snapshot would be exported to a KV
store; the DataFrame path here is the source of truth either way.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERY_LIMIT = 100  # reference: cmd/link-api/main.go:24

WELCOME = """Welcome to the web-graph (web_graph_spark rebuild)!

API paths (reference-parity, cmd/link-api/main.go:29-38):
/                 - this page
/page/:id         - page info + links from the page (composite JSON)
/pages/:host      - page hashes for a host
/linksFrom/:id    - page hashes linked from :id
/linksTo/:id      - page hashes linking to :id
/countLinks       - {"countLinks": n}
/countPages       - {"countPages": n}
/ui               - force-graph explorer (?url=... or ?id=<hash>)
"""


class LinkApi:
    """J1-J5 point/limit queries over crawl-state DataFrames.

    Construct from a :class:`~web_graph_spark.storage.WaveStore`
    (``LinkApi.from_store``) or from explicit ``pages`` / ``edges``
    DataFrames.  All methods return plain Python values (the HTTP
    layer JSON-encodes them verbatim).
    """

    def __init__(self, pages: DataFrame, edges: DataFrame,
                 limit: int = QUERY_LIMIT,
                 count_pages_fn=None, count_links_fn=None):
        self.pages = pages
        self.edges = edges
        self.limit = limit
        self._count_pages_fn = count_pages_fn
        self._count_links_fn = count_links_fn

    @classmethod
    def from_store(cls, store, limit: int = QUERY_LIMIT) -> "LinkApi":
        """Serve a committed crawl store.  Counts come from the
        metrics table (sum of per-wave ``n_pages_new`` /
        ``n_edges_new``) — no scan of pages/edges, mirroring the
        reference's estimate-not-scan choice."""
        def _metric_sum(key: str) -> int:
            m = (store.read("metrics")
                 .filter((F.col("scope") == "wave") & (F.col("key") == key))
                 .agg(F.sum("value")).first()[0])
            return int(m or 0)

        return cls(store.read("pages"), store.read("edges"), limit,
                   count_pages_fn=lambda: _metric_sum("n_pages_new"),
                   count_links_fn=lambda: _metric_sum("n_edges_new"))

    # -- J3 ---------------------------------------------------------------
    def get_page(self, page_id: str) -> Optional[dict]:
        """Point lookup; None when absent (reference returns nil,
        the HTTP layer maps it to 404)."""
        row = (self.pages.filter(F.col("page_id") == page_id)
               .select("page_id", "host", "url").limit(1).collect())
        if not row:
            return None
        r = row[0]
        return {"id": r["page_id"], "group": r["host"], "url": r["url"]}

    # -- J4 ---------------------------------------------------------------
    def get_page_hashes_from_host(self, host: str) -> list[str]:
        return [r[0] for r in
                (self.pages.filter(F.col("host") == host)
                 .select("page_id").limit(self.limit).collect())]

    # -- J1 ---------------------------------------------------------------
    def get_links_from(self, page_id: str) -> list[str]:
        return [r[0] for r in
                (self.edges.filter(F.col("from_page_id") == page_id)
                 .select("to_page_id").limit(self.limit).collect())]

    # -- J2 ---------------------------------------------------------------
    def get_links_to(self, page_id: str) -> list[str]:
        return [r[0] for r in
                (self.edges.filter(F.col("to_page_id") == page_id)
                 .select("from_page_id").limit(self.limit).collect())]

    # -- A1 ---------------------------------------------------------------
    def count_pages(self) -> int:
        if self._count_pages_fn is not None:
            return self._count_pages_fn()
        return self.pages.count()

    def count_links(self) -> int:
        if self._count_links_fn is not None:
            return self._count_links_fn()
        return self.edges.count()

    # -- J5 (X7 JSON shaping) ---------------------------------------------
    def page_composite(self, page_id: str) -> Optional[dict]:
        """``/page/:id``: node + links-from, the ``OutputJSON`` shape
        (main.go:41-48,111-117)."""
        node = self.get_page(page_id)
        if node is None:
            return None
        return {"node": node, "links": self.get_links_from(page_id)}


def serve(api: LinkApi, host: str = "127.0.0.1", port: int = 0):
    """Start a threading HTTP server for *api*; returns the live
    ``ThreadingHTTPServer`` (``.server_address`` carries the bound
    port; call ``.shutdown()`` to stop).  Handlers run Spark actions
    on the caller's SparkSession — use ``spark.sparkContext
    .setLocalProperty`` FAIR pools if serving concurrently with batch
    work."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class _Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence per-request stderr noise
            pass

        def _json(self, obj, status: int = 200) -> None:
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _text(self, s: str, status: int = 200) -> None:
            body = s.encode()
            self.send_response(status)
            self.send_header("Content-Type", "text/plain; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib handler name)
            parts = [p for p in self.path.split("?")[0].split("/") if p]
            try:
                if not parts:
                    return self._text(WELCOME)
                if parts[0] == "ui":
                    # S11 graph UI (static/graph.html): the force-graph
                    # frontend rebuilt dependency-free — reference
                    # frontend/index.html
                    p = os.path.join(os.path.dirname(
                        os.path.abspath(__file__)), "static", "graph.html")
                    with open(p, "rb") as fh:
                        body = fh.read()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return None
                if parts[0] == "page" and len(parts) == 2:
                    out = api.page_composite(parts[1])
                    if out is None:
                        return self._text(f"Nothing found for {parts[1]}",
                                          404)
                    return self._json(out)
                if parts[0] == "pages" and len(parts) == 2:
                    return self._json(api.get_page_hashes_from_host(parts[1]))
                if parts[0] == "linksFrom" and len(parts) == 2:
                    return self._json(api.get_links_from(parts[1]))
                if parts[0] == "linksTo" and len(parts) == 2:
                    return self._json(api.get_links_to(parts[1]))
                if parts[0] == "countLinks":
                    return self._json({"countLinks": api.count_links()})
                if parts[0] == "countPages":
                    return self._json({"countPages": api.count_pages()})
                return self._text("not found", 404)
            except Exception as e:  # 500, like the reference handlers
                return self._text(f"Something wrong with the store? {e}",
                                  500)

    srv = ThreadingHTTPServer((host, port), _Handler)
    import threading

    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv
