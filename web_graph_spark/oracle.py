"""Pure-Python reference-crawl simulator (the test oracle).

Implements the *logical* behavior of the Go reference crawler
(/root/reference/cmd/link-processor/main.go:208-224 select loop +
pkg/linkprocessor/linkprocessor.go:172-216 ProcessURL), deconflicted
from its 2-worker races by the BFS-wave ordering spec (SURVEY.md §3.1),
over the synthetic web fixtures.  The Spark engine must produce
bit-identical pages / edges / seen / crawl-order / span outputs.

Logical spec (shared with crawler.py — keep in sync):

* canonicalization & admission: canon.canonicalize (linkutils.go).
* wave 0: seeds in seq order → canonicalize → drop malformed or
  inadmissible (ParseURL, linkutils.go:75-85) → dedupe by page_id
  (first seed wins) → frontier rows seq = 0,1,2,…
* each wave W: schedule per host the `budget[host]` lowest-seq pending
  frontier rows (reference has no budget ⇒ default ∞; the budget is the
  north_star politeness parameter); the rest carry over, keeping seq.
* scheduled rows processed in seq order; for each row:
    - mark seen; append (W, seq, page_id) to crawl_order;
    - page row for the crawled page if absent (pageBatcher.Put,
      linkprocessor.go:185; first write wins ≡ ON CONFLICT DO NOTHING,
      linkstorage.go:493);
    - expand iff the page exists in the web, fetch_ok, and
      content_type before ';' ∈ {text/html, application/xhtml+xml}
      (HappyResponse, linkutils.go:53-63);
    - for each link span in offset order (goquery document order,
      linkprocessor.go:136-166): trim href → canonicalize with the
      frontier row's url as base → skip malformed; skip inadmissible
      (ScrapeDaTing at :155);
      · edge (from, to, valid-utf8 text) — first (from,to) wins;
      · if target ∉ seen ∪ frontier ∪ scheduled-this-wave: page row if
        absent + enqueue with seq = next_seq++, depth = parent+1.
* stop when frontier empty or wave budget exhausted.

Event-order identity used by both sides for "first write wins":
crawl-write of scheduled seq s   → key (W, s, 0, 0)
discovery via link j of parent s → key (W, s, 1, j)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .canon import canonicalize, to_valid_utf8

HTML_CTYPES = ("text/html", "application/xhtml+xml")


def content_type_ok(ctype: str | None) -> bool:
    if ctype is None:
        return False
    return ctype.split(";")[0] in HTML_CTYPES


@dataclass
class CrawlResult:
    crawl_order: list[tuple[int, int, str]] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    pages: dict[str, tuple[str, str, str]] = field(default_factory=dict)
    # (from,to) -> text
    edges: dict[tuple[str, str], str] = field(default_factory=dict)
    # doc_id -> spans (as emitted for expanded pages)
    docs: dict[str, list[dict]] = field(default_factory=dict)
    waves: int = 0


def simulate_crawl(web: dict, seeds: list[dict],
                   budgets: dict[str, int] | None = None,
                   default_budget: int = 1 << 60,
                   max_waves: int = 100,
                   robots: dict | None = None,
                   max_wave_urls: int | None = None) -> CrawlResult:
    """web: {page_id: {url, host, path, content_type, fetch_ok, spans}};
    seeds: [{seq, url}] sorted by seq; robots: CompiledRules (evaluated
    at schedule time — disallowed rows leave the frontier, join the
    seen set, and are never fetched; rule set may change between waves).
    max_wave_urls: global per-wave admission cap — after the per-host
    budget cut, only the ``max_wave_urls`` lowest-seq rows are crawled
    this wave; the rest stay pending with seq unchanged (the engine's
    ``SparkCrawler(max_wave_urls=)`` / ``take_global`` semantics)."""
    from .operators.robots import allowed_py

    budgets = budgets or {}
    res = CrawlResult()
    frontier: dict[str, dict] = {}  # page_id -> row(seq,url,host,path,depth)
    next_seq = 0

    for s in seeds:
        c = canonicalize(s["url"])
        if c is None or not c["admissible"]:
            continue
        pid = c["page_id"]
        if pid in frontier:
            continue
        frontier[pid] = dict(seq=next_seq, url=c["url_norm"], host=c["host"],
                             path=c["path"], depth=0)
        next_seq += 1

    for wave in range(max_waves):
        if not frontier:
            break
        res.waves = wave + 1
        if robots:
            blocked = [pid for pid, row in frontier.items()
                       if not allowed_py(robots, row["host"], row["path"])]
            for pid in blocked:
                res.seen.add(pid)
                del frontier[pid]
        # politeness scheduling: per host, lowest-seq `budget` rows
        by_host: dict[str, list[tuple[str, dict]]] = {}
        for pid, row in frontier.items():
            by_host.setdefault(row["host"], []).append((pid, row))
        scheduled: list[tuple[str, dict]] = []
        for host, rows in by_host.items():
            rows.sort(key=lambda pr: pr[1]["seq"])
            b = budgets.get(host, default_budget)
            scheduled.extend(rows[:b])
        scheduled.sort(key=lambda pr: pr[1]["seq"])
        if max_wave_urls is not None:
            scheduled = scheduled[:max_wave_urls]
        scheduled_ids = {pid for pid, _ in scheduled}
        for pid, _ in scheduled:
            del frontier[pid]

        for pid, row in scheduled:
            res.seen.add(pid)
            res.crawl_order.append((wave, row["seq"], pid))
            if pid not in res.pages:
                res.pages[pid] = (row["host"], row["path"], row["url"])
            page = web.get(pid)
            if page is None or not page["fetch_ok"] \
                    or not content_type_ok(page["content_type"]):
                continue
            spans = sorted(page["spans"], key=lambda sp: sp["offset"])
            res.docs[pid] = spans
            for j, sp in enumerate(s for s in spans if s["kind"] == "link"):
                c = canonicalize(sp["media_ref"], base=row["url"])
                if c is None or not c["admissible"]:
                    continue
                tid = c["page_id"]
                key = (pid, tid)
                if key not in res.edges:
                    res.edges[key] = to_valid_utf8(sp["text"]) or ""
                if tid in res.seen or tid in frontier or tid in scheduled_ids:
                    continue
                if tid not in res.pages:
                    res.pages[tid] = (c["host"], c["path"], c["url_norm"])
                frontier[tid] = dict(seq=next_seq, url=c["url_norm"],
                                     host=c["host"], path=c["path"],
                                     depth=row["depth"] + 1)
                next_seq += 1
    return res
