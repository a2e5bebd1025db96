"""Deterministic synthetic-web fixtures (FIXTURES.md, seed=42).

Generates the crawl-specific tables the pytest suite consumes:

* ``web_documents``  — one row per fetchable page; ``spans`` is the
  interleaved text+media document (BASELINE.json input_hint shape:
  doc_id:string, spans:array<struct<kind,text,media_ref,offset:int32>>).
  Link-bearing spans replace live HTML ``a[href]`` scraping
  (/root/reference/pkg/linkprocessor/linkprocessor.go:136-166).
* ``page_urls``      — canonical URL + content_type + fetch_ok per page.
* ``seeds``          — ordered crawl entry points (reference seed order
  matters: cmd/link-processor/main.go:57-82).
* ``host_budgets``   — per-host politeness budget parameter.
* ``robots_rules``   — broadcast allow/disallow prefix rules.

Pure Python + pyarrow (no Spark): deterministic for a given seed, and
usable by the reference-oracle simulator without a JVM.
"""

from __future__ import annotations

import posixpath
import random

import pyarrow as pa
import pyarrow.parquet as pq

from .canon import page_id_of

SPAN_TYPE = pa.list_(
    pa.struct([
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ])
)

MALFORMED_HREFS = [
    "http://exa mple.com/x.html",
    "http://a.com/%zz",
    "http://[::bad/x.html",
    "ht tp://x.com/y.html",
    '<script>"',
]

FILTERED_HREFS = [
    "ftp://files.example.org/a.html",
    "https://t.co/xyz",
    "mailto:someone@example.org",
    "javascript:void(0)",
]

ANCHORS = ["", "click here", "更多信息 ✓", "Ünïcödé anchor", "a" * 50,
           "next →", "read\tmore"]

DIRS = ["news", "blog", "docs", "wiki", "a/b"]


def _host_weights(n_hosts: int) -> list[float]:
    # Zipf-ish: 2 hot hosts hold ~50% of pages (exercises skew salting).
    w = [0.30, 0.20] + [0.5 / (n_hosts - 2)] * (n_hosts - 2)
    return w


def generate_fixtures(out_dir: str, seed: int = 42, n_pages: int = 500,
                      n_hosts: int = 20) -> dict:
    rng = random.Random(seed)
    hosts = [f"host{i:02d}.example.org" for i in range(n_hosts)]
    weights = _host_weights(n_hosts)

    # ---- pages ---------------------------------------------------------
    pages: dict[str, dict] = {}  # page_id -> record
    page_list: list[dict] = []
    for i in range(n_pages):
        host = rng.choices(hosts, weights)[0]
        ndirs = rng.choice([0, 0, 1, 1, 2])
        dirs = rng.sample(DIRS, k=ndirs) if ndirs else []
        ext = rng.choices([".html", ".htm", ""], [0.60, 0.15, 0.25])[0]
        path = "/" + "/".join([*dirs, f"p{i:03d}{ext}"])
        # rule-bearing hosts get a /private subtree (robots coverage);
        # /private/news on hosts[0] is re-allowed by a longer rule.
        if host in hosts[:4] and rng.random() < 0.18:
            path = "/private" + path
        pid = page_id_of(host, path)
        if pid in pages:
            continue
        scheme = rng.choices(["https", "http"], [0.7, 0.3])[0]
        url = f"{scheme}://{host}{path}"
        if rng.random() < 0.05:
            url += "?sid=9&b=1"
        elif rng.random() < 0.03:
            url += "#sec"
        r = rng.random()
        if r < 0.88:
            ctype = "text/html"
        elif r < 0.93:
            ctype = "text/html; charset=utf-8"
        elif r < 0.96:
            ctype = "application/xhtml+xml"
        elif r < 0.98:
            ctype = "application/pdf"
        else:
            ctype = "image/png"
        rec = dict(page_id=pid, url=url, host=host, path=path,
                   content_type=ctype, fetch_ok=rng.random() > 0.05)
        pages[pid] = rec
        page_list.append(rec)

    # ---- spans / links -------------------------------------------------
    page_weights = [3.0 if p["host"] in hosts[:2] else 1.0 for p in page_list]
    docs = []
    for p in page_list:
        spans = []
        offset = 0

        def put(kind, text="", media_ref=""):
            nonlocal offset
            spans.append(dict(kind=kind, text=text, media_ref=media_ref,
                              offset=offset))
            offset += rng.randint(1, 40)

        put("text", text=f"Welcome to {p['path']} on {p['host']}.")
        out_deg = rng.randint(0, 30)
        for j in range(out_deg):
            r = rng.random()
            if r < 0.75:
                tgt = rng.choices(page_list, page_weights)[0]
                style = rng.random()
                if style < 0.55:
                    href = tgt["url"]
                elif style < 0.70:
                    # same page_id, different scheme/query/fragment
                    base = tgt["url"].split("?")[0].split("#")[0]
                    base = base.replace("https://", "http://") if rng.random() < 0.5 else base
                    href = base + rng.choice(["?ref=feed&x=1", "#frag", "?z=2"])
                elif style < 0.85:
                    href = tgt["path"]  # root-relative
                else:
                    # dot-relative against this page's directory
                    start = posixpath.dirname(p["path"]) or "/"
                    rel = posixpath.relpath(tgt["path"], start)
                    href = rel
            elif r < 0.80:
                href = rng.choice(MALFORMED_HREFS)
            elif r < 0.85:
                host = p["host"]
                href = rng.choice(FILTERED_HREFS + [
                    f"https://{host}/img{j}.png",
                    f"https://{host}/file{j}.pdf",
                    f"https://pbs.twimg.com/media/x{j}.html",
                ])
            else:
                # admissible but offsite/dead (no doc behind it)
                href = f"https://offsite{j % 7:01d}.example.net/page{j}.html"
            put("link", text=rng.choice(ANCHORS), media_ref=href)
            if rng.random() < 0.15:
                put("image", media_ref=f"img://{p['page_id'][:8]}/{j}.jpg")
            elif rng.random() < 0.05:
                put("video", media_ref=f"vid://{p['page_id'][:8]}/{j}.mp4")
        put("text", text="Footer.")
        docs.append(dict(doc_id=p["page_id"], spans=spans))

    # ---- seeds ---------------------------------------------------------
    seed_pages = rng.sample(page_list, k=10)
    seed_rows = []
    for k, sp in enumerate(seed_pages):
        u = sp["url"]
        if k == 1:
            u = "  " + u + " \n"        # tests TrimSpace (linkutils.go:76)
        seed_rows.append(dict(seq=k, url=u))
    # an inadmissible seed (dropped like ParseURL, linkutils.go:81)
    seed_rows.append(dict(seq=len(seed_rows), url="ftp://seed.example.org/x.html"))
    # a duplicate of seed 0 under a different scheme+query → same page_id
    dup = seed_pages[0]["url"].split("?")[0].split("#")[0]
    dup = ("http://" + dup.split("://", 1)[1]) + "?utm=dup"
    seed_rows.append(dict(seq=len(seed_rows), url=dup))

    # ---- budgets / robots ---------------------------------------------
    budget_rows = [dict(host=h, max_pages_per_wave=1000) for h in hosts]
    robots_rows = []
    for h in hosts[:4]:
        robots_rows.append(dict(host=h, rule_type="disallow",
                                path_prefix="/private", crawl_delay=1.0))
        robots_rows.append(dict(host=h, rule_type="allow",
                                path_prefix="/", crawl_delay=1.0))
    # longest-match override: /private/news re-allowed on hosts[0]
    robots_rows.append(dict(host=hosts[0], rule_type="allow",
                            path_prefix="/private/news", crawl_delay=1.0))

    # ---- write ---------------------------------------------------------
    pq.write_table(
        pa.table({
            "doc_id": pa.array([d["doc_id"] for d in docs]),
            "spans": pa.array([d["spans"] for d in docs], type=SPAN_TYPE),
        }),
        f"{out_dir}/web_documents.parquet",
    )
    pq.write_table(pa.table({k: [p[k] for p in page_list] for k in
                             ("page_id", "url", "host", "path",
                              "content_type", "fetch_ok")}),
                   f"{out_dir}/page_urls.parquet")
    pq.write_table(
        pa.table({"seq": pa.array([s["seq"] for s in seed_rows], pa.int32()),
                  "url": [s["url"] for s in seed_rows]}),
        f"{out_dir}/seeds.parquet")
    pq.write_table(
        pa.table({"host": [b["host"] for b in budget_rows],
                  "max_pages_per_wave": pa.array(
                      [b["max_pages_per_wave"] for b in budget_rows], pa.int32())}),
        f"{out_dir}/host_budgets.parquet")
    pq.write_table(
        pa.table({"host": [r["host"] for r in robots_rows],
                  "rule_type": [r["rule_type"] for r in robots_rows],
                  "path_prefix": [r["path_prefix"] for r in robots_rows],
                  "crawl_delay": pa.array([r["crawl_delay"] for r in robots_rows],
                                          pa.float64())}),
        f"{out_dir}/robots_rules.parquet")

    return dict(n_pages=len(page_list), n_docs=len(docs),
                n_seeds=len(seed_rows), hosts=hosts)


def load_web_py(fixture_dir: str) -> dict:
    """Load the fixture web for the pure-Python oracle: returns
    {page_id: {url, host, path, content_type, fetch_ok, spans}}."""
    pages = pq.read_table(f"{fixture_dir}/page_urls.parquet").to_pylist()
    docs = {d["doc_id"]: d["spans"]
            for d in pq.read_table(f"{fixture_dir}/web_documents.parquet").to_pylist()}
    web = {}
    for p in pages:
        p["spans"] = docs.get(p["page_id"], [])
        web[p["page_id"]] = p
    return web


def load_seeds_py(fixture_dir: str) -> list[dict]:
    return sorted(pq.read_table(f"{fixture_dir}/seeds.parquet").to_pylist(),
                  key=lambda r: r["seq"])


def load_budgets_py(fixture_dir: str) -> dict[str, int]:
    return {r["host"]: r["max_pages_per_wave"]
            for r in pq.read_table(f"{fixture_dir}/host_budgets.parquet").to_pylist()}
