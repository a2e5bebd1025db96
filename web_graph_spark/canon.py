"""URL canonicalization and page identity.

Reproduces the reference's URL semantics (see /root/reference):

* identity      : ``page_id = sha1(hostname + escaped_path).hex()``
                  (pkg/linkutils/linkutils.go:66-71).  The hash excludes
                  scheme, port, query string and fragment — that IS the
                  reference's canonicalization: ``http://x.com/a?q=1#f``
                  and ``https://x.com/a`` are the same page.
* admission     : scheme ∈ {http, https} (linkutils.go:17-21),
                  host+port ∉ {t.co, pbs.twimg.com} (linkutils.go:22-26),
                  ext(escaped_path) ∈ {.html, .htm, ""} with Go
                  ``filepath.Ext`` semantics (linkutils.go:41-50).
* parse         : TrimSpace → parse → admission (linkutils.go:75-85);
                  malformed URLs are skipped (linkqueue.go:55-60).
* resolution    : relative hrefs resolved against the base page URL
                  iff the href has no scheme (linkprocessor.go:151-153).

The module has three consumers that MUST agree bit-for-bit:

1. :func:`canonicalize` — the pure-Python scalar function, used by the
   reference-oracle simulator (tests) and by the pandas UDF;
2. :func:`canonicalize_udf` — a vectorized pandas/Arrow UDF wrapping (1)
   (the exact path; handles %-escapes, unicode, relative resolution);
3. :func:`with_canonical_sql` — a pure Spark-SQL (JVM codegen, no
   Python) fast path for *simple* URLs, used on the 100 TB hot path.
   ``simple`` = ASCII, absolute, already-escaped, no userinfo.  The
   two paths are equality-tested against each other on the simple
   subset (tests/test_canon.py), so the engine may route each row to
   either tier without changing results (see :func:`canonicalize_df`).

Documented deviations from Go (both oracle and engine use the same
rules, so engine↔oracle equality is unaffected):
* Go ``url.Parse`` rejects control characters and invalid %-escapes;
  Python's urlsplit does not.  We reject them explicitly
  (``_MALFORMED_RE``, ``_BAD_ESCAPE_RE``).
* Go ``EscapedPath`` re-encodes only invalid encodings; we
  percent-encode non-ASCII path bytes with Go's path-safe set
  (``_GO_PATH_SAFE``) and keep valid existing escapes as-given.
* ``url_norm`` sorts query params and strips the fragment
  (BASELINE.json north_star canonicalization); the reference's
  ``u.String()`` keeps both, but neither enters the identity hash.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator, Optional
from urllib.parse import quote, urljoin, urlsplit

import pandas as pd

SCHEMES_OK = ("http", "https")
# Exact Host match incl. port, per Go u.Host (linkutils.go:22-26,34-36).
DENY_HOSTS = ("t.co", "pbs.twimg.com")
EXT_OK = (".html", ".htm", "")

# Go shouldEscape(c, encodePath) keeps: unreserved + "$&+,/;:=@" + "!'()*".
_GO_PATH_SAFE = "/$&+,;:=@-._~!'()*"

# After TrimSpace, any embedded whitespace/control char or <>" is malformed
# (Go url.Parse rejects control chars; spaces in URLs are invalid).
_MALFORMED_RE = re.compile(r'[\x00-\x20<>"\x7f]')
# A '%' not followed by two hex digits is an invalid escape (Go rejects).
_BAD_ESCAPE_RE = re.compile(r"%(?![0-9A-Fa-f]{2})")

REJECT_MALFORMED = "malformed"
REJECT_SCHEME = "scheme"
REJECT_DENYLIST = "denylist"
REJECT_FILETYPE = "filetype"


def path_ext(path: str) -> str:
    """Go ``filepath.Ext``: suffix from the final dot of the final
    path element, empty if none (linkutils.go:42).  ``/a/b.c/d`` → ``""``.
    """
    seg = path.rsplit("/", 1)[-1]
    i = seg.rfind(".")
    return seg[i:] if i >= 0 else ""


def escape_path(path: str) -> str:
    """Approximate Go ``(*url.URL).EscapedPath``: keep valid existing
    %-escapes, percent-encode bytes outside Go's path-safe set."""
    if not path:
        return path
    # quote() with '%' in safe keeps existing escapes untouched.
    return quote(path, safe=_GO_PATH_SAFE + "%")


def page_id_of(hostname: str, escaped_path: str) -> str:
    """sha1(hostname + escaped_path) hex — linkutils.go:66-71."""
    return hashlib.sha1((hostname + escaped_path).encode("utf-8")).hexdigest()


def canonicalize(raw: Optional[str], base: Optional[str] = None) -> Optional[dict]:
    """Parse + resolve + admission-check one URL.

    Returns None for malformed input (skip, like linkqueue.go:55-60);
    otherwise a dict with keys: scheme, host (lowercase hostname, no
    port), host_port, path (escaped), url_norm, page_id, admissible
    (bool), reject_reason (None | scheme|denylist|filetype).
    """
    if raw is None:
        return None
    s = raw.strip()
    if not s or _MALFORMED_RE.search(s) or _BAD_ESCAPE_RE.search(s):
        return None
    try:
        parts = urlsplit(s)
        # Relative URL: resolve against base iff no scheme
        # (Go IsAbs() == scheme != "", linkprocessor.go:151-153).
        if not parts.scheme:
            if not base:
                return None
            s = urljoin(base.strip(), s)
            parts = urlsplit(s)
        hostname = parts.hostname  # lowercased, port stripped
    except ValueError:
        return None
    if hostname is None:
        hostname = ""
    scheme = parts.scheme.lower()
    host_port = parts.netloc.lower()
    # strip userinfo from host_port for the denylist check (Go's Host
    # field excludes userinfo).
    if "@" in host_port:
        host_port = host_port.rsplit("@", 1)[-1]
    epath = escape_path(parts.path)

    reject = None
    if scheme not in SCHEMES_OK:
        reject = REJECT_SCHEME
    elif host_port in DENY_HOSTS:
        reject = REJECT_DENYLIST
    elif path_ext(epath) not in EXT_OK:
        reject = REJECT_FILETYPE

    query = parts.query
    if query:
        # north_star canonicalization: sort query params; keep them out
        # of the identity (they never enter the hash anyway).
        query = "&".join(sorted(query.split("&")))
    url_norm = f"{scheme}://{host_port}{epath}" + (f"?{query}" if query else "")

    return {
        "scheme": scheme,
        "host": hostname,
        "host_port": host_port,
        "path": epath,
        "url_norm": url_norm,
        "page_id": page_id_of(hostname, epath),
        "admissible": reject is None,
        "reject_reason": reject,
    }


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

CANON_FIELDS = (
    "scheme", "host", "host_port", "path", "url_norm", "page_id",
    "admissible", "reject_reason",
)

CANON_STRUCT_DDL = (
    "scheme string, host string, host_port string, path string, "
    "url_norm string, page_id string, admissible boolean, "
    "reject_reason string"
)


def _canon_batch(urls: pd.Series, bases: Optional[pd.Series] = None) -> pd.DataFrame:
    out = []
    if bases is None:
        for u in urls:
            out.append(canonicalize(u))
    else:
        for u, b in zip(urls, bases):
            out.append(canonicalize(u, b))
    none_row = {k: None for k in CANON_FIELDS}
    return pd.DataFrame([r if r is not None else none_row for r in out],
                        columns=list(CANON_FIELDS))


def canonicalize_udf():
    """Vectorized pandas UDF: url string → canon struct (null = malformed)."""
    from pyspark.sql import functions as F

    @F.pandas_udf(CANON_STRUCT_DDL)
    def _udf(urls: pd.Series) -> pd.DataFrame:
        return _canon_batch(urls)

    return _udf


def canonicalize_resolve_udf():
    """(href, base_url) → canon struct, with relative-URL resolution."""
    from pyspark.sql import functions as F

    @F.pandas_udf(CANON_STRUCT_DDL)
    def _udf(hrefs: pd.Series, bases: pd.Series) -> pd.DataFrame:
        return _canon_batch(hrefs, bases)

    return _udf


# Simple-URL detector for the JVM fast path: absolute http(s), ASCII,
# no userinfo, no invalid escapes, no chars Go would re-escape in path.
_SIMPLE_URL_SQL_RE = (
    r"^[Hh][Tt][Tt][Pp][Ss]?://"             # scheme
    r"[A-Za-z0-9.\-]+(:[0-9]+)?"              # host[:port], no userinfo
    r"(/(?:[A-Za-z0-9/$&+,;:=@\-._~!'()*]|%[0-9A-Fa-f]{2})*)?"  # Go-safe path
    r"(\?(?:[\x21\x23-\x24\x26-\x3b=\x3f-\x7e]|%[0-9A-Fa-f]{2})*)?"  # query
    r"(#(?:[\x21\x23-\x24\x26-\x3b=\x3f-\x7e]|%[0-9A-Fa-f]{2})*)?$"  # fragment
)


def with_canonical_sql(df, url_col: str = "url", out_col: str = "canon"):
    """JVM-only canonicalizer for *simple* URLs — whole-stage-codegen
    fast path; no Python.  Produces the same struct as the pandas UDF
    (equality-tested on the simple subset).  Query-param sorting is the
    one piece built-ins can't express for arbitrary N; on this path we
    sort via array_sort(split(query,'&')) — identical to Python's
    lexicographic sort.
    """
    from pyspark.sql import functions as F

    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    host_port = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1))
    host = F.regexp_extract(host_port, r"^([^:]*)", 1)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"^[^?#]*\?([^#]*)", 1)
    seg = F.element_at(F.split(path, "/"), -1)
    ext = F.regexp_extract(seg, r"(\.[^.]*)$", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    reject = (
        F.when(~scheme.isin(*SCHEMES_OK), F.lit(REJECT_SCHEME))
        .when(host_port.isin(*DENY_HOSTS), F.lit(REJECT_DENYLIST))
        .when(~ext.isin(*EXT_OK), F.lit(REJECT_FILETYPE))
    )
    canon = F.when(
        u.rlike(_SIMPLE_URL_SQL_RE),
        F.struct(
            scheme.alias("scheme"),
            host.alias("host"),
            host_port.alias("host_port"),
            path.alias("path"),
            F.concat(
                scheme, F.lit("://"), host_port, path,
                F.when(query != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
            ).alias("url_norm"),
            F.sha1(F.concat(host, path)).alias("page_id"),
            reject.isNull().alias("admissible"),
            reject.alias("reject_reason"),
        ),
    )
    return df.withColumn(out_col, canon)


def canonicalize_df(df, url_col: str = "url", out_col: str = "canon",
                    mode: str = "auto"):
    """Canonicalize a column of raw absolute URLs.

    mode='sql'    : JVM fast path only (rows failing the simple-URL
                    pattern get a null struct — caller must know input
                    is simple, e.g. engine-generated frontiers).
    mode='pandas' : exact path only (handles everything).
    mode='auto'   : two-tier — JVM codegen for simple URLs, Arrow UDF
                    only for the remainder (explicit filter-split +
                    union: a `when(simple, sql).otherwise(udf)` would
                    NOT short-circuit — Spark's ExtractPythonUDFs pulls
                    the UDF into its own ArrowEvalPython node and runs
                    it for every row, making the conditional the worst
                    of both tiers).  Output row order is not preserved.
                    The source plan is evaluated twice (one branch per
                    tier), so the input must be DETERMINISTIC — with a
                    nondeterministic upstream column rows could migrate
                    between branches and be duplicated or dropped;
                    persist/localCheckpoint such inputs first.
    """
    from pyspark.sql import functions as F

    if mode == "sql":
        return with_canonical_sql(df, url_col, out_col)
    if mode == "pandas":
        return df.withColumn(out_col, canonicalize_udf()(F.col(url_col)))
    sql_part = with_canonical_sql(df, url_col, out_col)
    simple = sql_part.filter(F.col(out_col).isNotNull())
    rest = (sql_part.filter(F.col(out_col).isNull()).drop(out_col)
            .withColumn(out_col, canonicalize_udf()(F.col(url_col))))
    return simple.unionByName(rest)


def trim_ws(s: Optional[str]) -> Optional[str]:
    """Go strings.TrimSpace equivalent (unicode whitespace)."""
    return s.strip() if s is not None else None


def to_valid_utf8(s: Optional[str]) -> Optional[str]:
    """Go strings.ToValidUTF8(s, "") — drop invalid sequences
    (linkstorage.go:408).  Python strs are already valid; this guards
    surrogate-escape lookalikes coming off raw bytes."""
    if s is None:
        return None
    return s.encode("utf-8", "ignore").decode("utf-8", "ignore")


def trap_stats(df, host_col: str = "host", path_col: str = "path",
               threshold_bp: int = 500_000):
    """Crawler-trap detection per host: the classic signal is a host
    whose distinct-path count explodes while its path STRUCTURE stays
    tiny (calendar pages, session ids, faceted-search permutations —
    infinite URLs, finite templates).  Template = path with every
    digit run collapsed to ``N``; a high paths-per-template ratio
    flags the host for frontier capping before it eats the crawl
    budget (the reference has no such guard — its frontier would walk
    a calendar forever; this is the scale hardening a 10^10 frontier
    needs).

    Output per host: ``n_paths``, ``n_templates``,
    ``paths_per_template_bp`` (floor(n_paths·10⁴/n_templates)) and
    ``trap_suspect``.  Physical shape: one distinct on the uniform
    (host, path) composite key, then a per-host agg with partial
    (map-side) combines — two shuffles total, no skew (path sha
    spreads hot hosts), exact-SQL-oracle comparable."""
    from pyspark.sql import functions as F

    t = df.select(F.col(host_col).alias("host"),
                  F.col(path_col).alias("path")).distinct()
    tpl = F.regexp_replace("path", "[0-9]+", "N")
    agg = (t.groupBy("host")
           .agg(F.countDistinct("path").alias("n_paths"),
                F.countDistinct(tpl).alias("n_templates")))
    bp = F.floor(F.col("n_paths") * 10000 / F.col("n_templates")) \
        .cast("long")
    return agg.select(
        "host", F.col("n_paths").cast("long").alias("n_paths"),
        F.col("n_templates").cast("long").alias("n_templates"),
        bp.alias("paths_per_template_bp"),
        (bp >= threshold_bp).alias("trap_suspect"))


def registrable_domain(df, rules, host_col: str = "host"):
    """(host, public_suffix, registrable) — public-suffix-list
    evaluation: the eTLD+1 rollup every large crawler keys politeness,
    reputation, and per-site quotas on (publicsuffix.org semantics;
    the reference stores raw hostnames, linkutils.go:66-71 — at 10^8
    hosts the registrable-domain grain is what budget tables key on).

    ``rules`` is a (rule, typ) relation with publicsuffix.org's three
    rule kinds: typ 0 = normal rule ("example.test"), typ 1 = wildcard
    ("*.ck" stored as its base "ck" — any single label under the base
    is a public suffix), typ 2 = exception ("!www.ck" stored as
    "www.ck" — overrides a covering wildcard; the suffix is the rule's
    parent).  Matching follows the PSL algorithm: exception rules win
    outright, otherwise the match with the MOST labels wins, and a
    host matching no rule falls back to the implicit "*" rule (suffix
    = last label).  A host that IS a public suffix has NULL
    registrable domain.

    Physical shape: hosts are deduped once, each explodes into its ≤L
    label-suffix candidates (L = label count, ~4 — bounded, not
    data-dependent), candidates equi-join the BROADCAST rules dim (the
    real PSL is ~10k rows — genuinely broadcastable, unlike the
    per-host dims this repo shuffles), and the winner is one
    map-side-combinable max(struct(priority, n_labels, suffix))
    agg — no window, no skew (candidates key on the host)."""
    from pyspark.sql import functions as F

    base = (df.select(F.col(host_col).alias("__h")).distinct()
            .select("__h", F.split("__h", r"\.").alias("__ls"))
            .select("__h", "__ls", F.size("__ls").alias("__L")))
    # candidate i (0-based) = labels i..L-1 joined; parent drops one
    cand = base.select(
        "__h", "__L",
        F.posexplode(F.expr(
            "transform(__ls, (x, i) -> struct("
            "array_join(slice(__ls, i + 1, size(__ls) - i), '.') "
            "AS cand, "
            "array_join(slice(__ls, i + 2, size(__ls) - i - 1), '.') "
            "AS parent))")).alias("__i", "__c")
    ).select("__h", "__L", "__i", F.col("__c.cand").alias("__cand"),
             F.col("__c.parent").alias("__parent"))
    r = rules.select(F.col("rule").alias("__rule"),
                     F.col("typ").alias("__typ"))
    norm = (cand.join(F.broadcast(r.filter(F.col("__typ") == 0)),
                      F.col("__cand") == F.col("__rule"))
            .select("__h", F.lit(0).alias("__prio"),
                    (F.col("__L") - F.col("__i")).alias("__eff"),
                    F.col("__cand").alias("__suffix")))
    wild = (cand.join(F.broadcast(r.filter(F.col("__typ") == 1)),
                      F.col("__parent") == F.col("__rule"))
            .select("__h", F.lit(0).alias("__prio"),
                    (F.col("__L") - F.col("__i")).alias("__eff"),
                    F.col("__cand").alias("__suffix")))
    exc = (cand.join(F.broadcast(r.filter(F.col("__typ") == 2)),
                     F.col("__cand") == F.col("__rule"))
           .select("__h", F.lit(1).alias("__prio"),
                   (F.col("__L") - F.col("__i") - 1).alias("__eff"),
                   F.col("__parent").alias("__suffix")))
    best = (norm.unionByName(wild).unionByName(exc)
            .groupBy("__h")
            .agg(F.max(F.struct("__prio", "__eff", "__suffix"))
                 .alias("__b"))
            .select("__h", F.col("__b.__eff").alias("__eff"),
                    F.col("__b.__suffix").alias("__suffix")))
    out = (base.join(best, "__h", "left")
           .select(
               "__h", "__ls", "__L",
               F.coalesce(F.col("__eff"), F.lit(1)).alias("__eff"),
               F.coalesce(F.col("__suffix"),
                          F.element_at("__ls", -1)).alias("__suffix")))
    reg = F.when(
        F.col("__L") > F.col("__eff"),
        F.array_join(F.slice(F.col("__ls"),
                             F.col("__L") - F.col("__eff"),
                             F.col("__eff") + 1), "."))
    return out.select(F.col("__h").alias(host_col),
                      F.col("__suffix").alias("public_suffix"),
                      reg.alias("registrable"))


# Tracking/click-id query parameters that create URL aliases without
# changing content — the standard strip set (utm_* = Google Analytics
# campaign tags; the rest are per-platform click ids / referral tags).
TRACKING_PARAM_RE = (r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_cid"
                     r"|mc_eid|igshid|ref|ref_src)$")


def strip_tracking_params(url, keys_pattern: str = TRACKING_PARAM_RE):
    """Column: ``url`` with tracking query parameters removed — the
    alias-collapsing canonicalization a frontier applies so
    ``?utm_source=news`` variants of one page don't crawl (and store)
    N times.  Keys are matched case-insensitively against
    ``keys_pattern`` (anchored); surviving params re-sort (the same
    order rule as ``url_norm``); the fragment drops; a query left
    empty loses its ``?``.  Pure JVM regexp + higher-order array
    functions — scan-bound, no Python, no shuffle."""
    from pyspark.sql import functions as F

    u = F.col(url) if isinstance(url, str) else url
    base = F.regexp_extract(u, r"^([^?#]*)", 1)
    query = F.regexp_extract(u, r"^[^?#]*\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~F.lower(
            F.element_at(F.split(x, "="), 1)).rlike(keys_pattern))
    q2 = F.array_join(F.array_sort(kept), "&")
    return F.when(q2 == "", base).otherwise(
        F.concat(base, F.lit("?"), q2))
