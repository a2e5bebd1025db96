"""Canonicalizer golden vectors + SQL-tier/pandas-tier equality.

Pins the identity `page_id = sha1(hostname + escaped_path)` and the
admission filters F1-F3 to the reference semantics
(/root/reference/pkg/linkutils/linkutils.go:17-71).
"""

from __future__ import annotations

import hashlib

import pytest

from web_graph_spark import canon


def sha1(s: str) -> str:
    return hashlib.sha1(s.encode()).hexdigest()


# (raw, base, expect) — expect None = malformed; else partial dict.
GOLDEN = [
    # plain admissible
    ("http://example.com/a.html", None,
     dict(host="example.com", path="/a.html", admissible=True,
          page_id=sha1("example.com/a.html"))),
    # scheme+query+fragment excluded from identity (README.md:28-30)
    ("https://Example.COM/a.html?b=2&a=1#frag", None,
     dict(host="example.com", path="/a.html", admissible=True,
          page_id=sha1("example.com/a.html"),
          url_norm="https://example.com/a.html?a=1&b=2")),
    # port excluded from identity (Hostname() strips it) but host_port
    # keeps it for the denylist check
    ("http://example.com:8080/a.html", None,
     dict(host="example.com", host_port="example.com:8080",
          page_id=sha1("example.com/a.html"), admissible=True)),
    # scheme filter F1
    ("ftp://example.com/a.html", None, dict(admissible=False, reject_reason="scheme")),
    ("mailto:bob@example.com", None, dict(admissible=False, reject_reason="scheme")),
    ("javascript:void(0)", None, dict(admissible=False, reject_reason="scheme")),
    # denylist F2 — exact Host incl. port
    ("https://t.co/Abc", None, dict(admissible=False, reject_reason="denylist")),
    ("https://pbs.twimg.com/x", None, dict(admissible=False, reject_reason="denylist")),
    ("https://t.co:443/Abc", None, dict(admissible=True)),  # port ≠ exact match
    # file-type filter F3 (Go filepath.Ext semantics)
    ("http://a.com/x.png", None, dict(admissible=False, reject_reason="filetype")),
    ("http://a.com/x.pdf", None, dict(admissible=False, reject_reason="filetype")),
    ("http://a.com/x.HTML", None, dict(admissible=False, reject_reason="filetype")),  # case-sensitive
    ("http://a.com/x.htm", None, dict(admissible=True)),
    ("http://a.com/dir.d/x", None, dict(admissible=True)),   # ext of final segment only
    ("http://a.com/", None, dict(admissible=True, path="/", page_id=sha1("a.com/"))),
    ("http://a.com", None, dict(admissible=True, path="", page_id=sha1("a.com"))),
    ("http://a.com/x.", None, dict(admissible=False, reject_reason="filetype")),  # Ext == "."
    # whitespace trim (linkutils.go:76)
    ("  http://a.com/x.html \n", None, dict(page_id=sha1("a.com/x.html"), admissible=True)),
    # malformed (linkqueue.go:55-60 skip)
    ("http://a.com/with space.html", None, None),
    ("http://a.com/%zz", None, None),
    ("", None, None),
    (None, None, None),
    # relative resolution against base (linkprocessor.go:151-153)
    ("b.html", "http://a.com/dir/a.html", dict(page_id=sha1("a.com/dir/b.html"), admissible=True)),
    ("/root.html", "http://a.com/dir/a.html", dict(page_id=sha1("a.com/root.html"))),
    ("../up.html", "http://a.com/d1/d2/a.html", dict(page_id=sha1("a.com/d1/up.html"))),
    ("//other.com/x.html", "https://a.com/a.html",
     dict(host="other.com", scheme="https", admissible=True)),
    ("?only=query", "http://a.com/a.html", dict(page_id=sha1("a.com/a.html"))),
    # absolute href ignores base (IsAbs → no resolution)
    ("http://b.com/x.html", "http://a.com/", dict(host="b.com")),
    # relative href with no base available
    ("b.html", None, None),
    # unicode path percent-encoded into identity
    ("http://a.com/café", None, dict(path="/caf%C3%A9", page_id=sha1("a.com/caf%C3%A9"))),
    # trailing-dot host preserved
    ("http://a.com./x.html", None, dict(host="a.com.")),
]


@pytest.mark.parametrize("raw,base,expect", GOLDEN)
def test_golden(raw, base, expect):
    got = canon.canonicalize(raw, base)
    if expect is None:
        assert got is None, got
    else:
        assert got is not None, (raw, base)
        for k, v in expect.items():
            assert got[k] == v, (raw, k, got[k], v)


def test_path_ext_go_semantics():
    # filepath.Ext parity table
    for p, e in [("/a/b.html", ".html"), ("/a/b.c/d", ""), ("/a.b/c.d", ".d"),
                 ("", ""), ("/", ""), ("/x.", "."), ("/.hidden", ".hidden"),
                 ("/a.tar.gz", ".gz")]:
        assert canon.path_ext(p) == e, p


def test_to_valid_utf8():
    assert canon.to_valid_utf8("ok✓") == "ok✓"
    bad = "a\udcffb"  # lone surrogate — encode(...,'ignore') drops it
    assert canon.to_valid_utf8(bad) == "ab"


@pytest.mark.spark
def test_sql_tier_matches_pandas_tier(spark):
    """Every simple URL must canonicalize identically on the JVM codegen
    tier and the exact pandas tier; non-simple URLs must route to pandas."""
    from pyspark.sql import functions as F

    urls = [r for (r, b, _) in GOLDEN if r and b is None] + [
        "http://host.com:81/p/q.html?z=1&a=2#f",
        "https://h.com/%41%2f.html",
        "http://h.com/a'()*.html",
        "HTTP://UPPER.COM/A.HTML",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    sql_rows = {r["url"]: r["c"] for r in
                canon.canonicalize_df(df, mode="sql").selectExpr("url", "canon as c").collect()}
    for u in urls:
        expect = canon.canonicalize(u)
        got = sql_rows[u]
        if got is None:
            continue  # not simple → pandas tier handles it; fine
        assert expect is not None, f"SQL tier accepted a URL python rejects: {u}"
        for k in canon.CANON_FIELDS:
            assert got[k] == expect[k], (u, k, got[k], expect[k])
    # auto mode must equal pure pandas everywhere
    auto = {r["url"]: r["c"] for r in
            canon.canonicalize_df(df, mode="auto").selectExpr("url", "canon as c").collect()}
    for u in urls:
        expect = canon.canonicalize(u)
        got = auto[u]
        if expect is None:
            assert got is None or got["page_id"] is None
        else:
            assert got is not None
            for k in canon.CANON_FIELDS:
                assert got[k] == expect[k], (u, k)


@pytest.mark.spark
def test_sql_tier_stays_in_jvm(spark):
    from web_graph_spark.plans import assert_no_python_udf

    df = spark.createDataFrame([("http://a.com/x.html",)], "url string")
    out = canon.canonicalize_df(df, mode="sql")
    assert_no_python_udf(out)


def test_hypothesis_canonicalize_total():
    """Property: canonicalize never throws on arbitrary input."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=80))
    def run(s):
        r = canon.canonicalize(s)
        if r is not None:
            assert isinstance(r["page_id"], str) and len(r["page_id"]) == 40

    run()


@pytest.mark.spark
def test_trap_stats_flags_template_explosion(spark):
    """A calendar-trap host (many digit-varying paths, one template)
    must flag; a structurally diverse host must not; ratio is exact
    integer bp."""
    from web_graph_spark.canon import trap_stats

    rows = [("trap.test", f"/cal/2026/08/{d}") for d in range(60)]
    rows += [("ok.test", p) for p in ("/about", "/blog/post-a", "/contact")]
    rows += [("trap.test", "/cal/2026/08/1")]          # dup path
    df = spark.createDataFrame(rows, "host string, path string")
    got = {r["host"]: r.asDict()
           for r in trap_stats(df, threshold_bp=100_000).collect()}
    assert got["trap.test"] == dict(
        host="trap.test", n_paths=60, n_templates=1,
        paths_per_template_bp=600000, trap_suspect=True)
    assert got["ok.test"]["n_templates"] == 3
    assert got["ok.test"]["trap_suspect"] is False


@pytest.mark.spark
def test_registrable_domain_psl_semantics(spark):
    """publicsuffix.org reference cases: longest normal rule wins,
    wildcard makes any single label under the base a suffix, an
    exception beats its covering wildcard, a bare suffix has NULL
    registrable, and an unlisted TLD falls back to the implicit '*'
    rule."""
    rules = spark.createDataFrame(
        [("com", 0), ("co.uk", 0), ("uk", 0), ("ck", 1),
         ("www.ck", 2), ("github.io", 0), ("io", 0)],
        "rule string, typ int")
    hosts = spark.createDataFrame(
        [("example.com",), ("a.b.example.com",), ("example.co.uk",),
         ("sub.example.co.uk",), ("co.uk",), ("foo.web.ck",),
         ("web.ck",), ("www.ck",), ("x.www.ck",),
         ("pages.github.io",), ("plain.lan",), ("lan",)],
        "host string")
    got = {r.host: (r.public_suffix, r.registrable)
           for r in canon.registrable_domain(hosts, rules).collect()}
    assert got == {
        "example.com": ("com", "example.com"),
        "a.b.example.com": ("com", "example.com"),
        # longest match: co.uk beats uk
        "example.co.uk": ("co.uk", "example.co.uk"),
        "sub.example.co.uk": ("co.uk", "example.co.uk"),
        "co.uk": ("co.uk", None),           # host IS a suffix
        "foo.web.ck": ("web.ck", "foo.web.ck"),   # *.ck
        "web.ck": ("web.ck", None),         # wildcard-made suffix
        "www.ck": ("ck", "www.ck"),         # !www.ck exception
        # the exception prevails for subdomains too: x.www.ck belongs
        # to the registrant of www.ck (PSL: "If more than one rule
        # matches, the prevailing rule is the exception rule")
        "x.www.ck": ("ck", "www.ck"),
        "pages.github.io": ("github.io", "pages.github.io"),
        "plain.lan": ("lan", "plain.lan"),  # implicit '*' fallback
        "lan": ("lan", None),
    }


@pytest.mark.spark
def test_strip_tracking_params(spark):
    """Alias collapse: tracking keys drop case-insensitively,
    survivors re-sort, the fragment drops, an emptied query loses its
    '?', a key-only param survives, and a non-tracking 'reference'
    key is NOT caught by the anchored 'ref' pattern."""
    from web_graph_spark.canon import strip_tracking_params

    cases = {
        "https://h/p?utm_source=a&utm_medium=b": "https://h/p",
        "https://h/p?b=2&UTM_CAMPAIGN=x&a=1": "https://h/p?a=1&b=2",
        "https://h/p?gclid=1&page=2#frag": "https://h/p?page=2",
        "https://h/p?ref=home": "https://h/p",
        "https://h/p?reference=home": "https://h/p?reference=home",
        "https://h/p?flag": "https://h/p?flag",
        "https://h/p": "https://h/p",
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {r.u: r.c for r in df.select(
        "u", strip_tracking_params("u").alias("c")).collect()}
    assert got == cases
