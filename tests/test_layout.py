"""Z-order layout (operators/layout.py): Morton-code bit math and the
per-file multi-dimension locality contract that makes min-max pruning
work on every interleaved dimension."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from web_graph_spark.operators.layout import write_zordered, zvalue_col


@pytest.mark.spark
def test_zvalue_hand_bits(spark):
    """Interleave pins: dim-0 bit i lands at 2i, dim-1 bit i at 2i+1;
    a known (x, y) pair maps to the textbook Morton code; >63-bit
    requests raise."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (5, 3), (65535, 65535)],
        "x long, y long")
    got = {(r.x, r.y): r.z
           for r in df.select("x", "y",
                              zvalue_col(["x", "y"]).alias("z")).collect()}

    def morton(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for (x, y) in got}
    assert got[(1, 0)] == 1 and got[(0, 1)] == 2 and got[(1, 1)] == 3
    assert got[(5, 3)] == 0b011011  # x=101,y=011 → y1x1... = 27
    with pytest.raises(ValueError):
        zvalue_col(["x", "y", "x", "y"], bits=16)


@pytest.mark.spark
def test_write_zordered_per_file_locality(spark, tmp_path):
    """The pruning contract: on a 64×64 grid written into 16 files,
    EVERY file's min-max envelope spans at most half the global range
    in BOTH dimensions (a single-dimension sort would leave the other
    dimension's span at ~100% in every file)."""
    grid = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)],
        "x long, y long")
    out = str(tmp_path / "zord")
    write_zordered(grid, out, ["x", "y"], bits=6, n_files=16)

    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) >= 8
    for f in files:
        st = (spark.read.parquet(f)
              .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
              .collect()[0])
        assert st[1] - st[0] <= 32, f
        assert st[3] - st[2] <= 32, f


@pytest.mark.spark
def test_plan_compaction_greedy_fill(spark):
    from web_graph_spark.operators.layout import plan_compaction

    files = spark.createDataFrame(
        [("p", 1, 900), ("p", 2, 800), ("p", 3, 700), ("p", 4, 100),
         ("p", 5, 100), ("q", 6, 5000), ("q", 7, 10)],
        "part string, fid long, sz long")
    out = {(r.part, r.grp): (r.n_files, r.bytes)
           for r in plan_compaction(files, "part", "fid", "sz",
                                    1000).collect()}
    # fill order p: 900,800,700,100,100 (size desc) with exclusive
    # prefix 0,900,1700,2400,2500 -> groups 0,0,1,2,2
    assert out[("p", 0)] == (2, 1700)
    assert out[("p", 1)] == (1, 700)
    assert out[("p", 2)] == (2, 200)
    # an over-target file occupies groups by its own prefix; the
    # next file lands past it
    assert out[("q", 0)] == (1, 5000)
    assert out[("q", 5)] == (1, 10)

    # determinism under equal sizes: id breaks the tie
    eq = spark.createDataFrame(
        [("p", i, 400) for i in (3, 1, 2)], "part string, fid long, sz long")
    d1 = plan_compaction(eq, "part", "fid", "sz", 1000).collect()
    d2 = plan_compaction(eq.orderBy("sz"), "part", "fid", "sz",
                         1000).collect()
    key = lambda rows: sorted((r.grp, r.files_digest) for r in rows)
    assert key(d1) == key(d2)


@pytest.mark.spark
def test_zonemap_audit_hand_case_and_dominance(spark):
    """Hand-checkable 2-file layouts, plus the dominance property on
    real data: a sorted layout never scans more files than arrival
    for any range predicate, and strictly fewer in aggregate."""
    from pyspark.sql import functions as F

    from web_graph_spark.operators.layout import zonemap_audit

    # interleaved values: arrival files span the whole range (both
    # scanned by any predicate); sorted files split it exactly
    rows = [(0, 10), (1, 99), (2, 11), (3, 98)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = {r.pred_id: r for r in zonemap_audit(
        df, "n_chars", "doc_id", rows_per_file=2,
        preds=[(10, 12), (95, 99), (50, 60)],
        small_hint=10).collect()}
    assert (out[0].files_arrival, out[0].files_sorted,
            out[0].n_rows) == (2, 1, 2)
    assert (out[1].files_arrival, out[1].files_sorted,
            out[1].n_rows) == (2, 1, 2)
    # a predicate in the value gap: arrival still scans everything,
    # sorted sees non-overlapping file ranges and scans nothing
    assert (out[2].files_arrival, out[2].files_sorted,
            out[2].n_rows) == (2, 0, 0)

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet") \
        .select("doc_id", "n_chars")
    preds = [(48 + 64 * k, 48 + 64 * k + 63) for k in range(8)]
    audit = zonemap_audit(docs, "n_chars", "doc_id",
                          rows_per_file=5, preds=preds,
                          small_hint=1000).collect()
    assert all(r.files_sorted <= r.files_arrival for r in audit)
    assert (sum(r.files_sorted for r in audit)
            < sum(r.files_arrival for r in audit))
    # selectivity consistency: scanned sorted files are enough to
    # hold the matching rows
    for r in audit:
        assert r.files_sorted * 5 >= r.n_rows


@pytest.mark.spark
def test_adjacency_gap_audit_hand_case_and_locality_win(spark):
    """γ bit algebra on a hand graph; host-grouped numbering beats
    interleaved original ids on the host-major synthetic web."""
    from web_graph_spark import webgen
    from web_graph_spark.operators.layout import adjacency_gap_audit

    # hand: 2 hosts, ids interleave; edges 0->2 (same host a), 2->0
    # original gaps |2-0|=2, |0-2|=2 -> γ(2)=3 bits each, total 6
    # host-grouped ranks: a:{0,2}->0,1  b:{1,3}->2,3
    #   edge 0->2 = ranks 0->1 gap 1 γ=1; 2->0 = 1->0 gap 1 γ=1 -> 2
    v = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "a"), (3, "b")],
        "doc_id long, host string")
    e = spark.createDataFrame([(0, 2), (2, 0)],
                              "src_doc_id long, tgt_doc_id long")
    out = {r.ordering: r for r in
           adjacency_gap_audit(e, v, small_hint=10).collect()}
    assert out["original"].total_bits == 6
    assert out["host_grouped"].total_bits == 2

    # locality-heavy graph: 20 hosts × 50 pages with interleaved ids
    # (id = page*20 + host) and same-host next-page chains — original
    # numbering pays stride-20 gaps, host grouping makes them 1
    verts = [(p * 20 + h, f"h{h:02d}") for h in range(20)
             for p in range(50)]
    chain = [(p * 20 + h, (p + 1) * 20 + h) for h in range(20)
             for p in range(49)]
    cross = [(h, (h + 1) % 20) for h in range(20)]
    v2 = spark.createDataFrame(verts, "doc_id long, host string")
    e2 = spark.createDataFrame(chain + cross,
                               "src_doc_id long, tgt_doc_id long")
    audit = {r.ordering: r for r in
             adjacency_gap_audit(e2, v2, small_hint=10_000).collect()}
    assert (audit["host_grouped"].bits_per_edge_ppm
            < audit["original"].bits_per_edge_ppm)
    assert audit["original"].n_edges == audit["host_grouped"].n_edges

    # and on the ARITHMETIC synthetic web (links scatter by
    # multiplication — no intra-host locality) the audit honestly
    # reports that host grouping does NOT pay: that verdict is the
    # operator doing its job as a decision tool
    e3 = (webgen.links_full_df(spark, SF_SMOKE)
          .filter(F.col("k") % 4 != 0)
          .select("src_doc_id", "tgt_doc_id").distinct())
    v3 = webgen.pages_df(spark, SF_SMOKE).select("doc_id", "host")
    audit3 = {r.ordering: r for r in
              adjacency_gap_audit(e3, v3, small_hint=10_000).collect()}
    assert (audit3["host_grouped"].bits_per_edge_ppm
            > audit3["original"].bits_per_edge_ppm)


@pytest.mark.spark
def test_front_coding_audit_hand_urls(spark):
    """Exact LCP accounting on hand-sorted runs, including the
    negative-net group (1-byte overhead beats tiny prefixes) and the
    single-URL group."""
    from web_graph_spark.operators.layout import front_coding_audit

    rows = [
        # group a, sorted: lcps = 0, then len('http://a/x') shared…
        ("a", "http://a/page/001"), ("a", "http://a/page/002"),
        ("a", "http://a/page/010"), ("a", "http://a/z"),
        # group b: no shared prefixes at all → net negative
        ("b", "m"), ("b", "x"), ("b", "z"),
        # group c: one url
        ("c", "http://c/only"),
    ]
    df = spark.createDataFrame(rows, "host string, url string")
    got = {r["host"]: r for r in front_coding_audit(df).collect()}

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    for g in ("a", "b", "c"):
        urls = sorted(u for h, u in rows if h == g)
        saved = sum(lcp(urls[i - 1], urls[i])
                    for i in range(1, len(urls)))
        raw = sum(len(u) for u in urls)
        r = got[g]
        assert (r["n_urls"], r["raw_bytes"], r["saved_bytes"]) \
            == (len(urls), raw, saved), g
        assert r["saved_ppm"] == saved * 1_000_000 // raw
        # python // is floor division — the exact semantics the pmod
        # identity implements for the possibly-negative net
        assert r["net_saved_1b_ppm"] \
            == (saved - len(urls)) * 1_000_000 // raw
    assert got["b"]["net_saved_1b_ppm"] < 0  # the lose case triggers
    assert got["a"]["saved_bytes"] == (0 + lcp("http://a/page/001",
                                               "http://a/page/002")
                                       + lcp("http://a/page/002",
                                             "http://a/page/010")
                                       + lcp("http://a/page/010",
                                             "http://a/z"))


@pytest.mark.spark
def test_encoding_plan_hand_frame(spark):
    """Exact byte math: a 2-value column wins dictionary (1-bit
    codes), a unique column refuses; savings sign both ways."""
    from web_graph_spark.operators.layout import encoding_plan

    df = spark.createDataFrame(
        [(1000 + i, "en" if i % 2 == 0 else "de") for i in range(8)],
        "k long, lang string")
    rows = {r["col_name"]: r
            for r in encoding_plan(df, ["k", "lang"]).collect()}
    lg = rows["lang"]
    # plain: 8 rows x 2 bytes; dict: 2 entries x 2 bytes + 8 x 1-bit
    # codes = 4 + 1 = 5 bytes
    assert (lg["n_distinct"], lg["plain_bytes"], lg["dict_bytes"],
            lg["code_bits"], lg["dict_total_bytes"]) == (2, 16, 4, 1, 5)
    assert lg["use_dictionary"] and lg["savings_ppm"] == (16 - 5) * 1_000_000 // 16
    k = rows["k"]
    # unique 4-char values: dict keeps all 32 bytes + 8 x 3-bit codes
    assert (k["n_distinct"], k["plain_bytes"], k["code_bits"]) == (8, 32, 3)
    assert k["dict_total_bytes"] == 32 + (8 * 3 + 7) // 8
    assert not k["use_dictionary"] and k["savings_ppm"] < 0


@pytest.mark.spark
def test_encoding_plan_single_value_column(spark):
    """A constant column needs 0 code bits: dict = one entry."""
    from web_graph_spark.operators.layout import encoding_plan

    df = spark.createDataFrame([("xx",)] * 5, "c string")
    r = encoding_plan(df, ["c"]).collect()[0]
    assert (r["n_distinct"], r["code_bits"], r["dict_total_bytes"]) == (1, 0, 2)
    assert r["use_dictionary"]
