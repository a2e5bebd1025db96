"""WARC / CDX archive export (operators/archive.py).

Pins: (1) the WARC record serialization byte-for-byte against a
hand-computed hashlib reference on a tiny hand-built span web — the
digest recipe, CRLF framing, header field order, and exact octet
Content-Length; (2) ``write_cdx``'s physical layout contract — the
concatenation of output shards in file order is globally SURT-sorted
without any global single-task sort; (3) SURT key semantics
(subdomains sort together under their registrable domain)."""

from __future__ import annotations

import glob
import hashlib

import pytest
from pyspark.sql import Row, functions as F

from web_graph_spark.operators.archive import (
    cdx_index, span_payload, surt_key, warc_records, write_cdx)

SPAN_SCHEMA = ("host string, path string, url string, "
               "spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>")


def _web(spark):
    rows = [
        Row(host="a.example.test", path="/p1", url="https://a.example.test/p1",
            spans=[Row(kind="link", text="anchor-1", media_ref="https://b/x",
                       offset=1),
                   Row(kind="image", text="", media_ref="https://b/i.png",
                       offset=2)]),
        Row(host="b.example.test", path="/p2", url="https://b.example.test/p2",
            spans=[]),
    ]
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def _expected_record(host, path, url, payload, date="2026-01-01T00:00:00Z"):
    check_id = hashlib.md5((host + path).encode()).hexdigest()
    pd = "md5:" + hashlib.md5(payload.encode()).hexdigest()
    n = len(payload.encode())
    header = (
        "WARC/1.1\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:md5:{check_id}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http;msgtype=response\r\n"
        f"WARC-Payload-Digest: {pd}\r\n"
        f"Content-Length: {n}\r\n\r\n")
    return {
        "check_id": check_id, "url": url, "content_length": n,
        "payload_digest": pd,
        "record_digest": hashlib.md5((header + payload).encode()).hexdigest(),
    }


@pytest.mark.spark
def test_warc_record_bytes_match_hashlib(spark):
    got = {r["check_id"]: r.asDict()
           for r in warc_records(_web(spark)).collect()}
    exp1 = _expected_record(
        "a.example.test", "/p1", "https://a.example.test/p1",
        "link|anchor-1|https://b/x|1\nimage||https://b/i.png|2")
    exp2 = _expected_record(
        "b.example.test", "/p2", "https://b.example.test/p2", "")
    assert got[exp1["check_id"]] == exp1
    assert got[exp2["check_id"]] == exp2


@pytest.mark.spark
def test_span_payload_orders_by_given_span_order(spark):
    # spans arrive already offset-sorted from build_span_web; the
    # payload is their in-array order — pin that a 2-span page joins
    # with exactly one \n and no trailing separator.
    df = _web(spark).select(span_payload(F.col("spans")).alias("p"))
    vals = sorted(r["p"] for r in df.collect())
    assert vals == ["", "link|anchor-1|https://b/x|1\nimage||https://b/i.png|2"]


@pytest.mark.spark
def test_surt_key_groups_subdomains(spark):
    df = spark.createDataFrame(
        [("www.example.org", "/a"), ("example.org", "/b"),
         ("mail.example.org", "/c"), ("example.net", "/d")],
        "host string, path string")
    surts = sorted(r["s"] for r in
                   df.select(surt_key("host", "path").alias("s")).collect())
    # net sorts before org; all example.org subdomains are contiguous.
    assert surts == ["net,example)/d", "org,example)/b",
                     "org,example,mail)/c", "org,example,www)/a"]


@pytest.mark.spark
def test_write_cdx_shards_concatenate_sorted(spark, tmp_path):
    import random
    rnd = random.Random(7)
    rows = [("h%03d.example.test" % rnd.randrange(500),
             "/p/%d" % i) for i in range(2000)]
    df = spark.createDataFrame(rows, "host string, path string")
    out = str(tmp_path / "cdx")
    write_cdx(cdx_index(df), out, n_shards=8)
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) > 1, "range partition should produce several shards"
    concat = []
    for f in files:
        part = [r["surt"] for r in spark.read.parquet(f).collect()]
        concat.extend(part)
    assert concat == sorted(concat), "shard concatenation must be the sorted index"
    assert len(concat) == 2000


@pytest.mark.spark
def test_wet_record_bytes_match_hashlib(spark):
    """WET conversion records byte-for-byte vs a hashlib reference:
    payload = span TEXT only (refs/kinds/offsets dropped), conversion
    headers with a derived record id and a WARC-Refers-To pointing at
    the response record's id; the empty-span page archives an empty
    text payload."""
    from web_graph_spark.operators.archive import wet_records

    def expected(host, path, url, payload,
                 date="2026-01-01T00:00:00Z"):
        check_id = hashlib.md5((host + path).encode()).hexdigest()
        pd = "md5:" + hashlib.md5(payload.encode()).hexdigest()
        n = len(payload.encode())
        wet_id = hashlib.md5((check_id + "wet").encode()).hexdigest()
        header = (
            "WARC/1.1\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Record-ID: <urn:md5:{wet_id}>\r\n"
            f"WARC-Refers-To: <urn:md5:{check_id}>\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "Content-Type: text/plain\r\n"
            f"WARC-Payload-Digest: {pd}\r\n"
            f"Content-Length: {n}\r\n\r\n")
        return (check_id, url, n, pd,
                hashlib.md5((header + payload).encode()).hexdigest())

    got = {r.check_id: (r.check_id, r.url, r.content_length,
                        r.payload_digest, r.record_digest)
           for r in wet_records(_web(spark)).collect()}
    want = [
        expected("a.example.test", "/p1", "https://a.example.test/p1",
                 "anchor-1\n"),   # image span's text is "" → joined
        expected("b.example.test", "/p2", "https://b.example.test/p2",
                 ""),
    ]
    assert got == {w[0]: w for w in want}


@pytest.mark.spark
def test_revisit_records_first_wins_and_linkage(spark):
    """Identical-payload-digest dedup: the (snap, id)-min capture of a
    digest is the only 'response'; later snapshots AND same-snapshot
    mirrors become headers-only revisits whose refers_to is exactly
    the original's record id md5(id@snap); unique digests keep a NULL
    refers_to and their full length."""
    from web_graph_spark.operators.archive import revisit_records

    caps = spark.createDataFrame(
        [("a", 1, "dX", 10),     # original of dX (earliest snap)
         ("a", 2, "dX", 10),     # recrawl, unchanged -> revisit
         ("b", 2, "dX", 10),     # mirror in snap 2   -> revisit
         ("c", 1, "dY", 7),      # unique             -> response
         ("d", 1, "dZ", 5),      # same-snap mirror pair: min id wins
         ("e", 1, "dZ", 5)],
        "check_id string, snap int, payload_digest string, "
        "content_length long")
    rows = {(r.check_id, r.snap): r
            for r in revisit_records(caps).collect()}

    rid = lambda i, s: hashlib.md5(f"{i}@{s}".encode()).hexdigest()
    a1 = rows[("a", 1)]
    assert (a1.record_type, a1.refers_to, a1.stored_length) == \
        ("response", None, 10)
    for k in [("a", 2), ("b", 2)]:
        r = rows[k]
        assert (r.record_type, r.refers_to, r.stored_length) == \
            ("revisit", rid("a", 1), 0)
    assert rows[("c", 1)].record_type == "response"
    assert rows[("c", 1)].refers_to is None
    assert rows[("d", 1)].record_type == "response"
    e1 = rows[("e", 1)]
    assert (e1.record_type, e1.refers_to, e1.stored_length) == \
        ("revisit", rid("d", 1), 0)
    assert all(r.record_id == rid(c, s) for (c, s), r in rows.items())
