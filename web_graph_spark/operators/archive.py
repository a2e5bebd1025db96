"""Crawl-archive export — WARC records and a SURT-keyed CDX index.

The reference persists fetched pages as Postgres rows
(``pkg/linkstorage/linkstorage.go:119-131``); the archival layer a
10^10-URL crawl actually ships is the public pair every large crawl
(Common Crawl, Internet Archive) uses instead: WARC record segments
(ISO 28500 / IIPC WARC 1.1) plus a CDX capture index whose keys are
SURT-canonicalized URLs so one lexicographic sort co-locates every
capture of a host and its subdomains.

Scale shape: ``warc_records`` is ONE codegen'd projection over the
span-web relation — header assembly, payload reassembly, lengths and
digests are all JVM string/hash expressions, so exporting 100 TB is
scan-bound with zero shuffles.  ``cdx_index`` is a projection too; the
sorted physical layout comes from ``write_cdx`` — a range partition on
the SURT key plus a within-partition sort (never a global sort-merge
to one task), which is exactly how the production cdxj writers shard.

Determinism: record identity and digests use the repo's cross-engine
md5 recipe (WARC permits any labelled digest algorithm — ``md5:<hex>``
is spec-legal), and ``WARC-Date`` is caller-supplied (production
passes fetch time; the contract query pins a constant so the oracle
can rebuild records byte-for-byte).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CRLF = "\r\n"


def span_payload(spans_col) -> F.Column:
    """The archived payload: the document's span sequence reassembled
    in offset order, one ``kind|text|media_ref|offset`` line per span
    — the lossless serialization of the interleaved text+media shape
    (BASELINE input_hint), so span-sequence equality of the archive is
    byte equality of payloads."""
    line = lambda x: F.concat_ws(  # noqa: E731
        "|", x["kind"], x["text"], x["media_ref"],
        x["offset"].cast("string"))
    return F.array_join(F.transform(spans_col, line), "\n")


def warc_records(web: DataFrame,
                 warc_date: str = "2026-01-01T00:00:00Z") -> DataFrame:
    """WARC/1.1 response records for every fetched page of ``web``
    (the ``build_span_web`` shape: host, path, url, spans).

    Returns one row per page: ``check_id`` (the cross-engine md5 page
    identity), ``url``, exact ``content_length`` (payload octets),
    ``payload_digest`` (``md5:<hex>``, a spec-legal labelled digest),
    and ``record_digest`` — md5 over the full serialized record
    (named-field header block + blank line + payload), which is what
    makes the export certifiable: two engines that agree on every
    record digest agree on every archived byte.
    """
    payload = span_payload(F.col("spans"))
    check_id = F.md5(F.concat("host", "path"))
    p = web.select(
        check_id.alias("check_id"), "url",
        payload.alias("__payload"),
        F.octet_length(payload).cast("long").alias("content_length"),
        F.concat(F.lit("md5:"), F.md5(payload)).alias("payload_digest"))
    header = F.concat(
        F.lit("WARC/1.1" + CRLF),
        F.lit("WARC-Type: response" + CRLF),
        F.lit("WARC-Record-ID: <urn:md5:"), F.col("check_id"),
        F.lit(">" + CRLF),
        F.lit("WARC-Date: " + warc_date + CRLF),
        F.lit("WARC-Target-URI: "), F.col("url"), F.lit(CRLF),
        F.lit("Content-Type: application/http;msgtype=response" + CRLF),
        F.lit("WARC-Payload-Digest: "), F.col("payload_digest"),
        F.lit(CRLF),
        F.lit("Content-Length: "),
        F.col("content_length").cast("string"), F.lit(CRLF + CRLF))
    return (p.select(
        "check_id", "url", "content_length", "payload_digest",
        F.md5(F.concat(header, F.col("__payload"))).alias("record_digest")))


def surt_key(host, path) -> F.Column:
    """SURT (Sort-friendly URI Reordering Transform) key:
    ``tld,domain,...,sub)/path`` — host labels reversed and
    comma-joined, so one lexicographic sort groups a registrable
    domain with all its subdomains (the property CDX lookups and
    per-site extraction both rely on).  Pure JVM split/reverse/join."""
    host_c = host if not isinstance(host, str) else F.col(host)
    path_c = path if not isinstance(path, str) else F.col(path)
    return F.concat(
        F.array_join(F.reverse(F.split(F.lower(host_c), r"\.")), ","),
        F.lit(")"), path_c)


def cdx_index(captures: DataFrame, host: str = "host",
              path: str = "path") -> DataFrame:
    """Add the ``surt`` index key to a capture relation (any relation
    carrying ``host`` + ``path``); every other column passes through.
    The index ROWS are a projection — the index ORDER is physical
    layout, produced by ``write_cdx``."""
    return captures.withColumn("surt", surt_key(host, path))


def write_cdx(index: DataFrame, path: str, n_shards: int = 32) -> None:
    """Materialize the CDX index sorted by SURT key: range-partition
    on ``surt`` into ``n_shards`` (sampled boundaries — no single
    reducer), sort within each shard, write parquet.  Shard i's rows
    all precede shard i+1's, so the concatenation of shards in
    partition order IS the globally sorted index — the same layout
    contract as a cdxj ``.gz`` shard set, without a global sort-merge
    ever funneling 10^10 rows through one task."""
    (index.repartitionByRange(n_shards, "surt")
          .sortWithinPartitions("surt")
          .write.mode("overwrite").parquet(path))


def wet_records(web: DataFrame,
                warc_date: str = "2026-01-01T00:00:00Z") -> DataFrame:
    """WET conversion records — the extracted-plain-text sibling of
    :func:`warc_records` that Common-Crawl-style pipelines ship for
    text consumers (WARC-Type: conversion, Content-Type: text/plain,
    ``WARC-Refers-To`` the response record): the payload is the
    page's visible text — each span's ``text`` in offset order,
    newline-joined — with structure (refs, offsets, kinds) dropped.
    Same zero-shuffle codegen'd-projection shape and cross-engine md5
    digests as the response export; ``record_digest`` covers the full
    serialized record so a hash match certifies every archived byte.
    """
    text = F.array_join(
        F.transform(F.col("spans"), lambda x: x["text"]), "\n")
    check_id = F.md5(F.concat("host", "path"))
    p = web.select(
        check_id.alias("check_id"), "url",
        text.alias("__payload"),
        F.octet_length(text).cast("long").alias("content_length"),
        F.concat(F.lit("md5:"), F.md5(text)).alias("payload_digest"))
    header = F.concat(
        F.lit("WARC/1.1" + CRLF),
        F.lit("WARC-Type: conversion" + CRLF),
        F.lit("WARC-Record-ID: <urn:md5:"),
        F.md5(F.concat(F.col("check_id"), F.lit("wet"))),
        F.lit(">" + CRLF),
        F.lit("WARC-Refers-To: <urn:md5:"), F.col("check_id"),
        F.lit(">" + CRLF),
        F.lit("WARC-Date: " + warc_date + CRLF),
        F.lit("WARC-Target-URI: "), F.col("url"), F.lit(CRLF),
        F.lit("Content-Type: text/plain" + CRLF),
        F.lit("WARC-Payload-Digest: "), F.col("payload_digest"),
        F.lit(CRLF),
        F.lit("Content-Length: "),
        F.col("content_length").cast("string"), F.lit(CRLF + CRLF))
    return (p.select(
        "check_id", "url", "content_length", "payload_digest",
        F.md5(F.concat(header, F.col("__payload"))).alias("record_digest")))


def revisit_records(captures: DataFrame, id_col: str = "check_id",
                    digest_col: str = "payload_digest",
                    seq_col: str = "snap",
                    length_col: str = "content_length") -> DataFrame:
    """WARC deduplication via ``revisit`` records (WARC/1.1 §6.7.2,
    identical-payload-digest profile — the convention every archive
    crawler ships): across repeated captures, only the FIRST capture
    of each payload digest stores the body as a ``response`` record;
    every later capture (a later snapshot of an unchanged page, or a
    same-snapshot mirror URL) becomes a headers-only ``revisit``
    record whose ``WARC-Refers-To`` names the original — at recrawl
    scale this is where most of the archive's bytes go away.

    First-capture order is total and cross-engine: min over
    ``(seq, id)`` lexicographic (the struct-min IS that rule).  Record
    identity is ``md5(id @ seq)`` so originals keep their id across
    reruns.

    Scale shape: one digest-keyed agg whose map-side partials absorb
    hot digests (error pages, parked domains — the known skew) down
    to one row per digest BEFORE the shuffle, then one equi-join back
    on digest (AQE skew-split handles the hot-digest probe side); a
    window over digest could not partial-aggregate and would shuffle
    every capture row.  Returns one row per capture:
    ``(id, seq, digest, record_id, record_type, refers_to,
    stored_length)`` — stored_length is the archived payload octets
    (0 for revisits), so the dedup saving is Σ certified."""
    rid = lambda i, s: F.md5(F.concat(  # noqa: E731
        i, F.lit("@"), s.cast("string")))
    orig = (captures.groupBy(digest_col)
            .agg(F.min(F.struct(F.col(seq_col).alias("seq"),
                                F.col(id_col).alias("id"))).alias("o")))
    j = captures.join(orig, digest_col)
    is_orig = ((F.col(seq_col) == F.col("o.seq"))
               & (F.col(id_col) == F.col("o.id")))
    return j.select(
        F.col(id_col), F.col(seq_col), F.col(digest_col),
        rid(F.col(id_col), F.col(seq_col)).alias("record_id"),
        F.when(is_orig, F.lit("response")).otherwise(F.lit("revisit"))
        .alias("record_type"),
        F.when(is_orig, F.lit(None).cast("string"))
        .otherwise(rid(F.col("o.id"), F.col("o.seq")))
        .alias("refers_to"),
        F.when(is_orig, F.col(length_col)).otherwise(F.lit(0))
        .cast("long").alias("stored_length"))
