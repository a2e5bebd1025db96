"""Multi-dimensional storage layout — Z-order (Morton) clustering.

A parquet store is pruned by per-file/per-row-group min-max stats, so
a layout sorted on ONE key prunes only that key's predicates.  Bit-
interleaving several keys into one Morton code and range-partitioning
on it bounds EVERY interleaved dimension's span within each file —
point/range predicates on any of the dimensions then skip most files
(the standard lakehouse "Z-ORDER BY" maintenance action, e.g. Delta's
OPTIMIZE ZORDER; the reference's Postgres relies on btree indexes for
the same queries, linkstorage.go:119-131 — at 100 TB min-max pruning
over immutable files is what replaces them).

Everything here is exact integer bit arithmetic (shift/and/or), JVM
codegen end-to-end, and SQL-oracle replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def zvalue_col(dims, bits: int = 16):
    """Morton code: interleave the low ``bits`` bits of each integer
    dimension column (dim d's bit i lands at position i·D + d).  With
    D dims of ``bits`` bits the code fits D·bits ≤ 63 bits — callers
    pre-bucket real values into the [0, 2^bits) range (hash chunks,
    quantile buckets, truncated ranks all work; what matters for
    pruning is monotone-ish locality per dimension, not the exact
    recipe)."""
    d_n = len(dims)
    if d_n * bits > 63:
        raise ValueError(f"{d_n} dims x {bits} bits exceeds a long")
    terms = []
    for d, c in enumerate(dims):
        col = c if not isinstance(c, str) else F.col(c)
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(col.cast("long"), i)
                            .bitwiseAND(F.lit(1)), i * d_n + d))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out.cast("long")


def write_zordered(df: DataFrame, path: str, dims,
                   bits: int = 16, n_files: int = 32) -> None:
    """Materialize ``df`` Z-ordered on ``dims``: compute the Morton
    code, range-partition into ``n_files`` on it (sampled boundaries —
    no single-task global sort), sort within each partition, write
    parquet without the helper column.  Every written file then holds
    a contiguous Morton range, so its min-max envelope is tight in
    every interleaved dimension — the pruning contract the locality
    test pins."""
    (df.withColumn("__z", zvalue_col(dims, bits))
       .repartitionByRange(n_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(path))


def plan_compaction(files: DataFrame, part_col: str,
                    id_col: str, size_col: str,
                    target_bytes: int) -> DataFrame:
    """Small-files compaction planning — the Iceberg
    ``rewrite_data_files`` binpack strategy as a relational operator:
    within each table partition, pack files into rewrite groups of
    ≈``target_bytes`` and report one row per planned output group.
    The operational lever against the small-files problem (10^7 tiny
    parquet files read as 10^7 tasks until someone runs exactly this
    plan).

    Deterministic greedy fill: files order by (size DESC, id) inside
    their partition — largest first, the classic binpack heuristic —
    and a file opens a new group when the EXCLUSIVE running total
    crosses a target boundary: ``grp = prefix_bytes div target``.
    Groups are therefore contiguous in the fill order, each holding
    ≈target bytes (±1 file), and the whole plan is one per-partition
    window — no driver loop, no pairwise fit search.

    Shape at scale: the input is the FILE MANIFEST (one row per
    file — dim-sized, not data-sized); one shuffle on the uniform
    partition key, one per-partition sort + prefix-sum window, one
    hash agg to groups.  Output ∝ planned groups.

    Returns ``(part, grp, n_files, bytes, files_digest)`` where
    files_digest certifies the exact membership (md5 over the
    id-sorted file list).

    Reference analog: none — engine extension (SURVEY §2.10 E125).
    """
    w = (Window.partitionBy(part_col)
         .orderBy(F.desc(size_col), id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    planned = files.select(
        part_col, id_col, size_col,
        F.coalesce(F.sum(size_col).over(w), F.lit(0))
        .cast("long").alias("__pre"))
    planned = planned.select(
        part_col, id_col, size_col,
        F.expr(f"__pre div {int(target_bytes)}").alias("grp"))
    return (planned.groupBy(part_col, "grp")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum(size_col).cast("long").alias("bytes"),
                 F.md5(F.array_join(F.array_sort(F.collect_list(
                     F.col(id_col).cast("string"))), "|"))
                 .alias("files_digest")))


def zonemap_audit(df: DataFrame, key_col: str, id_col: str,
                  rows_per_file: int,
                  preds: list[tuple[int, int]],
                  small_hint: int | None = None) -> DataFrame:
    """Quantify what a SORTED write layout buys from parquet/Iceberg
    zone maps (per-file min/max): lay the same rows into files two
    ways — arrival order (by ``id_col``) vs sorted by ``key_col`` —
    derive each layout's per-file [min, max] of the predicate column,
    and count, for every range predicate of a workload, the files a
    zone-map reader must SCAN (predicate overlaps the file's range)
    under each layout.  The number a table owner reads before paying
    for a sort/z-order rewrite: arrival-ordered files each span ≈ the
    whole value range (every file scanned); sorted files partition
    the range (≈ selectivity × n_files scanned) — this operator makes
    that exact, next to E118's z-order writer and E125's compaction
    planner.

    File ranks come from :func:`operators.frontier.ordered_seq` (the
    range-partitioned dense rank — no single-partition window at
    10^9-row tables); per-file stats are one (file)-key agg each; the
    workload × file-stats compare is dim × dim; the exact selectivity
    column (``n_rows``) is one broadcast-predicate scan.

    → per predicate: ``(pred_id, lo, hi, n_files, files_arrival,
    files_sorted, n_rows)``.

    Reference analog: none — engine extension (SURVEY §2.10 E140).
    """
    from .frontier import ordered_seq

    spark = df.sparkSession
    base = df.select(F.col(id_col).alias("id"),
                     F.col(key_col).cast("long").alias("k"))
    s = int(rows_per_file)

    def file_stats(order_cols: list[str]) -> DataFrame:
        ranked = ordered_seq(base, order_cols, out_col="__r",
                             small_hint=small_hint)
        return (ranked.select(F.expr(f"__r div {s}").alias("f"), "k")
                .groupBy("f")
                .agg(F.min("k").alias("lo"), F.max("k").alias("hi")))

    arr = file_stats(["id"])
    srt = file_stats(["k", "id"])
    pdf = spark.createDataFrame(
        [(i, int(lo), int(hi)) for i, (lo, hi) in enumerate(preds)],
        "pred_id int, lo long, hi long")

    def scans(stats: DataFrame, out: str) -> DataFrame:
        hit = (F.col("s.hi") >= F.col("p.lo")) & \
              (F.col("s.lo") <= F.col("p.hi"))
        return (stats.alias("s").crossJoin(F.broadcast(pdf.alias("p")))
                .groupBy(F.col("p.pred_id").alias("pred_id"))
                .agg(F.sum(hit.cast("long")).alias(out),
                     F.count(F.lit(1)).cast("long").alias("__nf")))

    sa = scans(arr, "files_arrival")
    ss = scans(srt, "files_sorted").withColumnRenamed("__nf", "__nf2")
    rows = (base.crossJoin(F.broadcast(pdf))
            .filter((F.col("k") >= F.col("lo"))
                    & (F.col("k") <= F.col("hi")))
            .groupBy("pred_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows")))
    return (pdf.join(sa, "pred_id").join(ss, "pred_id")
            .join(rows, "pred_id", "left")
            .select("pred_id", "lo", "hi",
                    F.col("__nf").alias("n_files"),
                    "files_arrival", "files_sorted",
                    F.coalesce("n_rows", F.lit(0)).cast("long")
                    .alias("n_rows")))


def adjacency_gap_audit(edges: DataFrame, vertices: DataFrame,
                        id_col: str = "doc_id",
                        host_col: str = "host",
                        src: str = "src_doc_id",
                        dst: str = "tgt_doc_id",
                        small_hint: int | None = None) -> DataFrame:
    """Measure what VERTEX RENUMBERING buys adjacency-list
    compression — the WebGraph framework's founding observation
    (Boldi & Vigna, WWW'04): web links are overwhelmingly intra-host,
    so numbering vertices host-contiguously turns neighbor lists into
    runs of small gaps, and gap codes (Elias γ here) shrink by the
    LOG of the gap.  The audit prices the same edge set under two
    numberings — original ids vs host-grouped rank — in exact bits:
    per source, neighbors sort in the numbering, the first gap is
    |d₁ − s| and successors d_{i+1} − d_i, and γ(g) = 2·bitlen(g) − 1
    bits (bitlen via ``length(bin(g))`` — integer-exact in any
    engine).  The graph twin of :func:`zonemap_audit`: both quantify
    a layout decision before paying for the rewrite.

    Ranks via frontier.ordered_seq (range-partitioned — no
    single-partition window); gap algebra is one lag window per
    source (uniform key) + a codegen projection + one 2-row agg.

    → per numbering: ``(ordering, n_edges, total_bits,
    bits_per_edge_ppm)``.

    Reference analog: none — engine extension (SURVEY §2.10 E144).
    """
    from .frontier import ordered_seq

    v = vertices.select(F.col(id_col).alias("vid"),
                        F.col(host_col).alias("h"))
    e = (edges.select(F.col(src).cast("long").alias("s"),
                      F.col(dst).cast("long").alias("d"))
          .filter(F.col("s") != F.col("d")).distinct())

    def cost(mapping: DataFrame, name: str) -> DataFrame:
        m = mapping.select(F.col("vid"), F.col("r"))
        ed = (e.join(m.select(F.col("vid").alias("s"),
                              F.col("r").alias("rs")), "s")
              .join(m.select(F.col("vid").alias("d"),
                             F.col("r").alias("rd")), "d"))
        w = Window.partitionBy("rs").orderBy("rd")
        gap = F.coalesce(F.col("rd") - F.lag("rd").over(w),
                         F.abs(F.col("rd") - F.col("rs")))
        bits = (F.length(F.bin(gap)) * 2 - 1).cast("long")
        return (ed.select(bits.alias("b"))
                .agg(F.lit(name).alias("ordering"),
                     F.count(F.lit(1)).cast("long").alias("n_edges"),
                     F.sum("b").cast("long").alias("total_bits"))
                .withColumn("bits_per_edge_ppm",
                            F.expr("total_bits * 1000000 div n_edges")
                            .cast("long")))

    orig = v.select("vid", F.col("vid").cast("long").alias("r"))
    grouped = ordered_seq(v.select("vid", "h"), ["h", "vid"],
                          out_col="r", small_hint=small_hint) \
        .select("vid", "r")
    return (cost(orig, "original")
            .unionByName(cost(grouped, "host_grouped")))


def front_coding_audit(urls: DataFrame, group_col: str = "host",
                       url_col: str = "url") -> DataFrame:
    """Front-coding (incremental/prefix encoding) audit of the sorted
    URL store (E192) — the storage question a 10^10-URL frontier
    answers before choosing a layout: sorted-by-URL runs share long
    prefixes (scheme + host + path stems), and front coding stores
    each entry as (lcp, suffix).  Per group: how many bytes does the
    prefix share actually save, and what entry overhead would erase
    the win?  (The classic WebGraph/Lucene term-dictionary encoding;
    the reference stores full TEXT urls per row,
    pkg/linkstorage/linkstorage.go schema.)

    Exact construction: URLs sort within their group (the layout's
    natural partition — per-host runs are where the shared stems
    live), ``lag`` pairs each URL with its predecessor, and the LCP
    is ``max{ i : prefix_i(a) = prefix_i(b) }`` — prefix equality is
    monotone in i, so one transform over 1..min(len) + array_max is
    the exact LCP with no UDF (O(L²) char compares per pair; URL L
    is bounded, and both engines evaluate the identical formula).

    → per group: ``(group, n_urls, raw_bytes, saved_bytes,
    saved_ppm, net_saved_1b_ppm)`` where the net figure charges the
    standard 1-byte-per-entry LCP-length overhead (vbyte) — negative
    net means front coding LOSES on this group's URL shapes.

    Scale shape: ONE group-keyed window sort (the layout write pays
    this sort anyway), a codegen'd LCP projection, one group agg.
    Skewed hot hosts ride the same mitigation the politeness window
    uses (bounded per-group output: one row).
    """
    paired = (urls.select(F.col(group_col).alias("g"),
                          F.col(url_col).alias("u"))
              .withColumn("p", F.lag("u").over(
                  Window.partitionBy("g").orderBy("u"))))
    lcp = F.when(
        F.col("p").isNull(), F.lit(0)
    ).otherwise(F.coalesce(F.array_max(F.expr(
        "transform(sequence(1, greatest(least(length(u), length(p)), "
        "1)), i -> IF(substring(u, 1, i) = substring(p, 1, i), i, 0))"
    )), F.lit(0)))
    per = paired.withColumn("lcp", lcp.cast("long"))
    return (per.groupBy(F.col("g").alias(group_col))
            .agg(F.count(F.lit(1)).cast("long").alias("n_urls"),
                 F.sum(F.length("u")).cast("long").alias("raw_bytes"),
                 F.sum("lcp").cast("long").alias("saved_bytes"))
            .select(group_col, "n_urls", "raw_bytes", "saved_bytes",
                    F.expr("saved_bytes * 1000000 div raw_bytes")
                    .cast("long").alias("saved_ppm"),
                    # net can go NEGATIVE (tiny prefixes lose to the
                    # 1-byte overhead) — true-floor via the pmod
                    # identity so Spark's truncating div matches
                    # DuckDB's floor //
                    F.expr("((saved_bytes - n_urls) * 1000000 "
                           "- pmod((saved_bytes - n_urls) * 1000000, "
                           "raw_bytes)) div raw_bytes").cast("long")
                    .alias("net_saved_1b_ppm")))


def encoding_plan(df: DataFrame, cols: list[str]) -> DataFrame:
    """Dictionary-vs-plain encoding chooser (E241) — the layout
    decision parquet writers make per column chunk, priced exactly
    BEFORE a 100 TB rewrite: per column the plain cost (Σ value
    bytes), the dictionary cost (Σ distinct-value bytes + n_rows
    fixed-width codes of ⌈log₂ n_distinct⌉ bits), and the verdict
    with its floor-ppm savings.  A high-cardinality column (doc_id,
    text) correctly refuses dictionary; a low-cardinality one (lang,
    source) wins big — the audit twin of E140's zonemap pricing.

    → per column: ``(col_name, n_rows, n_distinct, plain_bytes,
    dict_bytes, code_bits, dict_total_bytes, use_dictionary,
    savings_ppm)`` (savings negative when dictionary LOSES).

    Scale shape: ONE melt scan (in-row struct explode to
    (col, value) pairs) → one (col, value) hash agg (map-side
    partials absorb repeats — the dictionary candidates themselves)
    → one |cols|-key fold.  No per-column re-scan, no window, no
    Python; bit-width via length(bin(·)) (the E144 γ-cost trick),
    integer-exact in any engine.

    Reference analog: none — engine extension (SURVEY §2.10 E241).
    """
    pairs = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.coalesce(F.col(c).cast("string"), F.lit(""))
                 .alias("val"))
        for c in cols])).alias("p")).select("p.col_name", "p.val")
    vg = (pairs.groupBy("col_name", "val")
          .agg(F.count(F.lit(1)).cast("long").alias("n")))
    per = (vg.groupBy("col_name")
           .agg(F.sum("n").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
                F.sum(F.octet_length("val") * F.col("n")).cast("long")
                .alias("plain_bytes"),
                F.sum(F.octet_length("val")).cast("long")
                .alias("dict_bytes")))
    return (per
            .withColumn("code_bits",
                        F.expr("CASE WHEN n_distinct <= 1 THEN 0 "
                               "ELSE length(bin(n_distinct - 1)) END")
                        .cast("long"))
            .withColumn("dict_total_bytes",
                        F.expr("dict_bytes + "
                               "(n_rows * code_bits + 7) div 8")
                        .cast("long"))
            .withColumn("use_dictionary",
                        F.col("dict_total_bytes") < F.col("plain_bytes"))
            .withColumn("savings_ppm",
                        F.expr("CASE WHEN plain_bytes > 0 THEN "
                               "(plain_bytes - dict_total_bytes) "
                               "* 1000000 div plain_bytes END")
                        .cast("long")))
