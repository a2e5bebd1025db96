"""Structured Streaming front-door to the crawl engine (SURVEY.md §2.8).

The reference's runtime is an unbounded select loop over a persistent
queue (/root/reference/cmd/link-processor/main.go:208-224); the wave
loop in ``crawler.py`` is its deterministic batch-iteration rebuild.
This module adds the genuinely-streaming pieces for deployments where
URLs/events *arrive* continuously:

* :func:`enqueue_stream` — the streaming enqueue path (S3 + D3):
  URL files land in an inbox directory; each micro-batch canonicalizes
  (vectorized pandas UDF tier), applies admission (F1-F7), and passes a
  STATEFUL ``dropDuplicates("page_id")`` — the streaming twin of the
  reference's enqueue-time LRU
  (/root/reference/pkg/linkqueue/linkqueue.go:69-76), except exact:
  state lives in the checkpoint, so restarts keep the dedupe guarantee
  (goque persistence ≡ checkpointLocation).  Accepted rows append to a
  parquet frontier-inbox table, exactly-once per the file-source +
  checkpoint contract.
* :func:`hourly_events_stream` — watermarked tumbling-window aggregate
  over an event stream (the T1-style metrics feed): 1-hour windows,
  late data bounded by the watermark, all JVM-side.

Scale notes: the file source lists the inbox incrementally
(``maxFilesPerTrigger`` bounds batch size); dedupe state is hash
partitioned across executors by Spark's state store — at 10^10 URLs
the retention window (``dedupe_ttl``) bounds state like the
reference's 48h TTL cache
(/root/reference/pkg/linkprocessor/linkprocessor.go:43).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from .canon import canonicalize_df

INBOX_SCHEMA = "url string, arrival_ts timestamp"


def canonical_admissible(urls: DataFrame) -> DataFrame:
    """Shared enqueue projection: canonicalize → admission → the
    frontier-row shape (page_id, url, host, path)."""
    c = canonicalize_df(urls, url_col="url", mode="pandas")
    return (c.filter(F.col("canon.page_id").isNotNull()
                     & F.col("canon.admissible"))
            .select(F.col("canon.page_id").alias("page_id"),
                    F.col("canon.url_norm").alias("url"),
                    F.col("canon.host").alias("host"),
                    F.col("canon.path").alias("path"),
                    "arrival_ts"))


def enqueue_stream(spark: SparkSession, inbox_dir: str, out_dir: str,
                   checkpoint_dir: str, dedupe_ttl: str | None = None,
                   max_files_per_trigger: int = 64) -> StreamingQuery:
    """Start the streaming enqueue pipeline; returns the query handle.

    dedupe_ttl (e.g. ``"48 hours"``): bound dedupe state with a
    watermark on arrival time, mirroring the reference's TTL cache;
    None keeps exact unbounded state (sandbox scale).
    """
    raw = (spark.readStream.schema(INBOX_SCHEMA)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(inbox_dir))
    rows = canonical_admissible(raw)
    if dedupe_ttl is not None:
        rows = (rows.withWatermark("arrival_ts", dedupe_ttl)
                .dropDuplicatesWithinWatermark(["page_id"]))
    else:
        rows = rows.dropDuplicates(["page_id"])
    return (rows.writeStream
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())


def host_budget_stream(spark: SparkSession, inbox_dir: str, out_dir: str,
                       checkpoint_dir: str, budget: int = 100,
                       max_files_per_trigger: int = 64) -> StreamingQuery:
    """Custom stateful operator via ``applyInPandasWithState``: a
    streaming per-host admission limiter — the streaming twin of the
    batch politeness budget (operators/politeness.py, O4).

    State per host = URLs admitted so far (a single int64).  Each
    micro-batch admits a host's rows in ``arrival_ts, url`` order until
    the lifetime budget is spent; the excess is dropped (a production
    deployment would divert it to a backlog table).  Unlike the batch
    window rank this bound survives across micro-batches AND restarts,
    because the counter lives in the checkpointed state store —
    semantics no built-in streaming operator expresses (stream-dedupe
    keeps identity, not counts; windowed aggs emit aggregates, not
    admitted rows).

    Scale: state is one int per host, hash-partitioned by the group
    key across executors; per-batch work is Arrow-batched pandas.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    raw = (spark.readStream.schema(INBOX_SCHEMA)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(inbox_dir))
    rows = canonical_admissible(raw)

    out_schema = ("page_id string, url string, host string, path string, "
                  "arrival_ts timestamp, admit_rank long")
    state_schema = "n_admitted long"

    def admit(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        # a group's rows may span several Arrow batches — concat before
        # sorting so FIFO (arrival_ts, url) holds across the whole
        # micro-batch, not per chunk.  Memory = one host's batch slice.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks and n < budget:
            allr = (pd.concat(chunks, ignore_index=True)
                    .sort_values(["arrival_ts", "url"], kind="mergesort"))
            take = allr.iloc[: budget - n].copy()
            take["admit_rank"] = range(n, n + len(take))
            n += len(take)
            yield take[["page_id", "url", "host", "path", "arrival_ts",
                        "admit_rank"]]
        state.update((n,))

    admitted = (rows.groupBy("host").applyInPandasWithState(
        admit, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout))
    return (admitted.writeStream
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())


def host_rate_stream(spark: SparkSession, inbox_dir: str, out_dir: str,
                     checkpoint_dir: str, rate_per_s: float = 1.0,
                     burst: int = 1,
                     max_files_per_trigger: int = 64) -> StreamingQuery:
    """Streaming per-host RATE limiter — an event-time token bucket in
    ``applyInPandasWithState``: the streaming twin of the batch
    crawl-delay budgets (robots.py budgets_from_crawl_delay derives
    pages/wave from delay; here the delay is enforced continuously).

    State per host = ``(tokens_µ, last_ts_µs)``: tokens refill at
    ``rate_per_s`` per EVENT-TIME second (integer micro-tokens — the
    arithmetic is exact and replays identically on restart, unlike
    wall-clock buckets), capped at ``burst`` whole tokens; a row is
    admitted iff a whole token is available, which then drains.  Rows
    are processed in (arrival_ts, url) order, so the admit/drop
    decision is a pure function of the input stream — checkpoint
    resume or full replay reproduces it bit-for-bit (hand-computed
    admits + restart continuation pinned in tests/test_streaming.py).

    host_budget_stream bounds LIFETIME pages per host; this bounds the
    page RATE — the two compose (budget upstream, rate downstream) the
    same way the batch loop stacks budget and wave_period.  Scale:
    state is two int64s per host, hash-partitioned by group key.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    raw = (spark.readStream.schema(INBOX_SCHEMA)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(inbox_dir))
    rows = canonical_admissible(raw)

    out_schema = ("page_id string, url string, host string, path string, "
                  "arrival_ts timestamp, tokens_left_u long")
    state_schema = "tokens_u long, last_ts_us long"
    token_u = 1_000_000
    rate_u_per_s = int(rate_per_s * token_u)  # µtokens per second
    burst_u = burst * token_u

    def admit(key, pdfs, state: GroupState):
        if state.exists:
            tokens_u, last_us = state.get
        else:
            tokens_u, last_us = burst_u, None  # bucket starts full
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allr = (pd.concat(chunks, ignore_index=True)
                    .sort_values(["arrival_ts", "url"], kind="mergesort"))
            # epoch µs regardless of the Arrow/pandas datetime unit
            ts_us = (allr["arrival_ts"].values
                     .astype("datetime64[us]").astype("int64"))
            keep, left = [], []
            for t in ts_us:
                if last_us is not None and t > last_us:
                    # integer refill: µtokens = Δµs · rate_µ/s ÷ 10^6
                    tokens_u = min(burst_u, tokens_u
                                   + (int(t - last_us) * rate_u_per_s)
                                   // token_u)
                # the bucket clock is MONOTONE: a late row (event time
                # below the high-water mark) draws from the current
                # bucket without refilling it — the conservative
                # choice, and it keeps resumed runs from double-
                # counting refill across a regression.
                last_us = max(int(t), last_us or 0)
                if tokens_u >= token_u:
                    tokens_u -= token_u
                    keep.append(True)
                    left.append(tokens_u)
                else:
                    keep.append(False)
                    left.append(-1)
            allr["tokens_left_u"] = left
            out = allr[pd.Series(keep).values]
            if len(out):
                yield out[["page_id", "url", "host", "path",
                           "arrival_ts", "tokens_left_u"]]
        state.update((int(tokens_u), int(last_us or 0)))

    admitted = (rows.groupBy("host").applyInPandasWithState(
        admit, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout))
    return (admitted.writeStream
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())


def hourly_events_stream(spark: SparkSession, events_dir: str,
                         schema: str | None = None,
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming tumbling-window aggregate: (window, event_type, n,
    sum_value_c) with late data bounded by ``watermark``.  Batch twin:
    ``__spark_entry__.q_events_hourly`` (same grouping/encoding)."""
    if schema is None:
        schema = ("event_id bigint, user_id bigint, ts timestamp, "
                  "event_type string, value double")
    ev = spark.readStream.schema(schema).parquet(events_dir)
    return (ev.withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.floor(F.sum("value") * 100).cast("long")
                  .alias("sum_value_c"))
            .select(F.col("w.start").alias("hour"), "event_type",
                    "n", "sum_value_c"))


def watermark_audit(events: DataFrame, delay_s: int = 1800,
                    ts_col: str = "ts", arrival_col: str = "arrival_us",
                    batch_us: int = 3_600_000_000) -> DataFrame:
    """Batch-replay certification of the streaming watermark drop
    rule: Structured Streaming advances the global watermark per
    trigger to ``max(event time seen in PRIOR triggers) − delay`` and
    drops rows older than it — this operator replays that exact rule
    over a bounded log carrying an arrival timestamp, so a deployment
    can AUDIT (count, identify, bound) what its chosen delay would
    discard before committing to it.

    Triggers are modeled as fixed ``batch_us`` buckets of arrival
    time.  All arithmetic is exact epoch-microsecond integers; the
    watermark of the first batch is NULL (nothing prior → nothing
    late), matching the engine's cold start.

    Scale shape: one fact scan + one batch-grain max-agg (map-side
    partials), a running-max window over the BATCH DIM (never the
    facts), one uniform batch-key join back, one batch-grain count
    agg — the fact table is never globally sorted or windowed.

    Returns per batch: ``(batch_id, wm_us, n_total, n_late,
    late_digest)`` where late_digest certifies the exact late set
    (md5 over the sorted late event ids)."""
    from pyspark.sql import Window

    ev = events.select(
        F.col("event_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("event_us"),
        F.col(arrival_col),
        F.expr(f"{arrival_col} div {batch_us}").alias("batch_id"))
    dim = (ev.groupBy("batch_id")
           .agg(F.max("event_us").alias("bmax")))
    w = (Window.orderBy("batch_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    dim = dim.select(
        "batch_id",
        (F.max("bmax").over(w) - F.lit(delay_s) * 1_000_000)
        .alias("wm_us"))
    j = ev.join(dim, "batch_id")
    late = F.col("event_us") < F.col("wm_us")   # NULL wm -> false
    return (j.groupBy("batch_id")
            .agg(F.min("wm_us").alias("wm_us"),
                 F.count(F.lit(1)).cast("long").alias("n_total"),
                 F.sum(F.when(late, 1).otherwise(0)).cast("long")
                 .alias("n_late"),
                 F.md5(F.array_join(F.array_sort(F.collect_list(
                     F.when(late, F.col("event_id").cast("string")))),
                     "|")).alias("late_digest")))


def stream_join_audit(left: DataFrame, right: DataFrame,
                      window_s: int = 14_400, delay_s: int = 1800,
                      key_col: str = "user_id",
                      arrival_col: str = "arrival_us",
                      batch_us: int = 3_600_000_000) -> DataFrame:
    """Batch-replay audit of a streaming stream-stream interval join
    (``left ⋈ right ON key AND r.ts ∈ [l.ts, l.ts + window]``) under
    Structured Streaming's watermark semantics — the two questions a
    deployment must answer before turning one on:

    * **Correctness**: which join results are LOST because one side
      arrived later than the watermark delay tolerates?  (A late row
      is dropped at entry and every pair it participated in is never
      emitted.)  Per trigger batch: ``n_lost`` + an exact sorted
      pair-id digest.
    * **Capacity**: how many rows does each side's join STATE hold at
      every trigger?  State is the cluster-memory bill; this replays
      the exact watermark-correct retention — a left row lives until
      ``wm > event_us + window``, a right row until ``wm > event_us``
      — and reports per-batch occupancy from interval deltas.

    A property this replay makes visible (and the tests pin): with
    watermark-CORRECT eviction thresholds, eviction never loses a
    pair that lateness didn't already lose — for an on-time right
    row, its matching left rows satisfy ``l.ts ≥ r.ts − window ≥
    wm − window``, so their state outlives the match (and vice
    versa).  Lost joins are therefore exactly the late-entry ones;
    state size is the only cost axis the delay knob trades against.

    Watermark model (same as :func:`watermark_audit`, two-stream
    form): triggers = fixed ``batch_us`` buckets of arrival time;
    ``wm(b) = min(max event time of each stream over batches < b)
    − delay``, NULL until both streams have history (Spark's global
    watermark is the min over per-stream watermarks; cold start
    evicts nothing).

    Shape at scale: facts aggregate to the batch grain once per side
    (map-side partials); every window (running maxes, lag, occupancy
    cumsums) runs over the BATCH DIM — bounded by elapsed wall time,
    never by volume.  The candidate join is a key-equi join with a
    range residual (uniform user keys).  Eviction batches come from a
    broadcast range join of row thresholds against the wm step
    function — facts × a time-bounded dim.  Output: one row per
    trigger batch ``(batch_id, wm_us, state_l, state_r, n_emit,
    n_lost, lost_digest)``.

    Reference analog: none — engine extension (SURVEY §2.10 E115).
    """
    from pyspark.sql import Window

    w_us = window_s * 1_000_000
    big_neg = -(1 << 62)

    def prep(df):
        return df.select(
            F.col("event_id"),
            F.col(key_col).alias("k"),
            F.unix_micros(F.col("ts").cast("timestamp"))
            .alias("event_us"),
            F.expr(f"{arrival_col} div {batch_us}").alias("b"))

    lv, rv = prep(left), prep(right)
    bl = lv.groupBy("b").agg(F.max("event_us").alias("lm"))
    br = rv.groupBy("b").agg(F.max("event_us").alias("rm"))
    dim0 = bl.join(br, "b", "full")
    wprior = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1)
    dim = dim0.select(
        "b", F.max("lm").over(wprior).alias("lrun"),
        F.max("rm").over(wprior).alias("rrun"))
    dim = dim.select(
        "b",
        F.when(F.col("lrun").isNull() | F.col("rrun").isNull(),
               F.lit(None).cast("long"))
        .otherwise(F.least("lrun", "rrun")
                   - F.lit(delay_s * 1_000_000)).alias("wm_us"))
    dim = F.broadcast(dim)

    # wm step function: (pw, wm] intervals over non-null wm batches
    dim_e = (dim.where(F.col("wm_us").isNotNull())
             .select("b", "wm_us",
                     F.coalesce(F.lag("wm_us").over(Window.orderBy("b")),
                                F.lit(big_neg)).alias("pw")))
    dim_e = F.broadcast(dim_e)

    def with_late(rows):
        return (rows.join(dim.withColumnRenamed("b", "__b")
                          .withColumnRenamed("wm_us", "__wm"),
                          F.col("b") == F.col("__b"))
                .withColumn("late",
                            F.coalesce(F.col("event_us") < F.col("__wm"),
                                       F.lit(False)))
                .drop("__b", "__wm"))

    lrows = with_late(lv).withColumn("thr",
                                     F.col("event_us") + F.lit(w_us))
    rrows = with_late(rv).withColumn("thr", F.col("event_us"))

    # state occupancy: +1 at arrival, -1 at the first batch whose wm
    # exceeds the row's retention threshold
    def deltas(rows, side):
        on_time = rows.where(~F.col("late"))
        ev = (on_time.join(
            dim_e.select(F.col("b").alias("eb"), "wm_us", "pw"),
            (F.col("thr") >= F.col("pw")) & (F.col("thr") < F.col("wm_us")),
            "left"))
        arr = on_time.select("b", F.lit(1).alias("d"))
        out = ev.where(F.col("eb").isNotNull()).select(
            F.col("eb").alias("b"), F.lit(-1).alias("d"))
        return (arr.union(out).groupBy("b")
                .agg(F.sum("d").alias(f"d_{side}")))

    dl, dr = deltas(lrows, "l"), deltas(rrows, "r")
    wcum = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0)
    series = (dim.select("b", "wm_us")
              .join(dl, "b", "left").join(dr, "b", "left")
              .select("b", "wm_us",
                      F.sum(F.coalesce("d_l", F.lit(0))).over(wcum)
                      .cast("long").alias("state_l"),
                      F.sum(F.coalesce("d_r", F.lit(0))).over(wcum)
                      .cast("long").alias("state_r")))

    # candidate pairs: emitted at max(b_l, b_r) unless either side late
    la = lrows.select(F.col("event_id").alias("lid"), "k",
                      F.col("event_us").alias("lus"),
                      F.col("b").alias("b_l"),
                      F.col("late").alias("late_l"))
    ra = rrows.select(F.col("event_id").alias("rid"),
                      F.col("k").alias("k_r"),
                      F.col("event_us").alias("rus"),
                      F.col("b").alias("b_r"),
                      F.col("late").alias("late_r"))
    cand = (la.join(ra, (F.col("k") == F.col("k_r"))
                    & (F.col("rus") >= F.col("lus"))
                    & (F.col("rus") <= F.col("lus") + F.lit(w_us)))
            .select(F.greatest("b_l", "b_r").alias("b"),
                    (F.col("late_l") | F.col("late_r")).alias("lost"),
                    F.concat(F.col("lid").cast("string"), F.lit(":"),
                             F.col("rid").cast("string")).alias("pid")))
    emits = (cand.groupBy("b")
             .agg(F.sum(F.when(~F.col("lost"), 1).otherwise(0))
                  .cast("long").alias("n_emit"),
                  F.sum(F.when(F.col("lost"), 1).otherwise(0))
                  .cast("long").alias("n_lost"),
                  F.md5(F.array_join(F.array_sort(F.collect_list(
                      F.when(F.col("lost"), F.col("pid")))), "|"))
                  .alias("lost_digest")))

    return (series.join(emits, "b", "left")
            .select(F.col("b").cast("long").alias("batch_id"),
                    "wm_us", "state_l", "state_r",
                    F.coalesce("n_emit", F.lit(0)).cast("long")
                    .alias("n_emit"),
                    F.coalesce("n_lost", F.lit(0)).cast("long")
                    .alias("n_lost"),
                    F.coalesce("lost_digest",
                               F.md5(F.lit(""))).alias("lost_digest")))


def session_stream(spark: SparkSession, events_dir: str, out_dir: str,
                   checkpoint_dir: str, gap_s: int = 1800,
                   max_files_per_trigger: int = 64) -> StreamingQuery:
    """Streaming session windows via ``applyInPandasWithState`` — the
    third custom stateful pattern next to host_budget (lifetime
    counter) and host_rate (token bucket): CROSS-BATCH session
    assembly, the thing a per-micro-batch groupBy gets wrong (a
    session straddling two batches must merge, not split).

    State per user = the OPEN session ``(start_us, last_us, n)``.
    Each batch processes the user's rows in (ts, event_id) order; a
    gap STRICTLY greater than ``gap_s`` event-time seconds closes
    the open session (emitted downstream) and starts a new one —
    the exact rule of the batch sessionizer
    (``__spark_entry__.q_events_sessionize``), so closed sessions
    are bit-comparable against the batch twin on the same data
    (tests pin it across a batch boundary).  The final open session
    per user stays in state — correctly so: its closing gap hasn't
    been observed; a terminal flush is the caller's policy, not the
    operator's.

    Determinism: admit order is a pure function of event time +
    event_id, state is integer epochs — checkpoint resume or full
    replay reproduces the output stream bit-for-bit.  Scale: state
    is three int64s per ACTIVE user, hash-partitioned by key.

    → sink rows (user_id, session_start_us, session_end_us,
    n_events).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    schema = ("event_id bigint, user_id bigint, ts timestamp, "
              "event_type string, value double")
    ev = (spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", max_files_per_trigger)
          .parquet(events_dir))
    out_schema = ("user_id long, session_start_us long, "
                  "session_end_us long, n_events long")
    state_schema = "start_us long, last_us long, n long"
    gap_us = gap_s * 1_000_000

    def assemble(key, pdfs, state: GroupState):
        start = last = n = None
        if state.exists:
            start, last, n = state.get
        chunks = [pdf for pdf in pdfs if len(pdf)]
        closed = []
        if chunks:
            allr = (pd.concat(chunks, ignore_index=True)
                    .sort_values(["ts", "event_id"], kind="mergesort"))
            ts_us = (allr["ts"].values
                     .astype("datetime64[us]").astype("int64"))
            for t in ts_us:
                t = int(t)
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_us:
                    closed.append((key[0], start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = max(last, t), n + 1
        if closed:
            yield pd.DataFrame(closed, columns=[
                "user_id", "session_start_us", "session_end_us",
                "n_events"])
        if start is not None:
            state.update((int(start), int(last), int(n)))

    sessions = (ev.groupBy("user_id").applyInPandasWithState(
        assemble, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout))
    return (sessions.writeStream
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
