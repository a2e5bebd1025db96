"""Structured Streaming operators: stateful streaming enqueue-dedupe
(exactly-once across micro-batches and restarts) and the watermarked
windowed event aggregate vs its batch twin."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from web_graph_spark import streaming

TS = dt.datetime(2024, 1, 1, 12, 0, 0)


def _write_inbox(path: str, urls: list[str], minute: int) -> None:
    ts = [TS + dt.timedelta(minutes=minute)] * len(urls)
    pq.write_table(
        pa.table({"url": pa.array(urls, pa.string()),
                  "arrival_ts": pa.array(ts, pa.timestamp("us"))}),
        path)


@pytest.mark.spark
def test_enqueue_stream_dedupes_across_batches(spark, tmp_path):
    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    inbox.mkdir()

    # batch 1: two pages (one via two alias URLs) + one inadmissible
    _write_inbox(str(inbox / "b1.parquet"), [
        "https://a.test/x.html",
        "http://a.test/x.html?utm=1",          # same page_id as above
        "https://b.test/y.htm",
        "ftp://nope.test/z.html",              # scheme-filtered (F1)
    ], minute=0)
    q = streaming.enqueue_stream(spark, str(inbox), str(out), str(ckpt))
    q.awaitTermination()

    got1 = spark.read.parquet(str(out))
    assert got1.count() == 2
    assert {r["host"] for r in got1.collect()} == {"a.test", "b.test"}

    # batch 2 (restart = new query, same checkpoint): replays one dup
    # from batch 1 plus one genuinely new URL — state must hold
    _write_inbox(str(inbox / "b2.parquet"), [
        "https://a.test/x.html",               # already enqueued
        "https://c.test/new.html",
    ], minute=5)
    q2 = streaming.enqueue_stream(spark, str(inbox), str(out), str(ckpt))
    q2.awaitTermination()

    rows = spark.read.parquet(str(out)).collect()
    by_host = sorted(r["host"] for r in rows)
    assert by_host == ["a.test", "b.test", "c.test"]
    pids = [r["page_id"] for r in rows]
    assert len(pids) == len(set(pids))


@pytest.mark.spark
def test_enqueue_stream_ttl_variant_runs(spark, tmp_path):
    """dropDuplicatesWithinWatermark path (the 48h-TTL analog)."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    _write_inbox(str(inbox / "b1.parquet"),
                 ["https://a.test/1.html", "https://a.test/1.html"], 0)
    q = streaming.enqueue_stream(spark, str(inbox), str(tmp_path / "out"),
                                 str(tmp_path / "ckpt"),
                                 dedupe_ttl="48 hours")
    q.awaitTermination()
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1


@pytest.mark.spark
def test_hourly_stream_matches_batch(spark, tmp_path):
    """Streaming windowed agg over the sf0.001 events == batch twin."""
    from tests.conftest import SF_SMOKE

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    os.symlink(os.path.join(SF_SMOKE, "events.parquet"),
               events_dir / "events.parquet")

    sdf = streaming.hourly_events_stream(spark, str(events_dir))
    q = (sdf.writeStream.format("memory").queryName("hourly_t")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["hour"], r["event_type"]): (r["n"], r["sum_value_c"])
           for r in spark.sql("select * from hourly_t").collect()}

    import __spark_entry__ as e
    want = {(r["hour"], r["event_type"]): (r["n"], r["sum_value_c"])
            for r in e.queries()["events_hourly"](spark, SF_SMOKE).collect()}
    assert got == want


@pytest.mark.spark
def test_host_budget_stream_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState per-host admission counter: budget holds
    within a batch, across micro-batches, and across restarts."""
    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    inbox.mkdir()

    # batch 1: host a has 4 candidates, budget 3 → admit 3 (FIFO by ts)
    _write_inbox(str(inbox / "b1.parquet"), [
        "https://a.test/1.html", "https://a.test/2.html",
        "https://a.test/3.html", "https://a.test/4.html",
        "https://b.test/1.html",
    ], minute=0)
    q = streaming.host_budget_stream(spark, str(inbox), str(out),
                                     str(ckpt), budget=3)
    q.awaitTermination()
    got1 = spark.read.parquet(str(out))
    assert got1.filter(F.col("host") == "a.test").count() == 3
    assert got1.filter(F.col("host") == "b.test").count() == 1

    # batch 2 after restart: a is exhausted (state persisted), b has 2
    # left of its budget
    _write_inbox(str(inbox / "b2.parquet"), [
        "https://a.test/5.html",
        "https://b.test/2.html", "https://b.test/3.html",
        "https://b.test/4.html", "https://b.test/5.html",
    ], minute=5)
    q2 = streaming.host_budget_stream(spark, str(inbox), str(out),
                                      str(ckpt), budget=3)
    q2.awaitTermination()
    rows = spark.read.parquet(str(out))
    assert rows.filter(F.col("host") == "a.test").count() == 3  # unchanged
    assert rows.filter(F.col("host") == "b.test").count() == 3  # capped
    ranks = sorted(r["admit_rank"] for r in
                   rows.filter(F.col("host") == "b.test").collect())
    assert ranks == [0, 1, 2]


@pytest.mark.spark
def test_streaming_inbox_feeds_wave_loop(spark, tmp_path):
    """The streaming front-door reaches the engine (VERDICT r2 #5):
    URL files streamed through enqueue_stream land in the frontier
    inbox, a crawler started with ``inbox_dir`` drains them as wave-0
    frontier rows, and the final crawl state is bit-identical to a
    batch crawl seeded with the same URLs in the same order."""
    from web_graph_spark.benchjobs import synth_consistent_web
    from web_graph_spark.crawler import SparkCrawler

    web = synth_consistent_web(spark, 2000)
    num = F.regexp_extract("url", r"/d/([0-9]+)\.html", 1).cast("long")
    seed_rows = (web.withColumn("__n", num).filter(F.col("__n") < 20)
                 .select(F.col("__n").alias("seq"), "url")
                 .orderBy("seq").collect())
    urls = [r["url"] for r in seed_rows]

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    # two files; arrival_ts strictly increases with seed order, so the
    # inbox (arrival_ts, url) sequence equals the batch seed sequence
    for fi, lo in enumerate((0, 10)):
        chunk = urls[lo:lo + 10]
        ts = [TS + dt.timedelta(seconds=lo + i) for i in range(len(chunk))]
        pq.write_table(
            pa.table({"url": pa.array(chunk, pa.string()),
                      "arrival_ts": pa.array(ts, pa.timestamp("us"))}),
            str(inbox / f"b{fi}.parquet"))
    q = streaming.enqueue_stream(spark, str(inbox),
                                 str(tmp_path / "front"),
                                 str(tmp_path / "ckpt"))
    q.awaitTermination()

    a = SparkCrawler(spark, str(tmp_path / "a"), web, max_waves=3,
                     default_budget=7, inbox_dir=str(tmp_path / "front"))
    a.init_from_seeds(spark.createDataFrame([], "seq long, url string"))
    a.run()
    b = SparkCrawler(spark, str(tmp_path / "b"), web, max_waves=3,
                     default_budget=7)
    b.init_from_seeds(spark.createDataFrame(
        [(r["seq"], r["url"]) for r in seed_rows], "seq long, url string"))
    b.run()
    for t in ("crawl_order", "pages", "edges", "seen", "docs_out",
              "frontier_log"):
        ra = sorted(map(tuple, a.store.read(t).drop("wave").collect()))
        rb = sorted(map(tuple, b.store.read(t).drop("wave").collect()))
        assert ra and ra == rb, t


@pytest.mark.spark
def test_inbox_follow_mode_keeps_polling(spark, tmp_path):
    """inbox_mode='follow' (ADVICE r3 #2): a continuous front-door
    crawler must NOT terminate the first time frontier and inbox are
    both drained — empty waves defer and the loop keeps polling until
    max_waves, picking up arrivals that land between waves."""
    from web_graph_spark.benchjobs import synth_consistent_web
    from web_graph_spark.crawler import SparkCrawler

    web = synth_consistent_web(spark, 500)
    num = F.regexp_extract("url", r"/d/([0-9]+)\.html", 1).cast("long")
    urls = [r["url"] for r in
            (web.withColumn("__n", num).filter(F.col("__n") < 4)
             .select("__n", "url").orderBy("__n").collect())]

    raw = tmp_path / "raw"
    raw.mkdir()
    front, ckpt = str(tmp_path / "front"), str(tmp_path / "ckpt")
    _write_inbox(str(raw / "b1.parquet"), urls[:2], minute=0)
    q = streaming.enqueue_stream(spark, str(raw), front, ckpt)
    q.awaitTermination()

    # drain mode (default): stops as soon as frontier + inbox empty
    a = SparkCrawler(spark, str(tmp_path / "a"), web, max_waves=8,
                     default_budget=100, inbox_dir=front)
    a.init_from_seeds(spark.createDataFrame([], "seq long, url string"))
    waves_a = a.run()
    assert waves_a < 8

    # follow mode: runs to max_waves even when idle...
    b = SparkCrawler(spark, str(tmp_path / "b"), web, max_waves=4,
                     default_budget=100, inbox_dir=front,
                     inbox_mode="follow")
    b.init_from_seeds(spark.createDataFrame([], "seq long, url string"))
    assert b.run() == 4
    seen_before = b.store.read("seen").count()
    # ...and a later session picks up arrivals written after the first
    # drain (the idempotence anti-join skips everything already known)
    _write_inbox(str(raw / "b2.parquet"), urls[2:], minute=5)
    q2 = streaming.enqueue_stream(spark, str(raw), front, ckpt)
    q2.awaitTermination()
    b.max_waves = 10
    assert b.run() == 10
    assert b.store.read("seen").count() > seen_before
    from web_graph_spark.canon import canonicalize_df

    late_ids = {r["canon"]["page_id"] for r in canonicalize_df(
        spark.createDataFrame([(i, u) for i, u in enumerate(urls[2:])],
                              "seq long, url string"),
        url_col="url").select("canon").collect()}
    crawled = {r["page_id"] for r in
               b.store.read("crawl_order").select("page_id").collect()}
    assert late_ids <= crawled               # late arrivals were crawled


def _write_inbox_ts(path: str, rows: list[tuple[str, float]]) -> None:
    """(url, second-offset) rows — per-row timestamps for rate tests."""
    pq.write_table(
        pa.table({"url": pa.array([u for u, _ in rows], pa.string()),
                  "arrival_ts": pa.array(
                      [TS + dt.timedelta(seconds=s) for _, s in rows],
                      pa.timestamp("us"))}),
        path)


@pytest.mark.spark
def test_host_rate_stream_token_bucket(spark, tmp_path):
    """E49 event-time token bucket (the streaming crawl-delay): at
    rate=1/s, burst=1 the admits follow the hand-computed integer
    µtoken arithmetic exactly, the bucket level survives a restart
    (checkpointed state), and a control host with sparse arrivals is
    untouched."""
    inbox = tmp_path / "inbox"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    inbox.mkdir()

    # host a: burst admits t=0; 0.4/0.7 under-refilled; 1.2 refills to
    # cap (admit); 1.5 rejected with 0.3 tokens left in state
    _write_inbox_ts(str(inbox / "b1.parquet"), [
        ("https://a.test/p0.html", 0.0),
        ("https://a.test/p1.html", 0.4),
        ("https://a.test/p2.html", 0.7),
        ("https://a.test/p3.html", 1.2),
        ("https://a.test/p4.html", 1.5),
        ("https://b.test/q0.html", 0.0),
        ("https://b.test/q1.html", 9.0),
    ])
    q = streaming.host_rate_stream(spark, str(inbox), str(out),
                                   str(ckpt), rate_per_s=1.0, burst=1)
    q.awaitTermination()
    got = {r["path"] for r in spark.read.parquet(str(out))
           .filter(F.col("host") == "a.test").collect()}
    assert got == {"/p0.html", "/p3.html"}
    assert spark.read.parquet(str(out)) \
        .filter(F.col("host") == "b.test").count() == 2

    # restart: clock=1.5s, tokens=0.3 → t=2.2 refills +0.7 = 1.0 cap →
    # admit; t=2.5 rejected (0.3 again).  State loss would instead
    # grant a full burst and admit both.
    _write_inbox_ts(str(inbox / "b2.parquet"), [
        ("https://a.test/p5.html", 2.2),
        ("https://a.test/p6.html", 2.5),
    ])
    q2 = streaming.host_rate_stream(spark, str(inbox), str(out),
                                    str(ckpt), rate_per_s=1.0, burst=1)
    q2.awaitTermination()
    got2 = {r["path"] for r in spark.read.parquet(str(out))
            .filter(F.col("host") == "a.test").collect()}
    assert got2 == {"/p0.html", "/p3.html", "/p5.html"}


@pytest.mark.spark
def test_sitemap_feeds_streaming_inbox(spark, tmp_path):
    """End-to-end publish path: sitemap XML → <loc> extraction →
    sitemap_to_inbox parquet → enqueue_stream → canonicalized,
    admission-filtered, deduped frontier rows.  Child-sitemap locs
    (is_index) and inadmissible schemes must not reach the frontier."""
    from web_graph_spark.operators.sitemap import (sitemap_locs,
                                                   sitemap_to_inbox)

    urlset = ('<urlset>'
              '<url><loc>https://a.test/one.html</loc></url>'
              '<url><loc>https://a.test/one.html?utm=x</loc></url>'
              '<url><loc>ftp://a.test/nope.html</loc></url>'
              '<url><loc>https://b.test/two.html</loc></url></urlset>')
    index = ('<sitemapindex><sitemap>'
             '<loc>https://c.test/child.xml</loc>'
             '</sitemap></sitemapindex>')
    docs = spark.createDataFrame([("a.test", urlset), ("c.test", index)],
                                 "host string, xml string")
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    (sitemap_to_inbox(sitemap_locs(docs), TS)
     .coalesce(1).write.mode("append").parquet(str(inbox)))

    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = streaming.enqueue_stream(spark, str(inbox), str(out), str(ckpt))
    q.awaitTermination()
    rows = sorted((r["host"], r["path"])
                  for r in spark.read.parquet(str(out)).collect())
    # utm alias dedupes to the same page_id; ftp admission-filtered;
    # the child sitemap never enters the page inbox
    assert rows == [("a.test", "/one.html"), ("b.test", "/two.html")]


@pytest.mark.spark
def test_watermark_audit_replays_drop_rule(spark):
    """Hand-traced watermark semantics: first batch has a NULL
    watermark (cold start, nothing late); wm(b) = max event time of
    PRIOR batches minus delay; an event exactly AT the watermark is
    on time (strict <); the late digest certifies the exact id set."""
    import datetime as dt
    import hashlib

    from web_graph_spark.streaming import watermark_audit

    t = lambda s: dt.datetime(1970, 1, 1) + dt.timedelta(seconds=s)
    H = 3_600_000_000            # one arrival-hour in micros
    rows = [
        (1, t(100), 0 * H),      # batch 0: wm NULL -> on time
        (2, t(50), 1 * H),       # batch 1: wm 99s -> LATE
        (3, t(200), 1 * H),      # batch 1: on time
        (4, t(199), 2 * H),      # batch 2: wm 199s -> AT wm, on time
        (5, t(198), 2 * H),      # batch 2: LATE
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, arrival_us long")
    got = {r.batch_id: (r.wm_us, r.n_total, r.n_late, r.late_digest)
           for r in watermark_audit(df, delay_s=1).collect()}
    dg = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert got == {
        0: (None, 1, 0, dg("")),
        1: (99_000_000, 2, 1, dg("2")),
        2: (199_000_000, 2, 1, dg("5")),
    }


def _sim_join_audit(lrows, rrows, window_s, delay_s, batch_us):
    """Independent brute-force replay of stream_join_audit's
    documented rule (pure python)."""
    import hashlib

    w_us, d_us = window_s * 1_000_000, delay_s * 1_000_000
    lb = [(i, e, a // batch_us) for i, e, a in lrows]
    rb = [(i, e, a // batch_us) for i, e, a in rrows]
    batches = sorted({b for _, _, b in lb} | {b for _, _, b in rb})
    wm = {}
    for b in batches:
        ml = [e for _, e, bb in lb if bb < b]
        mr = [e for _, e, bb in rb if bb < b]
        wm[b] = (min(max(ml), max(mr)) - d_us) if ml and mr else None

    def late(e, b):
        return wm[b] is not None and e < wm[b]

    nn = sorted((b for b in batches if wm[b] is not None),
                key=lambda b: b)
    out = {}
    for b in batches:
        sl = sum(1 for _, e, bb in lb if bb <= b and not late(e, bb)
                 and not any(wm[x] is not None and wm[x] > e + w_us
                             for x in nn if bb < x <= b))
        sr = sum(1 for _, e, bb in rb if bb <= b and not late(e, bb)
                 and not any(wm[x] is not None and wm[x] > e
                             for x in nn if bb < x <= b))
        out[b] = [wm[b], sl, sr, 0, 0, []]
    for li, le, lbb in lb:
        for ri, re, rbb in rb:
            if le <= re <= le + w_us:
                be = max(lbb, rbb)
                if late(le, lbb) or late(re, rbb):
                    out[be][4] += 1
                    out[be][5].append(f"{li}:{ri}")
                else:
                    out[be][3] += 1
    for b in out:
        dig = hashlib.md5(
            "|".join(sorted(out[b][5])).encode()).hexdigest()
        out[b][5] = dig
    return {b: tuple(v) for b, v in out.items()}


@pytest.mark.spark
def test_stream_join_audit_matches_simulator(spark):
    from pyspark.sql import functions as F

    from web_graph_spark.streaming import stream_join_audit

    lrows = [(i, i * 700_000,
              i * 700_000 + (i * i * 37) % 5_000_000)
             for i in range(0, 60, 2)]
    rrows = [(1000 + i, i * 650_000 + 300_000,
              i * 650_000 + 300_000 + (i * 13) % 7_000_000)
             for i in range(1, 60, 2)]

    def mk(rows):
        return spark.createDataFrame(
            [(i, e / 1e6, a, 7) for i, e, a in rows],
            "event_id long, sec double, arrival_us long, user_id long"
        ).select("event_id", "user_id",
                 F.timestamp_seconds("sec").alias("ts"), "arrival_us")

    got = {r.batch_id: (r.wm_us, r.state_l, r.state_r, r.n_emit,
                        r.n_lost, r.lost_digest)
           for r in stream_join_audit(
               mk(lrows), mk(rrows), window_s=3, delay_s=1,
               batch_us=1_000_000).collect()}
    exp = _sim_join_audit(lrows, rrows, 3, 1, 1_000_000)
    assert got == exp
    # state occupancy never negative, watermark monotone
    wms = [got[b][0] for b in sorted(got) if got[b][0] is not None]
    assert wms == sorted(wms)
    assert all(got[b][1] >= 0 and got[b][2] >= 0 for b in got)


@pytest.mark.spark
def test_stream_join_audit_no_eviction_loss_theorem(spark):
    """With watermark-correct retention, every pair whose rows are
    both on time is EMITTED — eviction never loses a pair lateness
    didn't already lose.  With an effectively infinite delay nothing
    is ever late, so the audit must emit exactly the batch join."""
    from pyspark.sql import functions as F

    from web_graph_spark.operators.graph_algos import _hex16
    from web_graph_spark.streaming import stream_join_audit
    from tests.conftest import SF_SMOKE

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id", "event_type", "ts",
        (F.unix_micros(F.col("ts").cast("timestamp"))
         + (_hex16(F.col("event_id").cast("string")) % 21600)
         * 1_000_000).alias("arrival_us"))
    l = ev.where(F.col("event_type") == "click")
    r = ev.where(F.col("event_type") == "purchase")
    out = stream_join_audit(l, r, window_s=14_400,
                            delay_s=10_000_000).collect()
    assert sum(x.n_lost for x in out) == 0
    truth = l.alias("a").join(
        r.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") >= F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr(
            "INTERVAL 14400 SECONDS"))).count()
    assert sum(x.n_emit for x in out) == truth


def _write_events(path, rows):
    """rows = (user_id, event_id, epoch_s)."""
    import pandas as pd

    pdf = pd.DataFrame({
        "event_id": [r[1] for r in rows],
        "user_id": [r[0] for r in rows],
        "ts": pd.to_datetime([r[2] * 1_000_000_000 for r in rows])
        .astype("datetime64[us]"),
        "event_type": "view",
        "value": 1.0,
    })
    pdf.to_parquet(path)


@pytest.mark.spark
def test_session_stream_merges_across_batches(spark, tmp_path):
    """A session straddling two micro-batches/restarts merges into
    ONE closed session (the per-batch-groupBy failure mode), closed
    sessions equal the batch sessionizer's rule, and the open tail
    stays unemitted."""
    events = tmp_path / "events"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    events.mkdir()

    # user 1: events at t=0, 600 (same session)… batch boundary …
    # t=1200 (still same session), t=5000 (gap 3800 > 1800 → closes
    # the first session, opens a new one that stays open)
    # user 2: single event (stays open, never emitted)
    _write_events(str(events / "b1.parquet"),
                  [(1, 10, 0), (1, 11, 600), (2, 20, 100)])
    q = streaming.session_stream(spark, str(events), str(out),
                                 str(ckpt), gap_s=1800)
    q.awaitTermination()
    import os

    n1 = (spark.read.parquet(str(out)).count()
          if os.path.exists(str(out)) and os.listdir(str(out)) else 0)
    assert n1 == 0  # nothing closed yet — no gap observed

    _write_events(str(events / "b2.parquet"),
                  [(1, 12, 1200), (1, 13, 5000)])
    q2 = streaming.session_stream(spark, str(events), str(out),
                                  str(ckpt), gap_s=1800)
    q2.awaitTermination()
    rows = spark.read.parquet(str(out)).collect()
    assert len(rows) == 1  # exactly the one closed session
    r = rows[0]
    assert r["user_id"] == 1
    # merged across the batch boundary: 0..1200, three events
    assert (r["session_start_us"], r["session_end_us"],
            r["n_events"]) == (0, 1_200_000_000, 3)


@pytest.mark.spark
def test_session_stream_multiple_closures_one_batch(spark, tmp_path):
    """Several gaps inside one batch close several sessions in order,
    matching the batch sessionizer's strict-gap rule at the
    boundary (gap == 1800 does NOT split)."""
    events = tmp_path / "events"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    events.mkdir()
    _write_events(str(events / "b1.parquet"), [
        (5, 1, 0), (5, 2, 1800),          # gap exactly 1800 → same
        (5, 3, 10_000),                   # closes (0..1800, n=2)
        (5, 4, 20_000),                   # closes (10000..10000, n=1)
        (5, 5, 20_100),                   # open tail
    ])
    q = streaming.session_stream(spark, str(events), str(out),
                                 str(ckpt), gap_s=1800)
    q.awaitTermination()
    rows = sorted(
        ((r["session_start_us"], r["session_end_us"], r["n_events"])
         for r in spark.read.parquet(str(out)).collect()))
    assert rows == [(0, 1_800_000_000, 2),
                    (10_000_000_000, 10_000_000_000, 1)]
