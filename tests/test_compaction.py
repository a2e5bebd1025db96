"""WaveStore segment compaction: read() equality, time travel, crash
recovery, size-tiered merge bounds, bucketed-layout survival, and the
crawler's compact_every loop hook (storage.py compaction section)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from web_graph_spark import fixtures
from web_graph_spark.crawler import SparkCrawler, load_web
from web_graph_spark.storage import WaveStore


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _mk_store(spark, root, n_waves=6, rows_per_wave=40, **kw):
    st = WaveStore(spark, str(root), **kw)
    for w in range(n_waves):
        df = spark.range(w * rows_per_wave, (w + 1) * rows_per_wave).select(
            F.sha1(F.col("id").cast("string")).alias("page_id"))
        st.write("seen", df, w)
        st.commit(w, next_seq=0)
    return st


@pytest.mark.spark
def test_compaction_preserves_reads_and_time_travel(spark, tmp_path):
    a = _mk_store(spark, tmp_path / "plain")
    b = _mk_store(spark, tmp_path / "compacted")
    before = _rows(b.read("seen"))
    b.compact(upto=3, names=["seen"])
    b.compact(names=["seen"])  # rest of the tail
    # live wave dirs ≤ the segment frontier are gone, segments exist
    assert b._live_waves("seen") == []
    assert b._segments("seen")
    assert _rows(b.read("seen")) == before == _rows(a.read("seen"))
    # per-row wave survives as a data column → max_wave time travel
    for k in (0, 2, 4):
        assert _rows(b.read("seen", max_wave=k)) == \
            _rows(a.read("seen", max_wave=k)), k


@pytest.mark.spark
def test_size_tiered_merge_bounds_segment_count(spark, tmp_path):
    st = _mk_store(spark, tmp_path / "tiered", n_waves=8)
    for w in range(8):
        st.compact(upto=w, names=["seen"])
    segs = st._segments("seen")
    # equal-size waves under factor-2 tiering collapse to O(log n)
    assert 1 <= len(segs) <= 4, segs
    # contiguity + coverage of the full wave range
    assert segs[0]["lo"] == 0 and segs[-1]["hi"] == 7
    for s1, s2 in zip(segs, segs[1:]):
        assert s2["lo"] == s1["hi"] + 1
    assert st.read("seen").count() == 8 * 40


@pytest.mark.spark
def test_crash_between_segment_write_and_marker(spark, tmp_path):
    st = _mk_store(spark, tmp_path / "crash1")
    before = _rows(st.read("seen"))
    # simulate: a segment dir was fully written but the marker update
    # never happened (crash) — an unreferenced seg_ dir
    fake = os.path.join(st._seg_root("seen"), "seg_0_2")
    os.makedirs(fake)
    with open(os.path.join(fake, "part-junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    st2 = WaveStore(spark, str(tmp_path / "crash1"))  # reopen → cleanup
    assert not os.path.isdir(fake)
    assert _rows(st2.read("seen")) == before


@pytest.mark.spark
def test_crash_between_marker_and_source_delete(spark, tmp_path):
    st = _mk_store(spark, tmp_path / "crash2")
    before = _rows(st.read("seen"))
    st.compact(upto=2, names=["seen"])
    # resurrect an already-merged wave dir (deletion "crashed"): rows
    # now exist in BOTH a segment and a live dir
    seg_hi = st._segments("seen")[-1]["hi"]
    assert seg_hi == 2
    df = spark.range(0, 40).select(
        F.sha1(F.col("id").cast("string")).alias("page_id"))
    df.write.parquet(os.path.join(st._dir("seen"), "wave=0"),
                     mode="overwrite")
    # the reader must NOT double-count: live dirs ≤ seg_hi are ignored
    st2 = WaveStore(spark, str(tmp_path / "crash2"))
    assert _rows(st2.read("seen")) == before
    assert 0 not in st2._live_waves("seen")  # swept on open


@pytest.mark.spark
@pytest.mark.parametrize("bucketed", [False, True])
def test_crawl_with_compaction_equals_without(spark, tmp_path, bucketed):
    d = tmp_path / "fix"
    d.mkdir()
    fixtures.generate_fixtures(str(d), seed=42, n_pages=70, n_hosts=8)
    web = load_web(spark, str(d))
    seeds = spark.read.parquet(f"{d}/seeds.parquet")

    def run(path, **kw):
        c = SparkCrawler(spark, str(path), web, max_waves=4,
                         default_budget=3, **kw)
        c.init_from_seeds(seeds)
        c.run()
        return c.store

    a = run(tmp_path / "plain")
    b = run(tmp_path / "compact", compact_every=2,
            bucketed_state=bucketed, n_buckets=4)
    assert b._segments("seen"), "compaction never ran"
    for t in ("crawl_order", "pages", "edges", "seen", "frontier_log"):
        assert _rows(a.read(t)) == _rows(b.read(t)), t


@pytest.mark.spark
def test_resume_on_top_of_segments(spark, tmp_path):
    """Kill AFTER a compaction (plus an uncommitted half-wave on disk);
    the resumed crawl over segment-backed state must match an
    uninterrupted run."""
    d = tmp_path / "fix"
    d.mkdir()
    fixtures.generate_fixtures(str(d), seed=42, n_pages=70, n_hosts=8)
    web = load_web(spark, str(d))
    seeds = spark.read.parquet(f"{d}/seeds.parquet")

    def crawler(path, max_waves, **kw):
        c = SparkCrawler(spark, str(path), web, max_waves=max_waves,
                         default_budget=3, **kw)
        c.init_from_seeds(seeds)
        return c

    a = crawler(tmp_path / "plain", 4)
    a.run()

    b1 = crawler(tmp_path / "compact", 2, compact_every=2)
    b1.run()
    assert b1.store.committed_wave() == 1
    assert b1.store._segments("seen")
    # crash leftovers: an uncommitted wave=2 dir
    junk = os.path.join(str(tmp_path / "compact"), "seen", "wave=2")
    spark.range(5).select(F.sha1(F.col("id").cast("string"))
                          .alias("page_id")).write.parquet(junk)
    b2 = crawler(tmp_path / "compact", 4, compact_every=2)
    b2.run()
    for t in ("crawl_order", "pages", "edges", "seen", "frontier_log"):
        assert _rows(a.store.read(t)) == _rows(b2.store.read(t)), t


@pytest.mark.spark
def test_cuckoo_resume_rebuilds_from_compacted_seen(spark, tmp_path):
    """seen_mode='cuckoo' + compact_every: kill after a compaction AND
    delete the blob partitions — resume must rebuild the filter from
    the SEGMENT-backed seen table and still match an exact-mode run."""
    d = tmp_path / "fix"
    d.mkdir()
    fixtures.generate_fixtures(str(d), seed=42, n_pages=70, n_hosts=8)
    web = load_web(spark, str(d))
    seeds = spark.read.parquet(f"{d}/seeds.parquet")

    def crawler(path, max_waves, **kw):
        c = SparkCrawler(spark, str(path), web, max_waves=max_waves,
                         default_budget=3, **kw)
        c.init_from_seeds(seeds)
        return c

    a = crawler(tmp_path / "exact", 4)
    a.run()

    b1 = crawler(tmp_path / "ck", 2, seen_mode="cuckoo", compact_every=2)
    b1.run()
    assert b1.store._segments("seen"), "compaction never ran"
    # blob GC keeps only the latest wave's cuckoo_state partitions
    assert b1.store._live_waves("cuckoo_state") == [1]
    # crash scenario: blobs lost entirely → rebuild-from-seen path,
    # which now reads a segment, not wave dirs
    shutil.rmtree(os.path.join(str(tmp_path / "ck"), "cuckoo_state"))
    b2 = crawler(tmp_path / "ck", 4, seen_mode="cuckoo", compact_every=2)
    b2.run()
    for t in ("crawl_order", "pages", "edges", "seen", "frontier_log"):
        assert _rows(a.store.read(t)) == _rows(b2.store.read(t)), t
