"""Probabilistic seen-set tiers (operators/seen.py): no false
negatives ever; FP rate within bound; bloom-accelerated anti-join is
bit-identical to the exact anti-join (D1); cuckoo supports delete."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from web_graph_spark.operators.seen import (BloomFilter, CuckooFilter,
                                            PartitionedCuckooSeen,
                                            anti_join_bloom, build_bloom)


def keys(prefix: str, n: int) -> pd.Series:
    return pd.Series([f"{prefix}-{i:06d}" for i in range(n)])


# ---------------------------------------------------------------------------
# pure-python units
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_fp_bound():
    ins, probe = keys("in", 20000), keys("out", 20000)
    bf = BloomFilter.sized(20000, fpp=0.01)
    bf.add(ins)
    assert bf.might_contain(ins).all()
    fp_rate = bf.might_contain(probe).mean()
    assert fp_rate < 0.02, fp_rate


def test_bloom_merge_is_union():
    a, b = BloomFilter.sized(1000, 0.01), BloomFilter.sized(1000, 0.01)
    ka, kb = keys("a", 500), keys("b", 500)
    a.add(ka)
    b.add(kb)
    a.merge(b)
    assert a.might_contain(ka).all() and a.might_contain(kb).all()


def test_cuckoo_membership_and_fp_bound():
    ins, probe = keys("in", 30000), keys("out", 30000)
    cf = CuckooFilter.sized(30000)
    assert cf.insert(ins) == 0
    assert cf.contains(ins).all()
    fp_rate = cf.contains(probe).mean()
    assert fp_rate < 0.002, fp_rate  # ~1.2e-4 expected


def test_cuckoo_delete():
    cf = CuckooFilter.sized(1000)
    ks = keys("k", 1000)
    assert cf.insert(ks) == 0
    gone = ks[:300]
    assert cf.delete(gone) == 300
    # deleted keys may still FP via other keys' fingerprints, but the
    # overwhelming majority must be gone; survivors must all remain.
    assert cf.contains(ks[300:]).all()
    assert cf.contains(gone).mean() < 0.01


def test_cuckoo_idempotent_insert():
    cf = CuckooFilter.sized(100)
    ks = keys("k", 50)
    cf.insert(ks)
    before = cf.table.copy()
    cf.insert(ks)  # duplicate insert is a no-op (already present)
    assert (cf.table == before).all()


# ---------------------------------------------------------------------------
# spark integration
# ---------------------------------------------------------------------------

@pytest.mark.spark
def test_anti_join_bloom_equals_exact(spark):
    """Default path (now sharded — VERDICT r3 #6) and the explicit
    legacy single-bitmap path both ≡ the exact anti-join."""
    cand = spark.range(0, 5000).select(
        F.sha1(F.col("id").cast("string")).alias("page_id"))
    seen = spark.range(0, 3000, 2).select(  # every even id < 3000
        F.sha1(F.col("id").cast("string")).alias("page_id"))
    exact = {r["page_id"] for r in
             cand.join(seen, "page_id", "left_anti").collect()}
    fast = {r["page_id"] for r in
            anti_join_bloom(spark, cand, seen, "page_id").collect()}
    assert fast == exact
    assert len(fast) == 5000 - 1500
    legacy = {r["page_id"] for r in
              anti_join_bloom(spark, cand, seen, "page_id",
                              n_slabs=1).collect()}
    assert legacy == exact


@pytest.mark.spark
def test_build_bloom_distributed_matches_local(spark):
    df = spark.range(0, 4000).select(
        F.concat(F.lit("u-"), F.col("id")).alias("k")).repartition(8)
    bf = build_bloom(df, "k", expected=4000, fpp=0.01)
    local = pd.Series([f"u-{i}" for i in range(4000)])
    assert bf.might_contain(local).all()
    other = pd.Series([f"v-{i}" for i in range(4000)])
    assert bf.might_contain(other).mean() < 0.02


@pytest.mark.spark
def test_partitioned_cuckoo_probe(spark):
    seen = spark.range(0, 6000).select(
        F.concat(F.lit("s-"), F.col("id")).alias("page_id")).repartition(8)
    pc = PartitionedCuckooSeen(n_parts=8, expected_per_part=2000)
    states = pc.build(seen, "page_id").persist()
    st = states.collect()
    assert {int(r["shard"]) for r in st} == set(range(8))
    assert sum(r["n_keys"] for r in st) == 6000

    cand = spark.range(0, 12000).select(
        F.concat(F.lit("s-"), F.col("id")).alias("page_id"))
    probed = pc.probe(spark, states, cand, "page_id").collect()
    res = {r["page_id"]: r["maybe_seen"] for r in probed}
    # no false negatives
    assert all(res[f"s-{i}"] for i in range(6000))
    # FP bound on the unseen half
    fp = np.mean([res[f"s-{i}"] for i in range(6000, 12000)])
    assert fp < 0.002, fp
    states.unpersist()


@pytest.mark.spark
def test_anti_join_bloom_sharded_equals_exact(spark):
    """Slab tier (n_slabs>1): per-slab build/merge/probe with no
    driver-side bitmap — result ≡ exact anti-join."""
    cand = spark.range(0, 5000).select(
        F.sha1(F.col("id").cast("string")).alias("page_id"))
    seen = spark.range(0, 3000, 2).select(
        F.sha1(F.col("id").cast("string")).alias("page_id"))
    exact = {r["page_id"] for r in
             cand.join(seen, "page_id", "left_anti").collect()}
    fast = {r["page_id"] for r in
            anti_join_bloom(spark, cand, seen, "page_id",
                            n_slabs=4).collect()}
    assert fast == exact
    assert len(fast) == 5000 - 1500


@pytest.mark.spark
def test_cuckoo_update_incremental(spark):
    """update() ≡ build() over the union, membership-wise: no false
    negatives on old or new keys; FP bound holds on unseen keys."""
    base = spark.range(0, 4000).select(
        F.concat(F.lit("s-"), F.col("id")).alias("page_id"))
    extra = spark.range(4000, 6000).select(
        F.concat(F.lit("s-"), F.col("id")).alias("page_id"))
    pc = PartitionedCuckooSeen(n_parts=4, expected_per_part=4000)
    st0 = pc.build(base, "page_id").localCheckpoint()
    st1 = pc.update(st0, extra, "page_id").localCheckpoint()
    assert sum(r["n_keys"] for r in st1.collect()) == 6000
    cand = spark.range(0, 12000).select(
        F.concat(F.lit("s-"), F.col("id")).alias("page_id"))
    res = {r["page_id"]: r["maybe_seen"] for r in
           pc.probe(spark, st1, cand, "page_id").collect()}
    assert all(res[f"s-{i}"] for i in range(6000))
    fp = np.mean([res[f"s-{i}"] for i in range(6000, 12000)])
    assert fp < 0.002, fp


@pytest.mark.spark
def test_crawler_cuckoo_seen_equals_exact(spark, fixture_dir, tmp_path):
    """seen_mode='cuckoo' (persisted shard blobs, incremental update,
    exact backstop) is a pure physical optimization."""
    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")

    def run(mode, d):
        c = SparkCrawler(spark, d, web, max_waves=3, seen_mode=mode,
                         cuckoo_shards=4)
        c.init_from_seeds(seeds)
        c.run()
        return c.store

    a = run("exact", str(tmp_path / "cx"))
    b = run("cuckoo", str(tmp_path / "ck"))
    for t in ("crawl_order", "pages", "edges", "seen"):
        ra = sorted(map(tuple, a.read(t).drop("wave").collect()))
        rb = sorted(map(tuple, b.read(t).drop("wave").collect()))
        assert ra == rb, t
    # blobs were persisted per committed wave
    assert b.read("cuckoo_state").count() > 0


@pytest.mark.spark
def test_crawler_cuckoo_resume_missing_blobs(spark, fixture_dir,
                                             tmp_path):
    """Kill-and-resume with DELETED cuckoo blobs: the tier rebuilds its
    shard states from the exact seen table and the finished crawl
    matches an uninterrupted exact-mode run."""
    import shutil as _sh

    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    d = str(tmp_path / "ckr")
    c1 = SparkCrawler(spark, d, web, max_waves=2, seen_mode="cuckoo",
                      cuckoo_shards=4)
    c1.init_from_seeds(seeds)
    c1.run()
    _sh.rmtree(f"{d}/cuckoo_state")  # lose every blob
    c2 = SparkCrawler(spark, d, web, max_waves=4, seen_mode="cuckoo",
                      cuckoo_shards=4)
    c2.init_from_seeds(seeds)  # no-op on resume
    c2.run()
    ref = SparkCrawler(spark, str(tmp_path / "ckref"), web, max_waves=4)
    ref.init_from_seeds(seeds)
    ref.run()
    for t in ("crawl_order", "pages", "edges", "seen"):
        ra = sorted(map(tuple, c2.store.read(t).drop("wave").collect()))
        rb = sorted(map(tuple, ref.store.read(t).drop("wave").collect()))
        assert ra == rb, t


@pytest.mark.spark
def test_crawler_bloom_seen_equals_exact(spark, fixture_dir, tmp_path):
    """seen_mode='bloom' is a pure physical optimization: final
    crawl_order, pages, edges, and seen set are bit-identical."""
    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")

    def run(mode, d):
        c = SparkCrawler(spark, d, web, max_waves=3, seen_mode=mode)
        c.init_from_seeds(seeds)
        c.run()
        return c.store

    a = run("exact", str(tmp_path / "exact"))
    b = run("bloom", str(tmp_path / "bloom"))
    for t in ("crawl_order", "pages", "edges", "seen"):
        ra = sorted(map(tuple, a.read(t).drop("wave").collect()))
        rb = sorted(map(tuple, b.read(t).drop("wave").collect()))
        assert ra == rb, t


@pytest.mark.spark
def test_bloom_expected_from_manifests_matches_table(spark, tmp_path):
    """The bloom tier sizes its filter from manifest counters instead
    of a per-wave seen.count() scan (VERDICT r2 #3): the reconstruction
    (scheduled + blocked per committed wave) must equal the actual seen
    table count — including robots-blocked rows — both live (in-memory
    increments) and on resume (fresh crawler, manifests only)."""
    from web_graph_spark.benchjobs import synth_consistent_web
    from web_graph_spark.crawler import SparkCrawler

    web = synth_consistent_web(spark, 2000)
    num = F.regexp_extract("url", r"/d/([0-9]+)\.html", 1).cast("long")
    seeds = (web.withColumn("__n", num).filter(F.col("__n") < 20)
             .select(F.col("__n").alias("seq"), "url"))
    hosts = web.select(F.regexp_extract(
        "url", r"https?://([^/]+)/", 1).alias("host")).distinct()
    # block a path prefix on some hosts so blocked rows reach `seen`
    rules = hosts.select(
        "host", F.lit("disallow").alias("rule_type"),
        F.lit("/d/1").alias("path_prefix"),
        F.lit(0.0).alias("crawl_delay"))
    c = SparkCrawler(spark, str(tmp_path / "s"), web, max_waves=3,
                     default_budget=7, seen_mode="bloom", robots=rules)
    c.init_from_seeds(seeds)
    c.run()
    n_table = c.store.read("seen").count()
    assert n_table > 0
    assert c._seen_rows == n_table          # live tracking
    # resume path: fresh crawler reconstructs from manifests alone
    c2 = SparkCrawler(spark, str(tmp_path / "s"), web, max_waves=3,
                      default_budget=7, seen_mode="bloom", robots=rules)
    assert c2._seen_rows_upto(c2.store.committed_wave()) == n_table


@pytest.mark.spark
def test_incremental_bloom_update_equals_rebuild(spark):
    """IncrementalBloomSeen: OR-ing new keys into persisted slabs must
    probe exactly like a fresh build over the union — no false
    negatives ever, all slabs present even when empty, and
    needs_rebuild fires only past capacity."""
    from web_graph_spark.operators.seen import IncrementalBloomSeen

    ib = IncrementalBloomSeen(n_slabs=4, headroom=4.0)
    base = spark.range(0, 5000).select(
        F.concat(F.lit("k-"), F.col("id")).alias("page_id"))
    extra = spark.range(5000, 9000).select(
        F.concat(F.lit("k-"), F.col("id")).alias("page_id"))

    st0 = ib.build(base, "page_id", n_keys=5000).localCheckpoint()
    assert st0.count() == 4                       # every slab has a row
    assert not IncrementalBloomSeen.needs_rebuild(st0)
    st1 = ib.update(st0, extra, "page_id").localCheckpoint()
    assert st1.count() == 4
    assert st1.agg(F.sum("n_keys")).first()[0] == 9000

    cand = spark.range(0, 12000).select(
        F.concat(F.lit("k-"), F.col("id")).alias("page_id"))
    new, maybe = ib.partition(st1, cand, "page_id")
    maybe_ids = {r["page_id"] for r in maybe.collect()}
    # no false negatives: every inserted key is in maybe
    for i in (0, 4999, 5000, 8999):
        assert f"k-{i}" in maybe_ids, i
    assert new.count() + len(maybe_ids) == 12000
    # fp rate among the 3000 never-inserted keys stays near target
    fp = sum(1 for r in maybe_ids if int(r[2:]) >= 9000) / 3000
    assert fp < 0.05, fp

    # probing the incrementally-updated state == probing a fresh build
    st_fresh = ib.build(base.unionByName(extra), "page_id",
                        n_keys=9000)
    # (different capacity ⇒ different bitmaps; compare CONTRACT, not
    # bits: both must contain all inserted keys)
    _, maybe_f = ib.partition(st_fresh, cand, "page_id")
    inserted = {f"k-{i}" for i in range(9000)}
    assert inserted <= {r["page_id"] for r in maybe_f.collect()}
    assert inserted <= maybe_ids

    # capacity: push past headroom*build size → rebuild flag
    tiny = IncrementalBloomSeen(n_slabs=2, headroom=1.0)
    st = tiny.build(base.limit(100), "page_id", n_keys=100)
    st = tiny.update(st, extra, "page_id")
    assert IncrementalBloomSeen.needs_rebuild(st)


@pytest.mark.spark
def test_crawler_bloom_state_persists_and_rebuilds(spark, fixture_dir,
                                                   tmp_path):
    """The bloom tier's state is persisted per wave (no O(|seen|)
    rebuild scan in steady state) and rebuilt from the exact seen
    table when the blobs are deleted — final state identical either
    way."""
    import shutil

    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")

    def crawl(d, waves, **kw):
        c = SparkCrawler(spark, str(d), web, max_waves=waves,
                         default_budget=5, seen_mode="bloom", **kw)
        c.init_from_seeds(seeds)
        c.run()
        return c

    a = crawl(tmp_path / "a", 2)
    # state blobs exist for the latest committed wave only (pruned)
    st = a.store.read("bloom_state")
    waves = {r["wave"] for r in st.select("wave").distinct().collect()}
    assert waves == {a.store.committed_wave()}, waves
    # kill the filter state; resume must rebuild from `seen` and end
    # bit-identical to an uninterrupted crawl
    shutil.rmtree(tmp_path / "a" / "bloom_state")
    a2 = crawl(tmp_path / "a", 4)
    b = crawl(tmp_path / "b", 4)
    for t in ("crawl_order", "pages", "seen", "edges"):
        ra = sorted(map(tuple, a2.store.read(t).collect()))
        rb = sorted(map(tuple, b.store.read(t).collect()))
        assert ra == rb, t


# ---------------------------------------------------------------------------
# round-4: shard-count safety + auto-sizing (ADVICE r3 #1, VERDICT r3 #2)
# ---------------------------------------------------------------------------

@pytest.mark.spark
def test_crawler_bloom_resume_with_different_slabs_rebuilds(
        spark, fixture_dir, tmp_path):
    """Resuming with a DIFFERENT explicit bloom_slabs must rebuild the
    filter (persisted n_slabs mismatch), never route keys into the
    wrong slab's bitmap — a mis-route would emit false 'definitely
    new' verdicts and re-crawl seen pages (ADVICE r3 #1)."""
    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")

    def crawl(d, waves, slabs):
        c = SparkCrawler(spark, str(d), web, max_waves=waves,
                         default_budget=5, seen_mode="bloom",
                         bloom_slabs=slabs)
        c.init_from_seeds(seeds)
        c.run()
        return c

    crawl(tmp_path / "a", 2, 2)
    a = crawl(tmp_path / "a", 4, 4)          # resume, different slabs
    assert {int(r["n_slabs"]) for r in
            a.store.read("bloom_state").select("n_slabs").collect()} == {4}
    b = crawl(tmp_path / "b", 4, 4)          # uninterrupted reference
    for t in ("crawl_order", "pages", "seen", "edges"):
        ra = sorted(map(tuple, a.store.read(t).drop("wave").collect()))
        rb = sorted(map(tuple, b.store.read(t).drop("wave").collect()))
        assert ra == rb, t


@pytest.mark.spark
def test_crawler_cuckoo_resume_with_different_shards_rebuilds(
        spark, fixture_dir, tmp_path):
    """Same contract for the cuckoo tier: persisted n_parts wins over a
    mismatching config by forcing a rebuild at the new count."""
    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")

    def crawl(d, waves, shards):
        c = SparkCrawler(spark, str(d), web, max_waves=waves,
                         default_budget=5, seen_mode="cuckoo",
                         cuckoo_shards=shards)
        c.init_from_seeds(seeds)
        c.run()
        return c

    crawl(tmp_path / "a", 2, 4)
    a = crawl(tmp_path / "a", 4, 2)          # resume, different shards
    assert {int(r["n_parts"]) for r in
            a.store.read("cuckoo_state").select("n_parts").collect()} == {2}
    ref = SparkCrawler(spark, str(tmp_path / "ref"), web, max_waves=4,
                       default_budget=5)
    ref.init_from_seeds(seeds)
    ref.run()
    for t in ("crawl_order", "pages", "seen", "edges"):
        ra = sorted(map(tuple, a.store.read(t).drop("wave").collect()))
        rb = sorted(map(tuple, ref.store.read(t).drop("wave").collect()))
        assert ra == rb, t


@pytest.mark.spark
def test_bloom_auto_slab_count_grows_with_seen(spark, monkeypatch,
                                               tmp_path):
    """Default (auto) slab sizing: as |seen| grows past the capacity a
    state set was built for, the rebuild re-derives the slab COUNT so
    no persisted bitmap ever exceeds SLAB_BYTES_BOUND (VERDICT r3 #2 —
    a fixed count would make slabs grow into 12 GiB single-task blobs
    at 10^10 keys).  Bound shrunk + headroom 1× here so a 5-wave
    fixture crawl crosses several resizes; results stay ≡ exact."""
    from web_graph_spark.benchjobs import synth_consistent_web
    from web_graph_spark.crawler import SparkCrawler
    from web_graph_spark.operators.seen import IncrementalBloomSeen

    monkeypatch.setattr(IncrementalBloomSeen, "SLAB_BYTES_BOUND", 64)
    web = synth_consistent_web(spark, 2000)
    num = F.regexp_extract("url", r"/d/([0-9]+)\.html", 1).cast("long")
    seeds = (web.withColumn("__n", num).filter(F.col("__n") < 10)
             .select(F.col("__n").alias("seq"), "url"))

    c = SparkCrawler(spark, str(tmp_path / "a"), web, max_waves=2,
                     seen_mode="bloom")
    c._bloom.headroom = 1.0
    c.init_from_seeds(seeds)
    c.run()
    st0 = c.store.read("bloom_state").collect()
    slabs0 = {int(r["n_slabs"]) for r in st0}

    c2 = SparkCrawler(spark, str(tmp_path / "a"), web, max_waves=5,
                      seen_mode="bloom")
    c2._bloom.headroom = 1.0
    c2.init_from_seeds(seeds)
    c2.run()
    st1 = c2.store.read("bloom_state").collect()
    slabs1 = {int(r["n_slabs"]) for r in st1}
    assert len(slabs0) == 1 and len(slabs1) == 1
    assert slabs1.pop() > slabs0.pop()       # count grew with |seen|
    # every persisted bitmap respects the blob bound (+pad: the 64-bit
    # word floor and the +1 capacity round-up)
    assert max(len(r["words"]) for r in st1) <= 64 + 16

    ref = SparkCrawler(spark, str(tmp_path / "ref"), web, max_waves=5)
    ref.init_from_seeds(seeds)
    ref.run()
    for t in ("crawl_order", "pages", "seen", "edges"):
        ra = sorted(map(tuple, c2.store.read(t).drop("wave").collect()))
        rb = sorted(map(tuple, ref.store.read(t).drop("wave").collect()))
        assert ra == rb, t


@pytest.mark.spark
def test_cuckoo_auto_shard_count_grows_with_seen(spark, tmp_path):
    """Auto cuckoo sharding: a crawl whose |seen| outgrows the shard
    set's design capacity (n_parts × expected_per_part) rebuilds with
    more shards instead of overflowing — blobs stay bounded by
    construction (each shard is sized for expected_per_part keys)."""
    from web_graph_spark.benchjobs import synth_consistent_web
    from web_graph_spark.crawler import SparkCrawler

    web = synth_consistent_web(spark, 2000)
    num = F.regexp_extract("url", r"/d/([0-9]+)\.html", 1).cast("long")
    seeds = (web.withColumn("__n", num).filter(F.col("__n") < 10)
             .select(F.col("__n").alias("seq"), "url"))

    def crawl(waves):
        c = SparkCrawler(spark, str(tmp_path / "a"), web,
                         max_waves=waves, seen_mode="cuckoo",
                         cuckoo_expected_per_shard=32)
        c.init_from_seeds(seeds)
        c.run()
        return c

    c = crawl(2)
    parts0 = {int(r["n_parts"]) for r in
              c.store.read("cuckoo_state").select("n_parts").collect()}
    c2 = crawl(5)
    st = c2.store.read("cuckoo_state").collect()
    parts1 = {int(r["n_parts"]) for r in st}
    assert len(parts0) == 1 and len(parts1) == 1
    assert parts1.pop() > parts0.pop()
    # per-shard key load stays near the designed capacity (rebuild is
    # amortized — between rebuilds a shard may run somewhat past
    # expected_per_part, but never to the physical slot count)
    assert max(int(r["n_keys"]) for r in st) <= 64

    ref = SparkCrawler(spark, str(tmp_path / "ref"), web, max_waves=5)
    ref.init_from_seeds(seeds)
    ref.run()
    for t in ("crawl_order", "pages", "seen", "edges"):
        ra = sorted(map(tuple, c2.store.read(t).drop("wave").collect()))
        rb = sorted(map(tuple, ref.store.read(t).drop("wave").collect()))
        assert ra == rb, t


@pytest.mark.spark
def test_seen_rows_upto_falls_back_on_legacy_manifest(spark, fixture_dir,
                                                      tmp_path):
    """A manifest missing the 'scheduled'/'blocked' counter keys (older
    engine version / foreign writer) must NOT be silently counted as 0
    — |seen| reconstruction falls back to one exact table scan
    (ADVICE r3 #4)."""
    import json
    import os

    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    d = str(tmp_path / "s")
    c = SparkCrawler(spark, d, web, max_waves=2, seen_mode="bloom")
    c.init_from_seeds(seeds)
    c.run()
    n_table = c.store.read("seen").count()
    assert n_table > 0

    # strip the counters from wave-0's manifest (legacy format)
    p = os.path.join(d, "_checkpoints", "wave-0.json")
    with open(p) as f:
        m = json.load(f)
    m.pop("blocked", None)
    with open(p, "w") as f:
        json.dump(m, f)

    c2 = SparkCrawler(spark, d, web, max_waves=2, seen_mode="bloom")
    assert c2._seen_rows_upto(c2.store.committed_wave()) == n_table


@pytest.mark.spark
def test_filter_state_prune_deferred_until_commit(spark, fixture_dir,
                                                  tmp_path):
    """The previous wave's committed filter state must survive a crash
    between the new state's write and the wave's manifest commit —
    pruning at write time would force a full O(|seen|) rebuild on
    every such resume (ADVICE r3 #3)."""
    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    d = str(tmp_path / "s")
    c = SparkCrawler(spark, d, web, max_waves=2, seen_mode="cuckoo")
    c.init_from_seeds(seeds)
    c.run()
    committed = c.store.committed_wave()
    assert {r["wave"] for r in c.store.read("cuckoo_state")
            .select("wave").distinct().collect()} == {committed}

    c2 = SparkCrawler(spark, d, web, max_waves=4, seen_mode="cuckoo")
    real_commit = c2.store.commit
    def boom(wave, **extra):
        raise RuntimeError("crash before commit")
    c2.store.commit = boom
    with pytest.raises(RuntimeError, match="crash before commit"):
        c2.run()
    c2.store.commit = real_commit
    # the last COMMITTED state partition is still on disk — the
    # crashed wave's write did not prune it
    import os
    assert os.path.isdir(os.path.join(d, "cuckoo_state",
                                      f"wave={committed}"))
    # and a clean resume finishes ≡ an uninterrupted exact run
    c3 = SparkCrawler(spark, d, web, max_waves=4, seen_mode="cuckoo")
    c3.init_from_seeds(seeds)
    c3.run()
    ref = SparkCrawler(spark, str(tmp_path / "ref"), web, max_waves=4)
    ref.init_from_seeds(seeds)
    ref.run()
    for t in ("crawl_order", "pages", "seen", "edges"):
        ra = sorted(map(tuple, c3.store.read(t).drop("wave").collect()))
        rb = sorted(map(tuple, ref.store.read(t).drop("wave").collect()))
        assert ra == rb, t


def test_cuckoo_fill_check_raises_before_thrash():
    """Inserting past the design load must raise via the CHEAP
    pre-check — the kick-chain fallback near capacity costs a pandas
    hash per kick and can spend minutes before the overflow raise
    (observed: a 250 s crawl wave).  The message matches the insert
    raise so rebuild handling covers both."""
    cf = CuckooFilter.sized(1000)
    cap = int(cf.DESIGN_LOAD * cf.n_buckets * cf.SLOTS)
    cf.fill_check(0, cap)                    # at design load: fine
    with pytest.raises(RuntimeError, match="over capacity"):
        cf.fill_check(0, cap + 1)
    with pytest.raises(RuntimeError, match="over capacity"):
        cf.fill_check(cap, 1)


def _py_bloom_bits(keys, m, k):
    """Independent replica of the audit's double-hash construction."""
    import hashlib

    bits = set()
    for key in keys:
        h = hashlib.md5(key.encode()).hexdigest()
        h1, h2 = int(h[0:4], 16), int(h[4:8], 16)
        h2 = h2 - h2 % 2 + 1
        for i in range(k):
            bits.add((h1 + i * h2) % m)
    return bits


@pytest.mark.spark
def test_bloom_fpp_audit_matches_python_sim(spark):
    """Column-for-column equality with a hashlib-based simulator on
    every config row, plus the no-false-negative invariant."""
    from web_graph_spark.operators.seen import bloom_fpp_audit

    members = [f"mk{i}" for i in range(40)]
    probes = [f"pk{i}" for i in range(60)]
    mdf = spark.createDataFrame([(x,) for x in members], "key string")
    pdf = spark.createDataFrame([(x,) for x in probes], "key string")
    configs = ((64, 2), (256, 4))
    rows = {(r["m_bits"], r["k_hashes"]): r
            for r in bloom_fpp_audit(mdf, pdf, configs=configs).collect()}
    import hashlib

    for m, k in configs:
        bits = _py_bloom_bits(members, m, k)
        n_fp = 0
        for key in probes:
            h = hashlib.md5(key.encode()).hexdigest()
            h1, h2 = int(h[0:4], 16), int(h[4:8], 16)
            h2 = h2 - h2 % 2 + 1
            if all((h1 + i * h2) % m in bits for i in range(k)):
                n_fp += 1
        r = rows[(m, k)]
        assert (r["n_keys"], r["n_bits_set"], r["n_probes"],
                r["n_false_pos"]) == (40, len(bits), 60, n_fp)
        assert r["load_ppm"] == len(bits) * 1_000_000 // m
        assert r["fpp_ppm"] == n_fp * 1_000_000 // 60
    # sanity: the small filter at 40 keys actually exhibits FPs and
    # the larger one fewer — the audit measures a real gradient
    assert rows[(64, 2)]["n_false_pos"] > rows[(256, 4)]["n_false_pos"]

    # no false negatives: probing with the members themselves flags
    # every key present
    again = {(r["m_bits"], r["k_hashes"]): r
             for r in bloom_fpp_audit(mdf, mdf, configs=configs).collect()}
    for cfg in configs:
        assert again[cfg]["n_false_pos"] == again[cfg]["n_probes"] == 40


@pytest.mark.spark
def test_bloom_fpp_audit_guards(spark):
    from web_graph_spark.operators.seen import bloom_fpp_audit

    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError, match="power of two"):
        bloom_fpp_audit(df, df, configs=((1000, 3),))
    with pytest.raises(ValueError, match="power of two"):
        bloom_fpp_audit(df, df, configs=((1 << 17, 3),))
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_fpp_audit(df, df, configs=((1024, 0),))
