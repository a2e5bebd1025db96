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

    python bench.py --scaling          # local[8] vs local[32]

writes both throughputs + efficiency to stdout (and see BENCH.md).
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
    "events_sessionize",
    "tpch_q1",
    "topk_orders_per_cust",
]


def _force(df) -> None:
    """Materialize fully without collecting rows to the driver."""
    df.write.format("noop").mode("overwrite").save()


def run_queries(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    import __spark_entry__ as entry

    qs = entry.queries()
    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        t0 = time.monotonic()
        _force(fn(spark, sf_dir))
        out[name] = round(time.monotonic() - t0, 3)
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


def bench_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """Same crawl job at two parallelism levels on the same input.

    Efficiency per the north_rule's two-cluster-size criterion: with
    N→4N cores, eff = (T_N / T_4N) / 4 — 1.0 is perfect linear scaling.
    """
    runs = {}
    for cores in (lo, hi):
        from web_graph_spark.session import get_spark

        spark = get_spark(app=f"wgs-scale-{cores}", cores=cores,
                          shuffle_partitions=max(cores, 8))
        try:
            runs[cores] = run_crawl_bench(spark, sf_dir)
        finally:
            spark.stop()
    speedup = runs[lo]["wall_sec"] / runs[hi]["wall_sec"]
    eff = speedup / (hi / lo)
    return {
        "metric": "crawl_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "cores": {"lo": lo, "hi": hi},
        "throughput_urls_per_sec": {
            str(lo): runs[lo]["frontier_urls_per_sec"],
            str(hi): runs[hi]["frontier_urls_per_sec"],
        },
        "wall_sec": {str(lo): runs[lo]["wall_sec"],
                     str(hi): runs[hi]["wall_sec"]},
        "speedup": round(speedup, 3),
        "runs": runs,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    ap.add_argument("--cores", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--scaling", action="store_true",
                    help="run the crawl job at local[8] and local[32] "
                         "and report scaling efficiency")
    ap.add_argument("--queries", default=None,
                    help="comma-separated query subset")
    ap.add_argument("--no-crawl", action="store_true")
    args = ap.parse_args()

    if args.scaling:
        result = bench_scaling(args.sf_dir)
    else:
        qs = args.queries.split(",") if args.queries else None
        result = bench_once(args.cores, args.sf_dir, queries=qs,
                            crawl=not args.no_crawl)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
