#!/usr/bin/env python3
"""spark-submit entrypoint for the crawl wave loop.

Cluster launch (the north_rule shape)::

    spark-submit --master <cluster> \
      --py-files dist/web_graph_spark.zip \
      jobs/crawl_job.py --fixtures <dir> --state <dir> [--max-waves N]
      [--budget B] [--robots] [--cores-hint N]

The session comes from ``SparkSession.builder`` WITHOUT a master
override — spark-submit owns cluster topology.  Emits ONE JSON line
with wave/throughput metrics (the same shape bench.py reports).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixtures", required=True)
    ap.add_argument("--state", required=True)
    ap.add_argument("--max-waves", type=int, default=100)
    ap.add_argument("--budget", type=int, default=None)
    ap.add_argument("--robots", action="store_true")
    ap.add_argument("--priority", choices=("fifo", "depth"),
                    default="fifo")
    ap.add_argument("--salt-buckets", type=int, default=8)
    ap.add_argument("--seen-mode", choices=("exact", "bloom", "cuckoo"),
                    default="exact")
    ap.add_argument("--bucketed-state", action="store_true")
    ap.add_argument("--compact-every", type=int, default=None,
                    help="fold committed waves into size-tiered "
                         "segments every N waves (long crawls)")
    ap.add_argument("--wave-seconds", type=float, default=None,
                    help="wave cadence: derive per-host budgets from "
                         "robots crawl_delay (requires --robots)")
    ap.add_argument("--pace-waves", action="store_true",
                    help="enforce --wave-seconds as a wall-clock "
                         "cadence (sleep out each wave's remainder) — "
                         "makes crawl-delay-derived politeness honest "
                         "in real time")
    ap.add_argument("--inbox-dir", default=None,
                    help="streaming frontier-inbox table "
                         "(streaming.enqueue_stream out_dir) drained "
                         "into each wave as depth-0 frontier rows")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName("wgs-crawl")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from web_graph_spark.crawler import UNBOUNDED, SparkCrawler, load_web

    web = load_web(spark, args.fixtures)
    seeds = spark.read.parquet(f"{args.fixtures}/seeds.parquet")
    robots = (spark.read.parquet(f"{args.fixtures}/robots_rules.parquet")
              if args.robots else None)
    c = SparkCrawler(spark, args.state, web,
                     default_budget=args.budget or UNBOUNDED,
                     max_waves=args.max_waves, robots=robots,
                     priority=args.priority,
                     fetch_salt_buckets=args.salt_buckets,
                     seen_mode=args.seen_mode,
                     bucketed_state=args.bucketed_state,
                     compact_every=args.compact_every,
                     wave_seconds=args.wave_seconds,
                     pace_waves=args.pace_waves,
                     inbox_dir=args.inbox_dir)
    t0 = time.monotonic()
    c.init_from_seeds(seeds)
    c.run()
    wall = time.monotonic() - t0
    n_sched = sum(m.n_scheduled for m in c.metrics)
    print(json.dumps({
        "waves": len(c.metrics),
        "urls_scheduled": n_sched,
        "pages_fetched": sum(m.n_expanded for m in c.metrics),
        "wall_sec": round(wall, 3),
        "frontier_urls_per_sec": round(n_sched / wall, 1) if wall else None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
