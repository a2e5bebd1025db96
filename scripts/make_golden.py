#!/usr/bin/env python3
"""Generate golden-parquet oracles for the contract queries whose
semantics are not expressible in DuckDB SQL (seeded numpy hyperplanes,
xxhash64/blake2b hashing, iterative PageRank).

Each such query is independently validated by a pytest pin (numpy
dense PageRank, brute-force Jaccard recall, brute-force ANN recall,
deterministic stub vectors) — the golden parquet freezes the output of
that *already-pinned* path at sf0.01 so the driver's DuckDB oracle
compare (row count + schema + value hash) closes for every contract query.
This is sound because every one of these outputs is a deterministic
function of the input: all randomness is hash-derived or seeded, all
floats are computed per-row in fixed array order, and PageRank runs in
decimal (exact, aggregation-order-independent) — see the docstrings on
each query.  tests/test_golden.py re-runs the queries and asserts
bit-equality with the goldens, so any semantic drift fails CI before
the driver sees a stale golden.

Usage:  python scripts/make_golden.py  [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_QUERIES = [
    "graph_pagerank",
    "graph_hits",
    "dedup_minhash",
    "dedup_minhash_incremental",
    "dedup_simhash",
    "ann_lsh_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "media_features",
    "media_decode",
    "media_phash",
    "media_frames",
    "media_resize",
    "media_aphash",
]

GOLDEN_DIR = os.path.join(REPO, "golden")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None,
                    help="regenerate only these goldens (default: all); "
                         "regenerating all masks drift the test guard "
                         "would otherwise catch - prefer --only for "
                         "incremental additions")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from web_graph_spark.session import get_spark

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    spark = get_spark(app="wgs-golden", cores=8, shuffle_partitions=8)
    try:
        qs = entry.queries()
        for name in (args.only or GOLDEN_QUERIES):
            assert name in GOLDEN_QUERIES, name
            df = qs[name](spark, args.sf_dir)
            tbl = df.toArrow()
            out = os.path.join(GOLDEN_DIR, f"{name}.parquet")
            pq.write_table(tbl, out)
            print(f"[golden] {name}: {tbl.num_rows} rows -> {out}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
