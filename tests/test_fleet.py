"""Rendezvous (HRW) fetcher-fleet assignment (operators/fleet.py).

Pins: (1) bit-equality against a pure-Python HRW recompute of the
same hex16 weights; (2) the resize property the operator exists for —
every host displaced by growing the fleet K→K+1 lands on the NEW
worker, and only an ~1/(K+1) minority moves; (3) edge cases."""

from __future__ import annotations

import hashlib

import pytest

from web_graph_spark.operators.fleet import rendezvous_assign


def _hex16_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def _hrw_py(host: str, k: int) -> int:
    return max(range(k), key=lambda w: (_hex16_py(f"{host}#{w}"), -w))


@pytest.mark.spark
def test_assignment_matches_python_hrw(spark):
    hosts = [f"h{i:03d}.example.test" for i in range(64)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {r["host"]: r["worker"]
           for r in rendezvous_assign(df, 8).collect()}
    assert got == {h: _hrw_py(h, 8) for h in hosts}


@pytest.mark.spark
def test_resize_moves_minority_and_only_to_new_worker(spark):
    hosts = [f"site{i}.example.test" for i in range(400)]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    a8 = {r["host"]: r["w"]
          for r in rendezvous_assign(df, 8, out_col="w").collect()}
    a9 = {r["host"]: r["w"]
          for r in rendezvous_assign(df, 9, out_col="w").collect()}
    moved = [h for h in hosts if a8[h] != a9[h]]
    # HRW: a displaced host's new weight beat every old one -> it is
    # on the new worker (id 8), and expectation is 1/9 of hosts.
    assert all(a9[h] == 8 for h in moved)
    assert 0 < len(moved) < len(hosts) * 0.25


@pytest.mark.spark
def test_single_worker_and_invalid_k(spark):
    df = spark.createDataFrame([("a.test",), ("b.test",)], "host string")
    assert {r["worker"] for r in rendezvous_assign(df, 1).collect()} == {0}
    with pytest.raises(ValueError):
        rendezvous_assign(df, 0)


@pytest.mark.spark
def test_snake_assign_hand_case_and_balance(spark):
    """Arithmetic weights balance PERFECTLY under snake (each
    double-pass window sums equal per slot); geometric weights stay
    within one max item; slot item counts differ by ≤1."""
    from web_graph_spark.operators.fleet import snake_assign

    rows = [(f"h{i}", w) for i, w in
            enumerate([10, 9, 8, 7, 6, 5, 4, 3])]
    df = spark.createDataFrame(rows, "host string, weight long")
    out = snake_assign(df, 4, "weight", small_hint=10).collect()
    loads = {}
    for r in out:
        loads[r.slot] = loads.get(r.slot, 0) + r.weight
    assert loads == {0: 13, 1: 13, 2: 13, 3: 13}

    geo = [(f"g{i}", 1 << (10 - i)) for i in range(8)]
    df2 = spark.createDataFrame(geo, "host string, weight long")
    out2 = snake_assign(df2, 4, "weight", small_hint=10).collect()
    loads2, counts2 = {}, {}
    for r in out2:
        loads2[r.slot] = loads2.get(r.slot, 0) + r.weight
        counts2[r.slot] = counts2.get(r.slot, 0) + 1
    assert max(loads2.values()) - min(loads2.values()) <= 1024
    assert max(counts2.values()) - min(counts2.values()) <= 1
    # reversal matters: plain modulo dealing on the same ranks piles
    # every window's heavy end on slot 0
    plain = {}
    for i, (_, w) in enumerate(sorted(geo, key=lambda t: -t[1])):
        plain[i % 4] = plain.get(i % 4, 0) + w
    assert (max(loads2.values()) - min(loads2.values())
            < max(plain.values()) - min(plain.values()))


@pytest.mark.spark
def test_snake_assign_paths_agree(spark):
    """The range-partitioned scale path assigns the identical
    (rank, slot) as the single-window small path."""
    from pyspark.sql import functions as F

    from web_graph_spark.operators.fleet import snake_assign
    from web_graph_spark.operators.frontier import release

    df = spark.range(0, 500).select(
        F.concat(F.lit("h"), F.col("id")).alias("host"),
        ((F.col("id") * 7919) % 1000).alias("weight"))
    small = {r.host: (r.rank, r.slot) for r in
             snake_assign(df, 8, "weight", small_hint=500).collect()}
    big = snake_assign(df, 8, "weight", small_hint=None)
    got = {r.host: (r.rank, r.slot) for r in big.collect()}
    release(big)
    assert got == small
