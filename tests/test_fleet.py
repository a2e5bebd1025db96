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
