"""Robots-rule evaluation (north_star: broadcast rules, Arrow UDF).

Covers: RFC 9309 longest-match decision semantics, the vectorized
batch evaluator vs the scalar twin, the Spark UDF tier over fixture
pages, and full crawl equality engine-vs-oracle with robots active.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from web_graph_spark.operators.robots import (_eval_batch, allowed_py,
                                              compile_rules, load_rules_py,
                                              with_robots_allowed)
from tests.test_crawl_equality import (assert_equal_states, run_engine,
                                       run_oracle)

RULES = compile_rules([
    dict(host="a.test", rule_type="disallow", path_prefix="/private"),
    dict(host="a.test", rule_type="allow", path_prefix="/"),
    dict(host="a.test", rule_type="allow", path_prefix="/private/open"),
    dict(host="b.test", rule_type="disallow", path_prefix="/"),
    # equal-length tie on c.test: allow must win
    dict(host="c.test", rule_type="disallow", path_prefix="/x/"),
    dict(host="c.test", rule_type="allow", path_prefix="/y/"),
    dict(host="c.test", rule_type="allow", path_prefix="/x/"),
])

TRUTH = [
    ("a.test", "/index.html", True),
    ("a.test", "/private", False),
    ("a.test", "/private/x.html", False),
    ("a.test", "/private/open/x.html", True),   # longest match overrides
    ("a.test", "/privateer", False),            # prefix, not path-segment
    ("b.test", "/anything", False),
    ("b.test", "", True),                       # no matching prefix
    ("c.test", "/x/q", True),                   # tie → allow wins
    ("c.test", "/y/q", True),
    ("unruled.test", "/private/x", True),       # no rules → allowed
]


def test_allowed_py_truth_table():
    for host, path, want in TRUTH:
        assert allowed_py(RULES, host, path) is want, (host, path)


def test_eval_batch_matches_scalar():
    rng = random.Random(7)
    hosts, paths = [], []
    pool = ["a.test", "b.test", "c.test", "unruled.test"]
    segs = ["/", "/private", "/private/open", "/x/", "/y/", "/news/", ""]
    for _ in range(500):
        hosts.append(rng.choice(pool))
        paths.append(rng.choice(segs) + rng.choice(["p1.html", "q", ""]))
    got = _eval_batch(RULES, pd.Series(hosts), pd.Series(paths))
    want = [allowed_py(RULES, h, p) for h, p in zip(hosts, paths)]
    assert got.tolist() == want


@pytest.mark.spark
def test_spark_udf_matches_scalar(spark, fixture_dir):
    rules_df = spark.read.parquet(f"{fixture_dir}/robots_rules.parquet")
    pages = spark.read.parquet(f"{fixture_dir}/page_urls.parquet")
    got = {r["page_id"]: r["robots_allowed"] for r in
           with_robots_allowed(spark, pages, rules_df).collect()}
    rules = load_rules_py(fixture_dir)
    rows = pages.select("page_id", "host", "path").collect()
    assert got == {r["page_id"]: allowed_py(rules, r["host"], r["path"])
                   for r in rows}
    # the fixture must actually exercise both verdicts + the override
    verdicts = set(got.values())
    assert verdicts == {True, False}


@pytest.mark.spark
def test_engine_matches_oracle_with_robots(spark, fixture_dir, tmp_path):
    c = run_engine(spark, fixture_dir, tmp_path / "state", with_robots=True)
    o = run_oracle(fixture_dir, with_robots=True)
    assert o.seen - {pid for (_, _, pid) in o.crawl_order}, \
        "robots blocked nothing — fixture regression"
    assert_equal_states(c, o)
