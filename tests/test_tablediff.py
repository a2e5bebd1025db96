"""Merkle range-digest table diff (E134): anti-entropy semantics —
equal snapshots certify at the root, single changes localize to one
bucket per level, drill-down classification matches brute force."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.mark.spark
def test_identical_snapshots_certify_equal(spark):
    from pyspark.sql import functions as F

    from web_graph_spark.operators.tablediff import (
        merkle_diff_ranges, merkle_diff_rows, merkle_leaves,
        merkle_levels)

    d = (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
         .select("doc_id", "text"))
    la = merkle_leaves(d, F.col("doc_id"), F.col("text"), width=16)
    # a reshuffled, re-ordered copy builds the SAME digests
    # (order-independence is the point of the AdHash sums)
    d2 = d.repartition(7).sortWithinPartitions(F.desc("doc_id"))
    lb = merkle_leaves(d2, F.col("doc_id"), F.col("text"), width=16)
    assert merkle_diff_ranges(la, lb).count() == 0
    assert merkle_diff_rows(d, d2, F.col("doc_id"),
                            F.col("text")).count() == 0
    root_a = merkle_levels(la, levels=6, width=16) \
        .filter("level = 6").collect()
    root_b = merkle_levels(lb, levels=6, width=16) \
        .filter("level = 6").collect()
    assert {(r.bucket, str(r.dig), r.n) for r in root_a} \
        == {(r.bucket, str(r.dig), r.n) for r in root_b}


@pytest.mark.spark
def test_single_change_flips_one_bucket_per_level(spark):
    from pyspark.sql import functions as F

    from web_graph_spark.operators.tablediff import (merkle_leaves,
                                                     merkle_levels)

    d = (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
         .select("doc_id", "text"))
    b = d.select("doc_id",
                 F.when(F.col("doc_id") == 42,
                        F.lit("corrupted")).otherwise(F.col("text"))
                 .alias("text"))
    pa = merkle_levels(merkle_leaves(d, F.col("doc_id"), F.col("text"),
                                     width=16), levels=4, width=16)
    pb = merkle_levels(merkle_leaves(b, F.col("doc_id"), F.col("text"),
                                     width=16), levels=4, width=16)
    a = {(r.level, r.bucket): str(r.dig) for r in pa.collect()}
    bb = {(r.level, r.bucket): str(r.dig) for r in pb.collect()}
    assert set(a) == set(bb)          # same tree shape, counts equal
    for lv in range(5):
        flipped = [k for k in a if k[0] == lv and a[k] != bb[k]]
        # exactly the one bucket containing key 42 at each level
        assert flipped == [(lv, 42 - 42 % (16 * (2 ** lv)))]


@pytest.mark.spark
def test_drilldown_matches_brute_force_classification(spark):
    from pyspark.sql import functions as F

    from web_graph_spark.operators.tablediff import merkle_diff_rows

    d = (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
         .select("doc_id", "text"))
    b = (d.filter(F.col("doc_id") % 11 != 3)
         .select("doc_id",
                 F.when(F.col("doc_id") % 13 == 7,
                        F.concat("text", F.lit(" v2")))
                 .otherwise(F.col("text")).alias("text"))
         .unionByName(
             d.filter(F.col("doc_id") % 17 == 5)
             .select((F.col("doc_id") + 5000).alias("doc_id"), "text")))
    got = {(r.key, r.status)
           for r in merkle_diff_rows(d, b, F.col("doc_id"),
                                     F.col("text"), width=8).collect()}
    ta = {r.doc_id: r.text for r in d.collect()}
    tb = {r.doc_id: r.text for r in b.collect()}
    want = set()
    for k in set(ta) | set(tb):
        if k not in tb:
            want.add((k, "missing_b"))
        elif k not in ta:
            want.add((k, "missing_a"))
        elif ta[k] != tb[k]:
            want.add((k, "changed"))
    assert got == want and len(want) > 0


@pytest.mark.spark
def test_fk_audit_hand_tables(spark):
    """All four violation classes on hand tables: clean edge, NULL
    fks, orphans, duplicate parent keys."""
    from web_graph_spark.operators.tablediff import fk_audit

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, None), (5, 99)],
        "id long, fk long")
    parent_clean = spark.createDataFrame(
        [(10,), (20,), (30,)], "pk long")
    parent_dup = spark.createDataFrame(
        [(10,), (10,), (20,)], "pk long")
    rows = {r["relation"]: r for r in fk_audit([
        ("clean", child.filter("fk in (10, 20)"), "fk",
         parent_clean, "pk"),
        ("dirty", child, "fk", parent_clean, "pk"),
        ("dup_parent", child.filter("fk = 10"), "fk",
         parent_dup, "pk"),
    ]).collect()}
    c = rows["clean"]
    assert (c["n_child"], c["n_null_fk"], c["n_orphans"],
            c["n_dup_pk"], c["ok"]) == (3, 0, 0, 0, True)
    d = rows["dirty"]
    # 5 child rows: one NULL fk, one orphan (99)
    assert (d["n_child"], d["n_null_fk"], d["n_orphans"],
            d["n_parent"], d["ok"]) == (5, 1, 1, 3, False)
    p = rows["dup_parent"]
    # duplicate parent key detected even though no orphans exist
    assert (p["n_orphans"], p["n_dup_pk"], p["ok"]) == (0, 1, False)


@pytest.mark.spark
def test_table_profile_hand_frame(spark):
    """Exact per-column stats on a hand frame: NULL counting, distinct
    ignoring NULLs, min/max aggregated on the NATIVE type (numeric
    order, not string order) and cast to string after."""
    from web_graph_spark.operators.tablediff import table_profile

    df = spark.createDataFrame(
        [(2, "b"), (10, "a"), (10, None), (None, "a")],
        "k long, s string")
    rows = {r["col_name"]: r
            for r in table_profile(df, ["k", "s"]).collect()}
    k = rows["k"]
    assert (k["n_rows"], k["n_null"], k["n_distinct"]) == (4, 1, 2)
    # native numeric order: min 2, max 10 (string order would say
    # min "10", max "2")
    assert (k["min_value"], k["max_value"]) == ("2", "10")
    s = rows["s"]
    assert (s["n_null"], s["n_distinct"]) == (1, 2)
    assert (s["min_value"], s["max_value"]) == ("a", "b")


@pytest.mark.spark
def test_table_profile_all_null_column(spark):
    from web_graph_spark.operators.tablediff import table_profile

    df = spark.createDataFrame([(1, None), (2, None)],
                               "k long, s string")
    r = {x["col_name"]: x for x in table_profile(df, ["s"]).collect()}
    assert (r["s"]["n_null"], r["s"]["n_distinct"]) == (2, 0)
    assert r["s"]["min_value"] is None and r["s"]["max_value"] is None
