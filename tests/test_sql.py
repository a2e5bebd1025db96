"""SQL front-door (sql.py): spark.sql over registered views must give
the same answers (and the same pinned plan properties) as the
DataFrame spellings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.mark.spark
def test_testdata_views_answer_contract_queries(spark):
    from web_graph_spark.sql import register_testdata

    names = register_testdata(spark, SF_SMOKE)
    assert "web_links_full" in names and "documents" in names

    # J1 GetLinksFrom as plain SQL == the DataFrame contract query
    got = spark.sql("""
        SELECT DISTINCT tgt_doc_id AS to_doc_id FROM web_links_full
        WHERE src_doc_id = 41 AND k % 4 <> 0 ORDER BY 1 LIMIT 100
    """).collect()
    import __spark_entry__ as entry

    want = entry.queries()["graph_links_from"](spark, SF_SMOKE).collect()
    assert [r[0] for r in got] == [r[0] for r in want]

    # pushdown survives the SQL spelling (point filter reaches the scan)
    from web_graph_spark.plans import assert_pushed_filter

    assert_pushed_filter(
        spark.sql("SELECT doc_id FROM documents WHERE doc_id = 7"),
        "doc_id")


@pytest.mark.spark
def test_store_views(spark, tmp_path):
    from web_graph_spark import fixtures
    from web_graph_spark.crawler import SparkCrawler, load_web
    from web_graph_spark.sql import register_store

    d = tmp_path / "fix"
    d.mkdir()
    fixtures.generate_fixtures(str(d), seed=42, n_pages=60, n_hosts=6)
    c = SparkCrawler(spark, str(tmp_path / "state"),
                     load_web(spark, str(d)), max_waves=2)
    c.init_from_seeds(spark.read.parquet(f"{d}/seeds.parquet"))
    c.run()

    names = register_store(spark, c.store, prefix="wg_")
    assert "wg_pages" in names
    # A1 counts via SQL == DataFrame reads
    assert spark.sql("SELECT count(*) FROM wg_pages").first()[0] == \
        c.store.read("pages").count()
    # J2 GetLinksTo via SQL == DataFrame filter
    some = c.store.read("edges").first()
    if some is not None:
        sql_rows = spark.sql(
            "SELECT from_page_id FROM wg_edges WHERE to_page_id = "
            f"'{some['to_page_id']}' LIMIT 100").collect()
        df_rows = (c.store.read("edges")
                   .filter(F.col("to_page_id") == some["to_page_id"])
                   .select("from_page_id").limit(100).collect())
        assert sorted(r[0] for r in sql_rows) == \
            sorted(r[0] for r in df_rows)


@pytest.mark.spark
def test_asof_join_semantics(spark):
    """Union-tag as-of join: latest right row at or BEFORE the left
    timestamp per key (equal ts matches — the >= rule DuckDB's ASOF
    JOIN uses), NULLs when no prior right row, keys never cross."""
    from web_graph_spark.operators.asof import asof_join

    L = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 300), (4, 20, 100)],
        "event_id long, user_id long, ts long")
    R = spark.createDataFrame(
        [(51, 10, 100), (52, 10, 200), (53, 10, 301), (54, 30, 50)],
        "event_id long, user_id long, ts long")
    got = {r.event_id: r.asof_event_id
           for r in asof_join(L, R, by="user_id",
                              right_cols=("event_id",)).collect()}
    # 1: view 51 at ts==100 matches (>=); 2: latest <=205 is 52;
    # 3: 301 is AFTER 300 -> still 52; 4: user 20 has no views
    assert got == {1: 51, 2: 52, 3: 52, 4: None}


@pytest.mark.spark
def test_exact_quantiles_vs_numpy_sort(spark):
    """Histogram quantiles ≡ the brute-force sorted definition
    (smallest v with rank >= ceil(q/100*n)) on a hand distribution
    with heavy ties."""
    import math

    from web_graph_spark.functions.stats import exact_quantiles

    vals = [1] * 50 + [2] * 30 + [10] * 15 + [100] * 4 + [1000]
    df = spark.createDataFrame([("a", float(v)) for v in vals],
                               "event_type string, value double")
    got = exact_quantiles(df, "event_type",
                          __import__("pyspark.sql.functions",
                                     fromlist=["floor"]).floor(
                              __import__("pyspark.sql.functions",
                                         fromlist=["col"]).col("value"))
                          ).collect()[0]
    s = sorted(vals)

    def q(p):
        return s[math.ceil(p / 100 * len(s)) - 1]

    assert (got.n_rows, got.p50, got.p95, got.p99) == (
        100, q(50), q(95), q(99))
    assert (q(50), q(95), q(99)) == (1, 10, 100)


@pytest.mark.spark
def test_funnel_steps_semantics(spark):
    """Funnel ordering rules: a step counts only at-or-after the
    user's earliest qualifying previous step; equal-timestamp ties
    count in step order; pre-step events never count; the chain is
    per-user isolated.  Plan: the whole chain must ride ONE user-key
    Exchange."""
    from web_graph_spark.functions.stats import funnel_steps

    rows = [
        # u1: clean view(10) -> click(20) -> purchase(30): full funnel
        (1, 10, "view", 1), (2, 20, "click", 1), (3, 30, "purchase", 1),
        # u2: click BEFORE any view, purchase after -> view only after,
        # so click at ts=5 must NOT count; the later click does
        (4, 5, "click", 2), (5, 10, "view", 2), (6, 15, "click", 2),
        # u3: click at the SAME ts as the first view -> counts (>=);
        # purchase same ts as that click -> counts too
        (7, 10, "view", 3), (8, 10, "click", 3), (9, 10, "purchase", 3),
        # u4: purchase(15) precedes the qualifying click(20) -> the
        # click stage is reached but the purchase must NOT count
        (10, 10, "view", 4), (11, 15, "purchase", 4), (12, 20, "click", 4),
        # u5: never views -> counts in n_users only
        (13, 10, "click", 5), (14, 20, "purchase", 5),
    ]
    ev = spark.createDataFrame(
        [(eid, float(ts), typ, uid) for eid, ts, typ, uid in rows],
        "event_id long, tsd double, event_type string, user_id long"
    ).withColumn("ts", F.col("tsd").cast("timestamp")).drop("tsd")
    got = funnel_steps(ev).collect()[0]
    assert (got.n_users, got.n_view, got.n_click, got.n_purchase) == \
        (5, 4, 4, 2)
    assert (got.conv_view_bp, got.conv_click_bp, got.conv_purchase_bp) \
        == ((4 * 10000) // 5, 10000, (2 * 10000) // 4)
    plan = funnel_steps(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(user_id") <= 1


@pytest.mark.spark
def test_cohort_retention_hand_case(spark):
    """Hand-checkable cohort matrix: two cohorts, partial return
    days; day-0 retention is 10000 bp by definition; a user's repeat
    events within one day count once."""
    from web_graph_spark.functions.stats import cohort_retention

    rows = [  # (event_id, day, user)
        (1, 0, 1), (2, 0, 1), (3, 0, 2),       # cohort 0 = {1, 2}
        (4, 1, 1),                             # day 1: only u1 back
        (5, 1, 3),                             # cohort 1 = {3}
        (6, 2, 1), (7, 2, 2), (8, 2, 3),       # day 2: all active
    ]
    ev = spark.createDataFrame(
        [(eid, float(d * 86400), uid) for eid, d, uid in rows],
        "event_id long, tsd double, user_id long"
    ).withColumn("ts", (F.col("tsd") + F.unix_timestamp(
        F.lit("2024-01-01 00:00:00"))).cast("timestamp")).drop("tsd")
    got = {(r.cohort_day, r.day_offset):
           (r.cohort_size, r.n_active, r.retention_bp)
           for r in cohort_retention(ev).collect()}
    assert got == {
        (0, 0): (2, 2, 10000),
        (0, 1): (2, 1, 5000),
        (0, 2): (2, 2, 10000),
        (1, 0): (1, 1, 10000),
        (1, 1): (1, 1, 10000),
    }


@pytest.mark.spark
def test_apply_cdc_log_semantics(spark):
    from web_graph_spark.operators.merge import apply_cdc_log

    base = spark.createDataFrame(
        [("a", "A0"), ("b", "B0"), ("c", "C0"), ("d", "D0")],
        "id string, payload string")
    log = spark.createDataFrame(
        [
            (1, "U", "a", "A1"), (5, "U", "a", "A2"),  # last wins
            (2, "D", "b", None),                        # delete
            (3, "D", "c", None), (4, "U", "c", "C1"),   # del->reinsert
            (6, "U", "e", "E1"),                        # brand-new key
            (7, "U", "f", "F1"), (8, "D", "f", None),   # insert->del
        ],
        "seq long, op string, id string, payload string")
    got = {r.id: (r.payload, r.last_seq, r.src)
           for r in apply_cdc_log(base, log).collect()}
    assert got == {
        "a": ("A2", 5, "log"),
        "c": ("C1", 4, "log"),
        "d": ("D0", -1, "base"),
        "e": ("E1", 6, "log"),
    }
    # empty log -> base unchanged
    empty = log.limit(0)
    assert {r.id: r.payload for r in
            apply_cdc_log(base, empty).collect()} == {
        "a": "A0", "b": "B0", "c": "C0", "d": "D0"}
