"""Physical-plan pins — a plan regression is a perf bug at 100 TB even
when sandbox results stay correct (SURVEY.md §4).

Each test freezes one scale-critical optimizer behavior:
WindowGroupLimit for the politeness top-K, parquet predicate pushdown +
column pruning for the scan-heavy queries, broadcast for small dims,
and JVM-only execution for the declared-codegen paths.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_graph_spark.plans import (assert_broadcast_join, assert_no_python_udf,
                                   assert_pushed_filter,
                                   assert_read_schema_only, physical_plan)
from tests.conftest import SF_SMOKE


@pytest.mark.spark
def test_politeness_uses_window_group_limit(spark):
    """O4: a constant rank bound must compile to WindowGroupLimit —
    map-side partial top-K per host BEFORE the shuffle, so a hot host
    with 10^7 pending URLs ships only `budget` rows to the window."""
    from web_graph_spark.operators.politeness import schedule_wave

    pending = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("host"),
        F.col("id").alias("seq"))
    scheduled, cap = schedule_wave(pending, None, default_budget=5)
    assert cap == 5
    plan = physical_plan(scheduled)
    assert "WindowGroupLimit" in plan, plan


@pytest.mark.spark
def test_tpch_q1_pushdown_and_pruning(spark):
    """The shipdate filter must reach the parquet scan and the scan must
    not read beyond the 7 referenced lineitem columns."""
    import __spark_entry__ as e

    df = e.queries()["tpch_q1"](spark, SF_SMOKE)
    assert_pushed_filter(df, "l_shipdate")
    assert_read_schema_only(df, {
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_shipdate"})
    assert_no_python_udf(df)


@pytest.mark.spark
def test_point_lookup_pushdown(spark):
    """J1/J3 point lookups: the id predicate must be a PushedFilter, not
    a post-scan filter (→ row-group pruning on a bucketed layout)."""
    import __spark_entry__ as e

    df = e.queries()["graph_links_from"](spark, SF_SMOKE)
    assert_pushed_filter(df, "doc_id")


@pytest.mark.spark
def test_ann_broadcasts_query_side(spark):
    """Similarity search: the small query set must broadcast — the item
    table never shuffles for the cross-score."""
    import __spark_entry__ as e

    df = e.queries()["ann_cosine_topk"](spark, SF_SMOKE)
    assert_broadcast_join(df)
    assert_no_python_udf(df)  # cosine is zip_with/aggregate, JVM-side


@pytest.mark.spark
def test_ann_ivf_probe_plan(spark):
    """IVF cell probe: query side broadcasts on the cell key, top-k
    compiles to a map-side WindowGroupLimit, all JVM."""
    import __spark_entry__ as e

    df = e.queries()["ann_ivf_topk"](spark, SF_SMOKE)
    plan = physical_plan(df)
    assert "WindowGroupLimit" in plan, plan
    assert_broadcast_join(df)
    assert_no_python_udf(df)


@pytest.mark.spark
def test_budget_dim_broadcasts(spark):
    """Politeness budgets are a broadcast dim, never a shuffle join."""
    from web_graph_spark.operators.politeness import schedule_wave

    pending = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("host"),
        F.col("id").alias("seq"))
    budgets = spark.createDataFrame(
        [("0", 2), ("1", 3)], "host string, max_pages_per_wave int")
    scheduled, _ = schedule_wave(pending, budgets, default_budget=5)
    assert_broadcast_join(scheduled)


@pytest.mark.spark
def test_budget_dim_size_gate_both_sides(spark):
    """VERDICT r3 #4: the budgets join strategy is size-gated.  Under
    the gate the dim is broadcast-hinted even when stats wouldn't pick
    it; over the gate (broadcast_budgets=False — a 10^7-host dim at
    target scale) the plan must NOT broadcast the dim, shuffling both
    sides instead.  autoBroadcastJoinThreshold is disabled so the pin
    tests the explicit gate, not the planner's stats heuristics."""
    from web_graph_spark.operators.politeness import schedule_wave

    pending = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("host"),
        F.col("id").alias("seq"))
    budgets = spark.createDataFrame(
        [("0", 2), ("1", 3)], "host string, max_pages_per_wave int")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted, _ = schedule_wave(pending, budgets, default_budget=5,
                                  broadcast_budgets=True)
        assert_broadcast_join(hinted)
        plain, _ = schedule_wave(pending, budgets, default_budget=5,
                                 broadcast_budgets=False)
        plan = physical_plan(plain)
        assert "BroadcastHashJoin" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.mark.spark
def test_crawler_budget_gate_flag(spark, fixture_dir, tmp_path):
    """The crawler derives the gate from the dim's row count once at
    init: small dim → broadcast path, dim past BUDGETS_BROADCAST_MAX →
    shuffle path (and the crawl still schedules correctly)."""
    from web_graph_spark.crawler import SparkCrawler, load_web

    web = load_web(spark, fixture_dir)
    seeds = spark.read.parquet(f"{fixture_dir}/seeds.parquet")
    budgets = spark.createDataFrame(
        [("h00.example.test", 2)], "host string, max_pages_per_wave int")
    small = SparkCrawler(spark, str(tmp_path / "a"), web, budgets=budgets)
    assert small._budgets_broadcast_ok
    try:
        SparkCrawler.BUDGETS_BROADCAST_MAX = 0
        big = SparkCrawler(spark, str(tmp_path / "b"), web,
                           budgets=budgets, max_waves=2)
        assert not big._budgets_broadcast_ok
        big.init_from_seeds(seeds)
        big.run()
        assert big.store.read("crawl_order").count() > 0
    finally:
        SparkCrawler.BUDGETS_BROADCAST_MAX = 1_000_000


@pytest.mark.spark
def test_doc_projection_prunes_columns(spark):
    """graph_degrees touches only doc_id of documents — ReadSchema must
    show exactly that (column pruning through the derived-web views)."""
    import __spark_entry__ as e

    df = e.queries()["graph_degrees"](spark, SF_SMOKE)
    assert_read_schema_only(df, {"doc_id"})


@pytest.mark.spark
def test_token_stats_stays_jvm(spark):
    """Text functions on the hot path are regexp/codegen, not Python."""
    import __spark_entry__ as e

    df = e.queries()["text_token_stats"](spark, SF_SMOKE)
    assert_no_python_udf(df)
    assert_read_schema_only(df, {"doc_id", "text"})


@pytest.mark.spark
def test_embed_near_dup_plan_is_bucketed(spark):
    """E5: the contract near-dup query must run on the LSH bucket join —
    never a BroadcastNestedLoop/Cartesian all-pairs (the O(N²) plan
    that is fatal at 100×; the exact pairwise expression lives only in
    the DuckDB oracle and the recall test)."""
    import __spark_entry__ as e

    df = e.queries()["embed_near_dup_pairs"](spark, SF_SMOKE)
    plan = physical_plan(df)
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan


@pytest.mark.spark
def test_bucketed_anti_join_has_no_exchange(spark, tmp_path):
    """Seen-set anti-join over bucket(key)-stored tables must be
    co-located: SortMergeJoin with ZERO Exchange nodes — the 10^10-row
    answer to the shuffle the scaling bench identifies as the
    single-box ceiling (BENCH/BASELINE.md)."""
    from web_graph_spark.operators.bucketed import (bucketed_anti_join,
                                                    save_bucketed)

    seen = spark.range(20000).select(
        F.sha1(F.col("id").cast("string")).alias("page_id"))
    cand = spark.range(10000, 40000).select(
        F.sha1(F.col("id").cast("string")).alias("page_id"))
    save_bucketed(seen, "t_seen_b", n_buckets=8)
    save_bucketed(cand, "t_cand_b", n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # at 10^10 rows neither side broadcasts — force the big-table plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_anti_join(spark, "t_cand_b", "t_seen_b")
        plan = physical_plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # semantics: identical to the plain anti-join
        assert j.count() == cand.join(seen, "page_id", "left_anti").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_seen_b")
        spark.sql("DROP TABLE IF EXISTS t_cand_b")


@pytest.mark.spark
def test_pq_ann_plan(spark):
    """PQ/ADC: both candidate cuts compile to WindowGroupLimit
    (map-side partial top-k — the Q·N ADC scores never shuffle in
    full), the re-rank joins broadcast the small sides, and no
    cartesian/BNL join appears anywhere."""
    from web_graph_spark.functions.similarity import pq_ann_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = (emb.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_vec")))
    plan = physical_plan(pq_ann_topk(emb, q, dim=64, k=5))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


@pytest.mark.spark
def test_ivf_pq_ann_plan(spark):
    """Composed IVF×PQ (contract query #36): the probe set joins as a
    BROADCAST hash join on the cell key (pruning before any code is
    read — at 100 TB the cell is the partition key), both candidate
    cuts compile to WindowGroupLimit, and no cartesian/BNL appears."""
    from web_graph_spark.functions.similarity import ivf_pq_ann_topk

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = (emb.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_vec")))
    plan = physical_plan(ivf_pq_ann_topk(emb, q, dim=64, k=5,
                                         n_cells=8, n_probe=2))
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan      # probe-set cell join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


@pytest.mark.spark
def test_ivf_pq_index_partition_pruning(spark, tmp_path):
    """Persisted IVF×PQ index (VERDICT r3 #5): `cell` is a PHYSICAL
    parquet partition, so the probe's cell predicate must show up as a
    scan PartitionFilter — non-probed cell directories are pruned at
    file-listing time, making "a probe reads n_probe/n_cells of the
    files" physically true.  Result ≡ the inline pipeline."""
    from web_graph_spark.functions.similarity import (ivf_pq_ann_topk,
                                                      ivf_pq_probe_index,
                                                      ivf_pq_write_index)

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = (emb.filter(F.col("vec_id") < 3)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_vec")))
    idx = str(tmp_path / "ivfpq")
    ivf_pq_write_index(emb, dim=64, path=idx, n_cells=8)
    probed = ivf_pq_probe_index(spark, idx, emb, q, k=5, n_probe=2)

    plan = physical_plan(probed)
    # the codes scan carries a non-empty partition filter on cell
    import re
    pf = re.search(r"PartitionFilters: \[([^\]]*cell[^\]]*)\]", plan)
    assert pf and pf.group(1).strip(), plan
    assert "cell" in pf.group(1), pf.group(1)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan

    inline = ivf_pq_ann_topk(emb, q, dim=64, k=5, n_cells=8, n_probe=2)
    assert (sorted(map(tuple, probed.collect()))
            == sorted(map(tuple, inline.collect())))

    # physical layout: one directory per cell, probe prunes to 2 of 8
    import os
    cells = [d for d in os.listdir(os.path.join(idx, "codes"))
             if d.startswith("cell=")]
    assert len(cells) == 8, cells


@pytest.mark.spark
def test_decontaminate_broadcasts_benchmark(spark):
    """Decontamination: the benchmark shingle side broadcasts (eval
    sets ≪ corpus) and nothing goes cartesian — the corpus pays one
    map-side explode, never a shuffle of itself."""
    import __spark_entry__ as e

    df = e.queries()["corpus_decontaminate"](spark, SF_SMOKE)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert_no_python_udf(df)


@pytest.mark.spark
def test_sample_mix_is_single_scan(spark):
    """Stratified mixing: deterministic md5-coin sampling is a pure
    projection+filter — ZERO Exchange nodes (one pass at any scale),
    no Python UDF."""
    import __spark_entry__ as e

    df = e.queries()["corpus_sample_mix"](spark, SF_SMOKE)
    plan = physical_plan(df)
    assert "Exchange" not in plan, plan
    assert_no_python_udf(df)


@pytest.mark.spark
def test_take_global_plan_has_no_global_sort(spark):
    """E45 wave cap: the take_global scale path must contain NO global
    sort and NO single-partition Exchange — the admission cut is a
    range partition + per-partition counts + a boundary head, so no
    node ever converges the schedule on one task (the failure mode of
    ORDER BY .. LIMIT K at 10^10 rows).  The small-hint path is the
    deliberate single-window exception (tiny waves)."""
    from web_graph_spark.operators.frontier import release, take_global

    df = spark.range(100_000).select(F.col("id").alias("seq"),
                                     (F.col("id") * 2).alias("x"))
    got = take_global(df, 1_000, ["seq"], num_partitions=8)
    plan = physical_plan(got)
    release(got)
    assert "Exchange SinglePartition" not in plan, plan
    # rangepartitioning Exchange is the expected shuffle; a global
    # Sort would show as "Sort [seq ... ASC" NOT followed by a
    # partial/local marker — pin the absence of TakeOrderedAndProject
    # and of any Window (the small path's shape) instead, which are
    # the two single-task shapes this operator exists to avoid.
    assert "TakeOrderedAndProject" not in plan, plan
    assert "Window" not in plan, plan
    assert "rangepartitioning" in plan, plan


@pytest.mark.spark
def test_tpch_q3_broadcast_and_takeordered(spark):
    """Q3's plan: the BUILDING customer dim broadcasts, both date
    filters reach the parquet scans, and the global top-10 is a
    TakeOrdered map-side heap — never a full sort of the order
    revenues."""
    import __spark_entry__ as e

    df = e.queries()["tpch_q3"](spark, SF_SMOKE)
    plan = physical_plan(df)
    assert_broadcast_join(df)
    assert_pushed_filter(df, "o_orderdate")
    assert_pushed_filter(df, "l_shipdate")
    assert_no_python_udf(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]


@pytest.mark.spark
def test_tpch_q6_pure_scan_aggregate(spark):
    """Q6's plan: every predicate (ship-year band, discount band,
    quantity cap) reaches the parquet scan as a PushedFilter, the scan
    reads only the 4 referenced columns, and nothing leaves the JVM."""
    import __spark_entry__ as e

    df = e.queries()["tpch_q6"](spark, SF_SMOKE)
    assert_pushed_filter(df, "l_shipdate")
    assert_pushed_filter(df, "l_discount")
    assert_pushed_filter(df, "l_quantity")
    assert_read_schema_only(df, {
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"})
    assert_no_python_udf(df)


@pytest.mark.spark
def test_tpch_q4_semi_join_and_pushdown(spark):
    """Q4's plan: the EXISTS is a left-semi join (orders side stays
    duplicate-free with no post-join distinct), the order-date window
    reaches the orders scan, and nothing leaves the JVM."""
    import __spark_entry__ as e

    df = e.queries()["tpch_q4"](spark, SF_SMOKE)
    plan = physical_plan(df)
    assert "LeftSemi" in plan, plan[:2000]
    assert_pushed_filter(df, "o_orderdate")
    assert_no_python_udf(df)


@pytest.mark.spark
def test_tpch_q5_broadcast_snowflake(spark):
    """Q5's plan: every dim (region-filtered nation, supplier) stays
    a broadcast, the order-date window reaches the orders scan, and
    the whole snowflake keeps a single shuffled fact join."""
    import __spark_entry__ as e

    df = e.queries()["tpch_q5"](spark, SF_SMOKE)
    assert_broadcast_join(df)
    assert_pushed_filter(df, "o_orderdate")
    assert_no_python_udf(df)


@pytest.mark.spark
def test_tpch_q18_filters_before_customer_join(spark):
    """Q18's plan: the >300-unit HAVING collapses the orderkey agg
    BEFORE any customer join touches the plan — the filter must sit
    under the join, not above it (above = joining the full customer
    dim against every order at 100 TB)."""
    import __spark_entry__ as e

    df = e.queries()["tpch_q18"](spark, SF_SMOKE)
    plan = physical_plan(df)
    # the HAVING survives as a Filter over the orderkey agg …
    assert "qty_centi" in plan and "30000" in plan, plan[:2000]
    # … and BOTH joins stay broadcast — the filtered agg is the small
    # side; a SortMergeJoin here would mean the full order agg (or the
    # customer dim) was shuffled instead of the >300-unit survivors.
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert_no_python_udf(df)


@pytest.mark.spark
def test_tpch_q21_no_correlated_subquery(spark):
    """Q21's plan: the spec's exists/not-exists pair must compile to
    plain aggregates + joins — no correlated-subquery re-execution
    node and a TakeOrdered heap for the top-20."""
    import __spark_entry__ as e

    df = e.queries()["tpch_q21"](spark, SF_SMOKE)
    plan = physical_plan(df)
    assert "Subquery" not in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    assert_no_python_udf(df)


@pytest.mark.spark
def test_edge_cut_stays_jvm_and_bounded(spark):
    """graph_edge_cut's plan: the hex16 shard math is pure JVM
    expression (no Python UDF) and the total joins back as a
    broadcast of the 1-row agg, never a re-scan."""
    import __spark_entry__ as e

    df = e.queries()["graph_edge_cut"](spark, SF_SMOKE)
    assert_no_python_udf(df)
    assert_broadcast_join(df)


@pytest.mark.spark
def test_reciprocal_nn_rank_cut_before_mutual_join(spark):
    """embed_reciprocal_nn's plan: the mutual-pair join must join two
    rank<=3-filtered k-NN edge lists (O(N·k) sides), not two raw
    N²-similarity scans — pinned by the rank filter sitting below
    the final join on both sides."""
    import __spark_entry__ as e

    df = e.queries()["embed_reciprocal_nn"](spark, SF_SMOKE)
    plan = physical_plan(df)
    assert plan.count("WindowGroupLimit") >= 1, plan[:2000]
    assert_no_python_udf(df)


@pytest.mark.spark
def test_cut_lineage_bounds_stats_estimate(spark):
    """plans.cut_lineage must keep the inherited sizeInBytes estimate
    BOUNDED across fixpoint rounds.  Plain localCheckpoint copies the
    origin plan's estimate into the LogicalRDD leaf and join
    estimation multiplies children, so a state-rejoins-state loop
    grows the estimate geometrically (measured: a 10.7-million-digit
    BigInteger after SCC convergence, minutes of driver Toom-Cook per
    later plan).  Three rounds through cut_lineage must stay at the
    default leaf estimate (< 2^67), and values must be exact."""
    from pyspark.sql import functions as F

    from web_graph_spark.plans import cut_lineage

    t = cut_lineage(spark.range(100).select(
        F.col("id"), F.lit(1).cast("long").alias("x")))
    for _ in range(3):
        t = cut_lineage(
            t.join(t.select("id", F.col("x").alias("y")), "id")
            .select("id", (F.col("x") + F.col("y")).alias("x")))
    size = int(t._jdf.queryExecution().optimizedPlan().stats()
               .sizeInBytes())
    assert size < 2 ** 67, f"stats estimate not rebased: {size}"
    assert t.agg(F.sum("x")).first()[0] == 100 * 8
