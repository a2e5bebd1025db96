"""Physical-plan assertions — keep the 100 TB plan honest.

Tests use these to pin optimizer behavior: filters must reach the
parquet scan, small dims must broadcast, the hot path must stay inside
whole-stage codegen.  A plan regression is a perf bug even when results
are still correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = physical_plan(df)
    assert "PushedFilters" in plan, plan
    assert fragment in plan, f"filter {fragment!r} not pushed:\n{plan}"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def assert_no_python_udf(df: DataFrame) -> None:
    """The declared-simple hot path must not fall back to Python."""
    plan = physical_plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan, f"python stage {marker} in plan:\n{plan}"


def assert_read_schema_only(df: DataFrame, cols: set[str]) -> None:
    """Column pruning: the parquet ReadSchema must not exceed `cols`."""
    import re

    plan = physical_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
    assert read <= cols, f"scan reads {read - cols} beyond {cols}\n{plan}"


def cut_lineage(df: DataFrame) -> DataFrame:
    """localCheckpoint with a STATS rebase — the fixpoint-loop form.

    ``Dataset.localCheckpoint`` truncates the RDD lineage but copies
    the origin plan's ESTIMATED statistics into the ``LogicalRDD``
    leaf (Spark keeps them so join-strategy decisions still see a
    size).  Size-only estimation multiplies join children
    (``SizeInBytesOnlyStatsPlanVisitor.visitJoin`` → ``default``
    product), so an iterative operator whose state re-enters a join
    every round grows the inherited estimate GEOMETRICALLY: measured
    here, SCC convergence on the 500-page synthetic web leaves a
    sizeInBytes of 10,782,915 DIGITS, and every later planning pass
    burns driver minutes in ``BigInteger.multiplyToomCook3`` — at any
    data scale, because the cost is arithmetic on the ESTIMATE, not
    the data (the condensation-tiers rounds measured 35 s → 72 s →
    238 s on 178 condensed edges).  Rebasing the checkpointed RDD
    through the public JVM ``SparkSession.createDataFrame(RDD[Row],
    schema)`` (zero Python serde) resets the leaf stats to
    ``defaultSizeInBytes`` and severs the logical lineage outright —
    rounds return to constant cost (measured 0.3 s flat).

    Trade-off: the rebased frame's size estimate is the conservative
    default, so Spark will never AUTO-broadcast it — loop state
    should not be auto-broadcast anyway (it is the thing that grows);
    dims that must broadcast use explicit ``F.broadcast`` throughout
    this repo.  Use via ``df.transform(cut_lineage)`` as a drop-in
    for ``.localCheckpoint()`` in any self-referential loop.
    """
    spark = df.sparkSession
    ck = df.localCheckpoint()
    jdf = spark._jsparkSession.createDataFrame(ck._jdf.rdd(),
                                               ck._jdf.schema())
    return DataFrame(jdf, spark)
