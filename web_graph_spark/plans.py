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
