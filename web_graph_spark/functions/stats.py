"""Exact distributional statistics at scale.

``approx_percentile`` is the Spark default because exact quantiles
naively need a global sort of the raw rows — but when the VALUE RANGE
is bounded (latencies, prices, scores: fixed-point business values),
the exact answer costs one hash aggregation: histogram the values,
cumulative-sum the histogram (whose size is bounded by the value
range, not the row count — the same argument as the perplexity
terciles), and read each quantile off the cumulative curve.  10^12
latency rows with sub-centisecond values still make a ≤10^5-bin
histogram per group.

Reference analog: none — engine extension (SURVEY §2.10 E74).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles(df: DataFrame, group_col: str, value_int,
                    qs: tuple[int, ...] = (50, 95, 99)) -> DataFrame:
    """Exact per-group quantiles of the integer-valued column
    expression ``value_int`` — returns ``(group, n_rows, p<q>...)``
    with ``p<q>`` = the smallest value whose cumulative count reaches
    ``ceil(q/100 * n)`` (the discrete lower quantile — exact, no
    interpolation to drift between engines).

    Shape: one (group, value) hash agg over the raw rows (map-side
    partials absorb repeated values) -> per-group cumulative window
    over the HISTOGRAM (bins bounded by the value range) -> one
    conditional-min agg per group.  The raw rows are scanned once and
    never sorted."""
    hist = (df.groupBy(F.col(group_col).alias("g"),
                       value_int.cast("long").alias("v"))
            .agg(F.count("*").cast("long").alias("c")))
    w = (Window.partitionBy("g").orderBy("v")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (hist.withColumn("cum", F.sum("c").over(w))
           .withColumn("n", F.sum("c").over(Window.partitionBy("g"))))
    aggs = [F.max("n").cast("long").alias("n_rows")]
    for q in qs:
        k = F.expr(f"({q} * n + 99) div 100")
        aggs.append(F.min(F.when(F.col("cum") >= k, F.col("v")))
                    .cast("long").alias(f"p{q}"))
    return (cum.groupBy(F.col("g").alias(group_col)).agg(*aggs))
