"""Skew-aware salted repartitioning for hot hosts (north_rule item).

The reference never confronts skew — goque hands URLs to 2 workers in
FIFO order regardless of host (/root/reference/cmd/link-processor/
main.go:182-189).  At 10^10-frontier scale a Zipf host distribution
puts double-digit percentages of a wave on a handful of hosts, and any
stage partitioned by raw ``host`` serializes on them.

:func:`salted_repartition` spreads each key over ``salt_buckets``
sub-partitions with a *data-derived* salt (``pmod(xxhash64(row_key),
S)``) — deterministic across runs and cluster sizes (no
rand()/partition-id dependence, which would break crawl-order
reproducibility and resume).  Politeness interplay: a host fanned out
over S tasks needs its per-wave budget enforced BEFORE the fan-out —
which is exactly the wave pipeline's order (budget cut via
WindowGroupLimit in ``schedule_wave``, THEN salted repartition for the
fetch stage), so the fan-out never violates the budget, it only
parallelizes the already-admitted rows.

Join-side skew (frontier ⋈ documents on a skewed key) is left to AQE's
``skewJoin`` (enabled in session defaults); this module is for the
*stage* partitioning the planner cannot fix: per-host fetch work in
``applyInPandas`` partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_repartition"]


def salted_repartition(df: DataFrame, key_col: str, row_key_col: str,
                       salt_buckets: int = 8,
                       num_partitions: int | None = None) -> DataFrame:
    """Repartition on ``(key, salt)`` where ``salt = pmod(
    xxhash64(row_key), salt_buckets)`` — any single hot ``key`` spreads
    over up to ``salt_buckets`` partitions instead of one.

    ``row_key_col`` must be a stable row identity (e.g. ``page_id``)
    so the salt — and therefore partition placement and the engine's
    per-partition metrics — is reproducible run-to-run.
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    salt = F.pmod(F.xxhash64(F.col(row_key_col)), F.lit(salt_buckets))
    return df.repartition(num_partitions, F.col(key_col), salt)
