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


def shard_skew_audit(df: DataFrame, key, n_shards: int = 32
                     ) -> DataFrame:
    """Measure BEFORE salting (E153): the diagnosis that justifies
    :func:`salted_repartition` — hash the key column into
    ``n_shards`` buckets exactly as a shuffle partitioner would and
    report, per shard, how unbalanced the layout is and WHICH key is
    responsible.  The two failure modes it separates:

    * **hot key** (one key dominates its shard → salting that key
      helps; ``hot_share_ppm`` ≈ ``imbalance``);
    * **hash collision pile-up** (many distinct keys land together →
      more shards help, salting doesn't; high ``imbalance`` with low
      ``hot_share_ppm``).

    Exact integers: ``imbalance_ppm = 10⁶·n_rows·n_shards div
    total_rows`` (10⁶ = perfectly balanced), ``hot_share_ppm =
    10⁶·hot_count div n_rows``.  Shard = 16-bit md5 chunk mod
    n_shards — the cross-engine recipe shared with the HLL/KMV
    sketches, deterministic in any engine.

    Shape: one (shard, key) hash agg (map-side partials absorb the
    hot key's repetition — the audit never shuffles the skew it
    measures), one n_shards-row agg, and a 1-row totals dim joined
    broadcast.  Output is n_shards rows however large the input.

    → ``(shard, n_keys, n_rows, hot_key, hot_count, hot_share_ppm,
    imbalance_ppm)``; hot key ties broken to the lexicographically
    LARGEST key (max(struct) — deterministic).

    Reference analog: none — the reference never shards (single
    process); engine extension (SURVEY §2.10 E153).
    """
    from web_graph_spark.functions.stats import _hexchunk

    shard = (_hexchunk(F.md5(key), 1) % int(n_shards)).alias("shard")
    per_key = (df.select(shard, key.cast("string").alias("k"))
               .groupBy("shard", "k")
               .agg(F.count(F.lit(1)).cast("long").alias("c")))
    per_shard = (per_key.groupBy("shard")
                 .agg(F.count(F.lit(1)).cast("long").alias("n_keys"),
                      F.sum("c").cast("long").alias("n_rows"),
                      F.max(F.struct(F.col("c").alias("c"),
                                     F.col("k").alias("k")))
                      .alias("m")))
    total = per_shard.agg(F.sum("n_rows").cast("long").alias("total"))
    return (per_shard.join(F.broadcast(total))
            .select("shard", "n_keys", "n_rows",
                    F.col("m.k").alias("hot_key"),
                    F.col("m.c").alias("hot_count"),
                    F.expr("1000000 * m.c div n_rows")
                    .alias("hot_share_ppm"),
                    F.expr(f"1000000 * n_rows * {int(n_shards)} "
                           "div total").alias("imbalance_ppm")))


def join_key_profile(df: DataFrame, key, key_name: str,
                     broadcast_max: int = 10_000,
                     task_target: int = 100,
                     skew_x100_min: int = 300,
                     max_salt: int = 32) -> DataFrame:
    """Join-strategy advisory from the fact side's key distribution
    (E203) — the measurement behind the broadcast/hash/salt decision
    every big join makes (E153 audits the SHARDS a partitioner
    produces; this profiles the KEY LAW and recommends the plan):

    * ``broadcast`` — the relation itself fits the broadcast ceiling
      (``n_rows ≤ broadcast_max``): ship it, skew irrelevant;
    * ``salted(k)`` — the hottest key alone overflows a task
      (``max_freq > task_target``) AND either the law is genuinely
      skewed (``max/p50 ≥ skew_x100_min/100``) or the hot key
      GROSSLY overflows (``max_freq > 10·task_target`` — a
      single-key relation has ratio 1.0 yet still needs the fan-out):
      spread over ``k = min(ceil(max_freq / task_target), max_salt)``
      salts;
    * ``hash`` — otherwise: plain shuffle join is right, salting
      would only add a merge stage.

    The p50 comes from the frequency-OF-frequency histogram —
    (freq, n_keys at freq), a dim bounded by the VALUE RANGE of
    frequencies, never by key count — cumulated in freq order; the
    hot key is the max id among max-frequency keys (deterministic,
    no max_by tie coin-flip).  All integer arithmetic.

    → 1 row: (key_name, n_rows, n_keys, max_freq, hot_key, p50_freq,
    skew_x100, strategy, salt_buckets).

    Scale shape: one key hash agg (uniform), one histogram agg over
    the freq dim, 1-row combines.
    """
    freq = (df.select(key.cast("string").alias("k"))
            .groupBy("k").agg(F.count(F.lit(1)).alias("f")))
    stats = freq.agg(
        F.sum("f").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("f").cast("long").alias("max_freq"))
    hist = freq.groupBy("f").agg(F.count(F.lit(1)).alias("nk"))
    from pyspark.sql import Window

    wc = (Window.orderBy("f")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    med = (hist.withColumn("cum", F.sum("nk").over(wc))
           .crossJoin(F.broadcast(stats.select("n_keys")))
           .filter(F.col("cum") * 2 >= F.col("n_keys") + 1)
           .agg(F.min("f").cast("long").alias("p50_freq")))
    hot = (freq.crossJoin(F.broadcast(stats.select("max_freq")))
           .filter(F.col("f") == F.col("max_freq"))
           .agg(F.max("k").alias("hot_key")))
    salt = F.least(
        F.expr(f"(max_freq + {task_target} - 1) div {task_target}"),
        F.lit(max_salt)).cast("long")
    strategy = (
        F.when(F.col("n_rows") <= broadcast_max, F.lit("broadcast"))
        .when((F.col("max_freq") > task_target)
              & ((F.col("skew_x100") >= skew_x100_min)
                 | (F.col("max_freq") > 10 * task_target)),
              F.lit("salted"))
        .otherwise(F.lit("hash")))
    return (stats.crossJoin(F.broadcast(med))
            .crossJoin(F.broadcast(hot))
            .withColumn("skew_x100",
                        F.expr("max_freq * 100 div p50_freq")
                        .cast("long"))
            .select(F.lit(key_name).alias("key_name"),
                    "n_rows", "n_keys", "max_freq", "hot_key",
                    "p50_freq", "skew_x100",
                    strategy.alias("strategy"),
                    F.when(strategy == "salted", salt)
                    .otherwise(F.lit(0)).cast("long")
                    .alias("salt_buckets")))
