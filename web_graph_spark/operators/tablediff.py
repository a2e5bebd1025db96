"""Merkle range-digest table diff: find WHERE two snapshots of a
keyed table differ without shipping either table.

The operational problem at 100 TB: two replicas of the pages store
(source vs migrated copy, primary vs restored backup, two Iceberg
snapshots) must be certified equal — or the divergence LOCALIZED —
and a row-by-row compare costs a full shuffle of both tables.  The
classic answer is a Merkle range tree (Cassandra repair, Dynamo
anti-entropy): digest key ranges, compare the small digest tables
top-down, and drill into rows only inside ranges that disagree.

This implementation uses the ORDER-INDEPENDENT incremental-hash
variant (AdHash — Bellare & Micciancio, EUROCRYPT'97): a range's
digest is the SUM of its rows' hashes in decimal(38,0) (the
graph_algos._edge_digest discipline), so every digest is a map-side
partial-aggregable fold — one uniform-key shuffle builds all leaves,
the pyramid above is dim-sized arithmetic, and two replicas can
build their trees with different partitionings/row orders and still
compare bit-for-bit.  A classical child-hash-of-hashes Merkle tree
would force an ordered fold per node; commutative sums are the
Spark-shaped (and replayable-in-any-engine) choice.  Collision
stance: forging a colliding range needs a subset-sum over md5-derived
48-bit values — fine for corruption DETECTION (the use case), not for
adversarial integrity proofs (use a crypto accumulator there).

Row digests reuse the repo's cross-engine hex48 recipe (md5 + strpos
arithmetic, functions/stats.py:_hex48) so the DuckDB oracle replays
the whole tree; xxhash64 would be faster JVM-side but is not
oracle-replayable (the _edge_digest/golden split).

Reference analog: none — engine extension (SURVEY §2.10 E134).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_digest(key, payload):
    from ..functions.stats import _hex48

    return _hex48(F.concat(key.cast("string"), F.lit(":"),
                           payload.cast("string")))


def merkle_leaves(df: DataFrame, key, payload,
                  width: int = 64) -> DataFrame:
    """Leaf digest table ``(leaf, dig, n)`` for one snapshot: leaf =
    key div width (key-ordered ranges, so a divergent leaf IS a key
    range a drill-down can push down as a scan predicate), dig =
    Σ hex48(key ':' payload) over the leaf in decimal(38,0), n = row
    count.  One fact-sized scan + one uniform-key hash agg with
    map-side partials — the whole per-replica cost."""
    k = key.cast("long")
    return (df.select((k - (k % width)).alias("leaf"),
                      _row_digest(key, payload).alias("d"))
            .groupBy("leaf")
            .agg(F.sum(F.col("d").cast("decimal(38,0)")).alias("dig"),
                 F.count(F.lit(1)).cast("long").alias("n")))


def merkle_levels(leaves: DataFrame, levels: int = 4,
                  width: int = 64) -> DataFrame:
    """The digest pyramid ``(level, bucket, dig, n)`` above a leaf
    table: level 0 = the leaves (bucket = leaf = range lo, a multiple
    of ``width``), each level up pairs adjacent ranges (bucket aligns
    to width·2^level) and sums digests/counts — dim-sized arithmetic,
    no fact re-scan.  Root equality certifies snapshot equality in
    ONE row exchanged; on mismatch each level halves the search space
    (the anti-entropy early exit — pinned in tests: a single changed
    row flips exactly one bucket per level)."""
    out = leaves.select(F.lit(0).cast("int").alias("level"),
                        F.col("leaf").alias("bucket"), "dig", "n")
    cur = out
    for lv in range(1, levels + 1):
        span = width * (2 ** lv)
        cur = (cur.groupBy((F.col("bucket") - (F.col("bucket") % span))
                           .alias("bucket"))
               .agg(F.sum("dig").alias("dig"), F.sum("n").alias("n"))
               .select(F.lit(lv).cast("int").alias("level"),
                       "bucket", "dig", "n"))
        out = out.unionByName(cur)
    return out


def merkle_diff_ranges(leaves_a: DataFrame,
                       leaves_b: DataFrame) -> DataFrame:
    """Divergent leaf ranges: full-outer join of the two (dim-sized)
    leaf tables, keeping leaves whose digest or count disagrees —
    including ranges present on only one side (pure insert/delete
    ranges).  Returns ``(leaf, n_a, n_b)`` with absent sides as 0."""
    a = leaves_a.select("leaf", F.col("dig").alias("dig_a"),
                        F.col("n").alias("n_a"))
    b = leaves_b.select("leaf", F.col("dig").alias("dig_b"),
                        F.col("n").alias("n_b"))
    j = a.join(b, "leaf", "full_outer")
    diverged = (~F.col("dig_a").eqNullSafe(F.col("dig_b"))
                | ~F.col("n_a").eqNullSafe(F.col("n_b")))
    return (j.filter(diverged)
            .select("leaf",
                    F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
                    F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b")))


def merkle_diff_rows(df_a: DataFrame, df_b: DataFrame, key, payload,
                     width: int = 64) -> DataFrame:
    """The drill-down: row-level classified diff restricted to the
    DIVERGENT leaf ranges only — the Merkle payoff is that the
    row-grain full-outer join touches a few ranges, not the table
    (the range set is a broadcast dim by construction: divergence is
    assumed rare; if half the table diverged you'd diff it outright).
    At scale the leaf predicate is a min/max range filter parquet row
    groups prune on.  Returns ``(leaf, key, status)`` with status ∈
    missing_b (deleted), missing_a (inserted), changed."""
    la = merkle_leaves(df_a, key, payload, width)
    lb = merkle_leaves(df_b, key, payload, width)
    ranges = F.broadcast(merkle_diff_ranges(la, lb).select("leaf"))

    def rows(df: DataFrame) -> DataFrame:
        k = key.cast("long")
        return (df.select((k - (k % width)).alias("leaf"),
                          k.alias("key"),
                          _row_digest(key, payload).alias("d"))
                .join(ranges, "leaf"))

    ra = rows(df_a).withColumnRenamed("d", "d_a")
    rb = (rows(df_b).withColumnRenamed("d", "d_b")
          .withColumnRenamed("leaf", "leaf_b"))
    j = ra.join(rb.select(F.col("leaf_b").alias("leaf"), "key", "d_b"),
                ["leaf", "key"], "full_outer")
    status = (F.when(F.col("d_b").isNull(), "missing_b")
              .when(F.col("d_a").isNull(), "missing_a")
              .otherwise("changed"))
    return (j.filter(~F.col("d_a").eqNullSafe(F.col("d_b")))
            .select("leaf", "key", status.alias("status")))


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column-profile battery (E233) — the Deequ/dbt-docs-style table
    profiler a lake runs on every new snapshot before anyone queries
    it: per requested column the row count, NULL count, exact distinct
    count, and min/max (cast to string AFTER aggregating on the native
    type, so numeric columns keep numeric order).

    → one row per column: (col_name, n_rows, n_null, n_distinct,
    min_value, max_value).

    Scale shape: ONE fact scan — a single aggregate row computes every
    column's stats at once (the multi-distinct agg expands the scan
    |cols|× map-side; partials still combine before the shuffle, and
    the shuffled state is ONE row), then unpivots via an in-row
    explode of |cols| structs.  No per-column re-scan, no window, no
    Python.  At 10^10 rows exact distincts are the audit-scale tier;
    swap ``F.approx_count_distinct`` for the routine-profiling tier
    (the oracle certifies the exact path).

    Reference analog: none — engine extension (SURVEY §2.10 E233).
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).cast("long")
            .alias(f"__null_{c}"),
            F.countDistinct(c).cast("long").alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.col("__n").alias("n_rows"),
                 F.col(f"__null_{c}").alias("n_null"),
                 F.col(f"__nd_{c}").alias("n_distinct"),
                 F.col(f"__min_{c}").alias("min_value"),
                 F.col(f"__max_{c}").alias("max_value"))
        for c in cols])
    return (one.select(F.explode(rows).alias("p"))
            .select("p.col_name", "p.n_rows", "p.n_null",
                    "p.n_distinct", "p.min_value", "p.max_value"))


def fk_audit(edges) -> DataFrame:
    """Referential-integrity audit (E197) — the dbt-test / Deequ-style
    constraint battery a warehouse runs before trusting a snapshot
    for joins: per declared FK edge ``(name, child, fk_col, parent,
    pk_col)``, the exact violation counts that break downstream
    joins silently —

    * ``n_null_fk``   — child rows with a NULL foreign key (inner
      joins drop them; is that intended?);
    * ``n_orphans``   — child rows whose non-NULL key has no parent
      (fan-in loss);
    * ``n_dup_pk``    — parent keys appearing more than once (fan-out
      EXPLOSION — the silent row-multiplier);
    * ``ok``          — all three zero.

    (The reference leans on Postgres FK constraints + a 20-retry
    insert loop, linkstorage.go:434-476; an immutable-files lake has
    no constraint engine, so the audit IS the constraint.)

    → one row per edge: (relation, n_child, n_null_fk, n_orphans,
    n_parent, n_dup_pk, ok).

    Scale shape per edge: one left-anti join on the uniform key for
    orphans (null keys pre-filtered), one pk hash agg for dups, and
    1-row aggregate combines (the allowlisted constant-size cross) —
    no window, no collect.
    """
    out = None
    for name, child, fk_col, parent, pk_col in edges:
        fks = child.select(F.col(fk_col).alias("fk"))
        pks = parent.select(F.col(pk_col).alias("pk"))
        child_agg = fks.agg(
            F.count(F.lit(1)).cast("long").alias("n_child"),
            F.sum(F.col("fk").isNull().cast("long")).cast("long")
            .alias("n_null_fk"))
        orphans = (fks.filter(F.col("fk").isNotNull())
                   .join(pks.distinct(), fks["fk"] == pks["pk"],
                         "left_anti")
                   .agg(F.count(F.lit(1)).cast("long")
                        .alias("n_orphans")))
        parent_agg = (pks.groupBy("pk")
                      .agg(F.count(F.lit(1)).alias("c"))
                      .agg(F.count(F.lit(1)).cast("long")
                           .alias("n_parent"),
                           F.sum((F.col("c") > 1).cast("long"))
                           .cast("long").alias("n_dup_pk")))
        row = (child_agg
               .crossJoin(F.broadcast(orphans))
               .crossJoin(F.broadcast(parent_agg))
               .select(F.lit(name).alias("relation"),
                       "n_child", "n_null_fk", "n_orphans",
                       "n_parent", "n_dup_pk",
                       ((F.col("n_null_fk") == 0)
                        & (F.col("n_orphans") == 0)
                        & (F.col("n_dup_pk") == 0)).alias("ok")))
        out = row if out is None else out.unionByName(row)
    return out
