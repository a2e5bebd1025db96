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


def funnel_steps(events: DataFrame,
                 steps: tuple[str, ...] = ("view", "click", "purchase"),
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type",
                 id_col: str = "event_id") -> DataFrame:
    """Ordered conversion funnel: how many users performed step 1,
    then step 2 AT OR AFTER their earliest qualifying step 1, then
    step 3 at or after that step 2, … — the product-analytics
    primitive (Amplitude/Mixpanel funnels) a behavioral dataset
    pipeline reports on.

    Semantics: t_1(u) = min ts of step-1 events; t_i(u) = min ts of
    step-i events with ts ≥ t_{i-1}(u).  Ties at equal ts count in
    step order (a click stamped the same microsecond as the first
    view converts).

    100 TB shape: ONE hash shuffle on the user key + one per-user
    sort carries the WHOLE chain — the running-min windows for every
    step share a single (partition, order) spec, so Catalyst plans
    one Exchange + one Sort + N pipelined Window nodes, then a
    per-user hash agg and a 1-row global agg.  No self-joins: the
    equivalent join-chain (min-agg per step, join back, repeat)
    shuffles len(steps) times — that form is left to the DuckDB
    oracle, which makes it a genuinely independent algorithm.

    Per-row derivation: ordering by (ts, step-priority, event_id)
    puts step i-1 before step i at equal ts, so "qualifying" is just
    'the running min of the previous step's qualifying timestamps is
    non-null at this row' — rows are time-ordered, hence every
    candidate's ts ≥ any running min over its prefix.

    Returns ONE row: n_users, n_<step>… (users reaching each stage),
    conv_<step>_bp (basis points vs the previous stage; step 1 vs all
    users), all exact integers."""
    pri = "CASE " + " ".join(
        f"WHEN {type_col} = '{s}' THEN {i}" for i, s in enumerate(steps)
    ) + f" ELSE {len(steps)} END"
    w = (Window.partitionBy(user_col)
         .orderBy(ts_col, F.expr(pri), id_col)
         .rowsBetween(Window.unboundedPreceding, 0))

    df = events.select(user_col, ts_col, type_col, id_col)
    qual_prev = None   # running min of previous step's qualifying ts
    user_flags = []
    for i, s in enumerate(steps):
        is_step = F.col(type_col) == s
        qual = is_step if qual_prev is None else \
            (is_step & qual_prev.isNotNull())
        df = df.withColumn(f"q_{i}", F.when(qual, F.col(ts_col)))
        qual_prev = F.min(f"q_{i}").over(w)
        df = df.withColumn(f"r_{i}", qual_prev)
        user_flags.append(
            F.max(F.col(f"q_{i}").isNotNull().cast("long"))
            .alias(f"u_{i}"))
        qual_prev = F.col(f"r_{i}")

    per_user = df.groupBy(user_col).agg(*user_flags)
    aggs = [F.count(F.lit(1)).alias("n_users")]
    for i, s in enumerate(steps):
        aggs.append(F.sum(f"u_{i}").cast("long").alias(f"n_{s}"))
    out = per_user.agg(*aggs)
    convs = []
    prev = "n_users"
    for s in steps:
        convs.append(F.expr(f"(n_{s} * 10000) div greatest({prev}, 1)")
                     .alias(f"conv_{s}_bp"))
        prev = f"n_{s}"
    return out.select("n_users", *[f"n_{s}" for s in steps], *convs)


def funnel_sql(steps: tuple[str, ...] = ("view", "click", "purchase"),
               table: str = "events") -> str:
    """DuckDB mirror of funnel_steps via the INDEPENDENT algorithm:
    a chain of min-aggregate + join CTEs (t_i = min ts of step-i
    events ≥ t_{i-1}), not the window form the Spark side uses."""
    ctes = [f"t0 AS (SELECT user_id, min(ts) AS ts0 FROM {table} "
            f"WHERE event_type = '{steps[0]}' GROUP BY user_id)"]
    for i, s in enumerate(steps[1:], start=1):
        ctes.append(
            f"t{i} AS (SELECT e.user_id, min(e.ts) AS ts{i} "
            f"FROM {table} e JOIN t{i-1} p USING (user_id) "
            f"WHERE e.event_type = '{s}' AND e.ts >= p.ts{i-1} "
            f"GROUP BY e.user_id)")
    n_cols = [f"(SELECT count(*) FROM (SELECT DISTINCT user_id "
              f"FROM {table})) AS n_users"]
    for i, s in enumerate(steps):
        n_cols.append(f"(SELECT count(*) FROM t{i}) AS n_{s}")
    convs, prev = [], "n_users"
    for s in steps:
        convs.append(f"(n_{s} * 10000) // greatest({prev}, 1) "
                     f"AS conv_{s}_bp")
        prev = f"n_{s}"
    return ("WITH " + ",\n".join(ctes)
            + ",\nc AS (SELECT " + ", ".join(n_cols) + ")\n"
            + "SELECT n_users, "
            + ", ".join(f"n_{s}" for s in steps) + ", "
            + ", ".join(convs) + " FROM c")


def cohort_retention(events: DataFrame, anchor: str = "2024-01-01",
                     user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day
    (cohort), then for each later day-offset the fraction of the
    cohort active again — the other product-analytics table every
    behavioral dataset ships with (funnel = conversion, this =
    retention).

    100 TB shape: (user, day) activity is ONE distinct (map-side
    combined — a user's thousandth event that day dies in the
    partial agg); cohorts are a user-key agg co-partitioned with it;
    since (user, day) rows are unique, per-cell counts are plain
    ``count(*)`` — no count-distinct shuffle.  Cohort sizes join back
    on the cohort day (≤ days-in-corpus rows — broadcast).  Days are
    exact integer offsets from the anchor (``datediff``), never
    date strings, so engines can't disagree on formatting."""
    day = F.datediff(F.to_date(ts_col), F.to_date(F.lit(anchor)))
    active = (events.select(F.col(user_col).alias("u"),
                            day.cast("long").alias("day"))
              .distinct())
    firsts = active.groupBy("u").agg(F.min("day").alias("cohort_day"))
    cells = (active.join(firsts, "u")
             .groupBy("cohort_day",
                      (F.col("day") - F.col("cohort_day"))
                      .alias("day_offset"))
             .agg(F.count(F.lit(1)).alias("n_active")))
    sizes = firsts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size"))
    return (cells.join(F.broadcast(sizes), "cohort_day")
            .select("cohort_day", "day_offset", "cohort_size", "n_active",
                    F.expr("(n_active * 10000) div cohort_size")
                    .alias("retention_bp")))


def cohort_retention_sql(anchor: str = "2024-01-01",
                         table: str = "events") -> str:
    """DuckDB mirror of cohort_retention."""
    return f"""
WITH active AS (
  SELECT DISTINCT user_id AS u,
    CAST(datediff('day', DATE '{anchor}', CAST(ts AS DATE)) AS BIGINT)
      AS day
  FROM {table}
),
firsts AS (SELECT u, min(day) AS cohort_day FROM active GROUP BY u),
cells AS (
  SELECT f.cohort_day, a.day - f.cohort_day AS day_offset,
         count(*) AS n_active
  FROM active a JOIN firsts f USING (u)
  GROUP BY 1, 2
),
sizes AS (SELECT cohort_day, count(*) AS cohort_size
          FROM firsts GROUP BY 1)
SELECT c.cohort_day, c.day_offset, s.cohort_size, c.n_active,
       (c.n_active * 10000) // s.cohort_size AS retention_bp
FROM cells c JOIN sizes s USING (cohort_day)"""


def countmin_heavy_hitters(events: DataFrame, key,
                           depth: int = 4, width: int = 64,
                           topk: int = 50) -> DataFrame:
    """Count-min-sketch heavy hitters (Cormode & Muthukrishnan 2005)
    with the exact counts alongside — the fixed-size-state frequency
    tier for streams: the sketch is ``depth × width`` integer cells
    no matter how many distinct keys flow past, which is what a
    per-window streaming aggregator can actually hold at 10^10
    events/day (the exact per-key agg can't — its state is the key
    cardinality).

    Hashing is the repo's cross-engine ``hex16`` recipe (md5 + strpos
    arithmetic, operators/graph_algos.py:_hex16) with the row index
    as salt: ``bucket_j(key) = hex16(j || ':' || key) mod width`` —
    deterministic everywhere, so a SQL oracle rebuilds the identical
    sketch.  Estimate(key) = min over the ``depth`` cells; CMS
    guarantees estimate ≥ true (one-sided error), pinned in tests.

    Shape at scale: the cell build is one hash agg over a depth-way
    row explosion (map-side partials absorb hot keys BEFORE the
    shuffle — the explosion never travels); the sketch is then a
    ≤depth·width-row broadcast dim probed by the candidate keys; the
    top-k cut is a TakeOrdered map-side heap, never a global sort.
    Returns ``(key, n_true, n_cms)`` for the top-k keys by true
    count (ties → smallest key): the exact column certifies the
    sketch's overestimate on exactly the keys a monitor would alert
    on.
    """
    from web_graph_spark.operators.graph_algos import _hex16

    keyed = events.select(key.alias("key")).filter(F.col("key") != "")
    true_counts = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("n_true"))
    js = F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j")
    bucket = (_hex16(F.concat(F.col("j").cast("string"), F.lit(":"),
                              F.col("key"))) % width).alias("bucket")
    cells = (keyed.select("key", js).select("j", bucket)
             .groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c")))
    top = (true_counts
           .orderBy(F.desc("n_true"), F.asc("key")).limit(topk))
    probes = top.select("key", "n_true", js).select(
        "key", "n_true", F.col("j"),
        (_hex16(F.concat(F.col("j").cast("string"), F.lit(":"),
                         F.col("key"))) % width).alias("bucket"))
    return (probes.join(F.broadcast(cells), ["j", "bucket"])
            .groupBy("key", "n_true")
            .agg(F.min("c").cast("long").alias("n_cms"))
            .select("key", F.col("n_true").cast("long").alias("n_true"),
                    "n_cms"))


def hierarchical_rollup(facts: DataFrame, keys: list[str],
                        measures: dict[str, "F.Column"]) -> DataFrame:
    """Multi-grain rollup (the TimescaleDB/Druid continuous-aggregate
    shape: hour → day → total) WITHOUT Spark's ``rollup()`` Expand —
    which replicates every fact row once per grain (×(len(keys)+1)
    map-side at 10^10 rows) before the aggregate.  Here the fact
    stream is scanned and shuffled exactly ONCE at the finest grain;
    every coarser grain re-aggregates the PREVIOUS grain's rows — a
    dim bounded by key cardinality (days × hours × types), never by
    |facts|.  Sound because count and integer sums reassociate
    exactly; callers must therefore pass integral per-row measures
    (floor float money to centi-units per ROW first — flooring a
    re-aggregated float sum would diverge between grains and engines).

    Output matches ``GROUP BY ROLLUP`` bit-for-bit: rolled-up key
    columns are NULL and ``gid`` carries the standard GROUPING_ID
    bitmask (finest = 0, grand total = 2^len(keys) − 1), so a SQL
    engine's native rollup is a fully independent oracle.
    """
    finest = facts.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(c).alias(nm) for nm, c in measures.items()])
    types = {f.name: f.dataType for f in finest.schema.fields}
    m_names = list(measures)
    out_cols = [*keys, "gid", "n", *m_names]

    def level(df: DataFrame, kept: int, gid: int) -> DataFrame:
        cols = ([F.col(k) for k in keys[:kept]]
                + [F.lit(None).cast(types[k]) for k in keys[kept:]]
                + [F.lit(gid).alias("gid"), F.col("n")]
                + [F.col(nm) for nm in m_names])
        return df.select(*cols).toDF(*out_cols)

    levels = [level(finest, len(keys), 0)]
    prev = finest
    for kept in range(len(keys) - 1, -1, -1):
        prev = prev.groupBy(*keys[:kept]).agg(
            F.sum("n").alias("n"),
            *[F.sum(nm).alias(nm) for nm in m_names])
        levels.append(level(prev, kept, (1 << (len(keys) - kept)) - 1))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def _hexchunk(h, start: int):
    """Integer in [0, 65535] from 4 hex chars of an md5 string column
    starting at 1-based ``start`` — the cross-engine hex16 recipe
    (strpos arithmetic, no conv()) applied to ONE shared digest."""
    alpha = F.lit("0123456789abcdef")
    d = [F.instr(alpha, F.substring(h, start + i, 1)) - 1
         for i in range(4)]
    return (d[0] * 4096 + d[1] * 256 + d[2] * 16 + d[3]).cast("long")


HLL_M = 64                       # registers (α_64 = 0.709 exactly)
HLL_WBITS = 32                   # rho-space bits
_HLL_NUM = 709 * (1 << 45)       # α·m²·2^(wbits+1) · 1000⁻¹-pending


def hll_distinct(df: DataFrame, group: str, key) -> DataFrame:
    """HyperLogLog distinct count (Flajolet et al. 2007) per group in
    EXACT integer arithmetic, with the true count-distinct alongside
    — the fixed-size-state cardinality tier: 64 integer registers per
    group no matter how many distinct keys stream past, which is what
    a per-window streaming aggregator can hold when the exact
    count-distinct's key-cardinality state can't.

    Everything is cross-engine exact: register index and rho-word are
    hex16 chunks of ONE md5; rho is a ``length(bin(w))`` bit-length
    (no float log2); the harmonic sum is Σ 2^(wbits+1−M_j) — dyadic
    terms scaled to integers, with absent registers folded in as
    ``(m − n_regs)·2^(wbits+1)`` so no register dim is ever
    materialized; the estimate is one integer division
    ``α·m²·2^(wbits+1) // (1000·S)``.  This is the RAW estimator —
    no small-range linear-counting branch (it needs ln); below
    ~2.5·m = 160 distinct it overestimates, so pair it with the exact
    tier there (tests pin the ±13%·√-error band in the valid zone).

    Shape at scale: one (group, register) hash agg whose map-side
    partials absorb repeated keys BEFORE the shuffle, then a ≤64-rows-
    per-group re-agg; the certification count-distinct is the only
    key-cardinality-sized state and exists to be dropped at 10^10.
    """
    h = F.md5(key)
    w = _hexchunk(h, 5) * 65536 + _hexchunk(h, 9)
    keyed = df.select(
        F.col(group).alias("g"),
        (_hexchunk(h, 1) % HLL_M).alias("j"),
        (F.lit(HLL_WBITS + 1)
         - F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w))))
        .alias("rho"),
        key.alias("key"))
    regs = keyed.groupBy("g", "j").agg(F.max("rho").alias("M"))
    sk = (regs.groupBy("g")
          .agg(F.sum(F.expr(
              f"shiftleft(cast(1 as bigint), {HLL_WBITS + 1} - M)"))
               .alias("s_present"),
               F.count(F.lit(1)).alias("n_regs"))
          .select("g", (F.col("s_present")
                        + (F.lit(HLL_M) - F.col("n_regs"))
                        * F.lit(1 << (HLL_WBITS + 1))).alias("s2"))
          .select("g", F.expr(f"{_HLL_NUM} div (1000 * s2)")
                  .alias("n_hll")))
    exact = keyed.groupBy("g").agg(
        F.countDistinct("key").alias("n_exact"))
    return (exact.join(sk, "g")
            .select(F.col("g").alias(group), "n_exact", "n_hll"))


def trailing_window_agg(events: DataFrame, group: str, ts: str,
                        measure, hours: int = 3) -> DataFrame:
    """Trailing sliding-window aggregate (the rate/alerting shape:
    "events and volume in the last H hours, evaluated hourly") WITHOUT
    Spark's ``window(ts, '3 hours', '1 hour')``, which replicates
    every fact row H times before aggregating.  The fact stream
    aggregates ONCE at the hour grain (one shuffle, map-side partials
    absorb hot hours); the trailing window then runs as a RANGE-frame
    window over the dim-sized hourly rows — per group, |hours with
    events| rows, not |facts|.

    RANGE (not ROWS) on epoch seconds makes gaps exact: an hour with
    no events contributes nothing and is skipped correctly, so output
    rows exist only for hours that have events, each summing the
    closed interval [h − (H−1)h, h].  ``measure`` must be an integral
    per-row column (exact re-aggregation; floor money per row first).
    """
    hourly = (events
              .groupBy(F.col(group).alias("g"),
                       F.date_trunc("hour", ts).alias("hour"))
              .agg(F.count(F.lit(1)).alias("n_1h"),
                   F.sum(measure).alias("m_1h")))
    w = (Window.partitionBy("g")
         .orderBy(F.unix_timestamp(F.col("hour").cast("timestamp")))
         .rangeBetween(-(hours - 1) * 3600, 0))
    return (hourly.select(
        F.col("g").alias(group), "hour", "n_1h",
        F.col("m_1h").cast("long").alias("m_1h"),
        F.sum("n_1h").over(w).cast("long").alias(f"n_{hours}h"),
        F.sum("m_1h").over(w).cast("long").alias(f"m_{hours}h")))


def trailing_anomaly(events: DataFrame, group: str, ts: str,
                     hours: int = 24, z: int = 3,
                     min_prev: int = 6) -> DataFrame:
    """Rate-anomaly detection per group on the hour grain — flag every
    hour whose event count deviates from its own trailing ``hours``
    baseline by more than ``z`` standard deviations, in EXACT integer
    arithmetic (the alerting pass a crawl/ingest monitor runs; the
    engine-side analog of the reference's queue-length log line,
    cmd/link-processor/main.go:210).

    The float z-score test ``|c - mean| > z*stddev`` is equivalent to
    ``(n*c - s1)^2 > z^2 * (n*s2 - s1^2)`` over the trailing frame's
    ``n = count``, ``s1 = sum(c)``, ``s2 = sum(c^2)`` — integers only,
    so both engines decide every flag bit-identically (exact while
    hourly counts stay under ~10^8; beyond that pre-scale the counts).
    The current hour is EXCLUDED from its own baseline (a spike must
    not suppress itself), and hours with fewer than ``min_prev``
    baseline hours never flag (cold start).

    Shape: the raw stream aggregates ONCE to (group, hour) — map-side
    partials absorb arbitrarily hot groups — then the trailing frame
    is a RANGE window over those dim-sized hourly rows (same argument
    as trailing_window_agg: empty hours handled exactly by the range
    frame, never a fact-replicating slide).
    """
    hourly = (events.groupBy(F.col(group).alias(group),
                             F.date_trunc("hour", F.col(ts)).alias("hr"))
              .agg(F.count(F.lit(1)).cast("long").alias("n_events")))
    ep = F.unix_timestamp("hr")
    w = (Window.partitionBy(group).orderBy(ep.cast("long"))
         .rangeBetween(-hours * 3600, -3600))
    c = F.col("n_events")
    n = F.count("n_events").over(w)
    s1 = F.sum("n_events").over(w)
    s2 = F.sum(c * c).over(w)
    stats = (hourly
             .withColumn("n_prev", F.coalesce(n, F.lit(0)).cast("long"))
             .withColumn("dev_sq",
                         F.when(F.col("n_prev") > 0,
                                (n * c - s1) * (n * c - s1))
                          .otherwise(F.lit(0)).cast("long"))
             .withColumn("thresh_sq",
                         F.when(F.col("n_prev") > 0,
                                F.lit(z * z) * (n * s2 - s1 * s1))
                          .otherwise(F.lit(0)).cast("long")))
    return stats.withColumn(
        "anomaly",
        (F.col("n_prev") >= min_prev)
        & (F.col("dev_sq") > F.col("thresh_sq")))


def hll_distinct_rollup(df: DataFrame, group: list, sub: str,
                        key) -> DataFrame:
    """(group..., n_subs, n_hll) — HLL distinct via MERGED sub-grain
    sketches: registers are built at the (group, ``sub``) grain — the
    pre-aggregated sketch table a real pipeline persists (hourly
    sketches, daily/weekly/monthly rollups all served from the same
    64-int rows without re-reading facts) — then merged to the group
    grain by register-wise max.  HLL's defining algebra (max of maxes
    = global max) makes the merged estimate BIT-IDENTICAL to
    sketching the group directly, which the oracle certifies by
    rebuilding registers straight from the raw rows.

    Shape: one (group, sub, register) agg with map-side partial max
    (≤64 rows per sub-group out of the shuffle), one ≤64·|subs|-row
    re-agg to group registers, one fold — facts are scanned once and
    never re-shuffled for coarser grains (same argument as
    hierarchical_rollup, with sketches instead of exact sums)."""
    h = F.md5(key)
    w = _hexchunk(h, 5) * 65536 + _hexchunk(h, 9)
    gcols = [F.col(g) for g in group]
    keyed = df.select(
        *gcols, F.col(sub).alias("__sub"),
        (_hexchunk(h, 1) % HLL_M).alias("j"),
        (F.lit(HLL_WBITS + 1)
         - F.when(w == F.lit(0), F.lit(0)).otherwise(F.length(F.bin(w))))
        .alias("rho"))
    regs_sub = (keyed.groupBy(*group, "__sub", "j")
                .agg(F.max("rho").alias("M")))
    regs = regs_sub.groupBy(*group, "j").agg(F.max("M").alias("M"))
    subs = (regs_sub.groupBy(*group)
            .agg(F.countDistinct("__sub").cast("long").alias("n_subs")))
    sk = (regs.groupBy(*group)
          .agg(F.sum(F.expr(
              f"shiftleft(cast(1 as bigint), {HLL_WBITS + 1} - M)"))
               .alias("s_present"),
               F.count(F.lit(1)).alias("n_regs"))
          .select(*group, (F.col("s_present")
                           + (F.lit(HLL_M) - F.col("n_regs"))
                           * F.lit(1 << (HLL_WBITS + 1))).alias("s2"))
          .select(*group, F.expr(f"{_HLL_NUM} div (1000 * s2)")
                  .alias("n_hll")))
    return subs.join(sk, group).select(*group, "n_subs", "n_hll")


KMV_K = 256                      # sketch size (default)
KMV_SPACE = 1 << 48              # hash space: 12 md5 hex digits


def _hex48(col):
    """Integer in [0, 2^48) from the first 12 hex chars of md5 —
    the hex16 strpos recipe widened so order statistics over the
    hash space are fine-grained enough for KMV estimation (2^16
    would quantize the k-th minimum to ~1.5% steps)."""
    h = F.md5(col)
    alpha = F.lit("0123456789abcdef")
    v = F.lit(0).cast("long")
    for i in range(1, 13):
        v = v * 16 + (F.instr(alpha, F.substring(h, i, 1)) - 1)
    return v.cast("long")


def kmv_overlap(df: DataFrame, group: str, key, k: int = KMV_K
                ) -> DataFrame:
    """K-minimum-values (theta) sketch set operations per group pair
    (Bar-Yossef et al. 2002; the Apache DataSketches theta family):
    for every pair of groups, estimate |A|, |B|, |A ∩ B| and |A ∪ B|
    of the distinct-``key`` audiences from k-row sketches — the
    overlap question HLL cannot answer (HLL unions but never
    intersects).  All estimates are EXACT integer arithmetic
    (``(k-1)·2^48 div h_(k)``), so both engines reproduce them
    bit-for-bit; the true distinct/overlap counts ride alongside as
    certification and are the only key-cardinality-sized state — at
    10^10 keys you drop them and keep the sketches.

    Mechanics, all cross-engine exact: h = hex48(md5('kmv:'||key));
    sketch(g) = the k smallest DISTINCT h per group (row_number ≤ k
    — WindowGroupLimit cuts to ≤k rows per map task before the
    shuffle); estimate(g) = (k-1)·2^48 div max(sketch) when the
    sketch is full, else the exact count.  Intersection: theta =
    least(h_k(a), h_k(b)); est = |{h ∈ S_a ∩ S_b : h < theta}| ·
    2^48 div theta.  Union: the k smallest of S_a ∪ S_b are the k
    smallest of A ∪ B, so the per-pair k-th order statistic gives
    (k-1)·2^48 div h_k directly.

    Shape at scale: one distinct (group, h) agg (map-side partials
    absorb repeats) -> WindowGroupLimit to G·k sketch rows -> every
    pairwise stage runs on those G·k rows, independent of corpus
    size.  The G² pair dim is a crossJoin of two G-row aggregate
    outputs — bounded by the group-key cardinality, never by rows.

    Reference analog: none — engine extension (SURVEY §2.10 E112).
    """
    kdist = (df.select(F.col(group).alias("g"),
                       _hex48(F.concat(F.lit("kmv:"),
                                       key.cast("string"))).alias("h"))
             .distinct())
    w = Window.partitionBy("g").orderBy("h")
    sk = (kdist.withColumn("rk", F.row_number().over(w))
          .where(F.col("rk") <= k).drop("rk"))
    est = (f"case when n_sk < {k} then n_sk "
           f"else {(k - 1) * KMV_SPACE} div hk end")
    gstats = (sk.groupBy("g")
              .agg(F.max("h").alias("hk"),
                   F.count(F.lit(1)).alias("n_sk"))
              .withColumn("n_kmv", F.expr(est).cast("long")))
    exact = kdist.groupBy("g").agg(F.count(F.lit(1)).alias("n_exact"))
    gdim = F.broadcast(gstats.join(exact, "g"))

    pairs = (gdim.select(F.col("g").alias("g_a"),
                         F.col("hk").alias("hk_a"),
                         F.col("n_kmv").alias("n_a_kmv"),
                         F.col("n_exact").alias("n_a_exact"))
             .crossJoin(gdim.select(F.col("g").alias("g_b"),
                                    F.col("hk").alias("hk_b"),
                                    F.col("n_kmv").alias("n_b_kmv"),
                                    F.col("n_exact").alias("n_b_exact")))
             .where(F.col("g_a") < F.col("g_b"))
             .withColumn("theta", F.least("hk_a", "hk_b")))

    sa = sk.select(F.col("g").alias("g_a"), "h")
    sb = sk.select(F.col("g").alias("g_b"), "h")
    shared = (sa.join(sb, "h").where(F.col("g_a") < F.col("g_b"))
              .join(F.broadcast(pairs.select("g_a", "g_b", "theta")),
                    ["g_a", "g_b"])
              .where(F.col("h") < F.col("theta"))
              .groupBy("g_a", "g_b")
              .agg(F.count(F.lit(1)).alias("n_shared")))

    ka = kdist.select(F.col("g").alias("g_a"), "h")
    kb = kdist.select(F.col("g").alias("g_b"), "h")
    inter_exact = (ka.join(kb, "h").where(F.col("g_a") < F.col("g_b"))
                   .groupBy("g_a", "g_b")
                   .agg(F.count(F.lit(1)).alias("n_inter_exact")))

    pk = pairs.select("g_a", "g_b")
    ua = pk.join(sa, "g_a").select("g_a", "g_b", "h")
    ub = pk.join(sb, "g_b").select("g_a", "g_b", "h")
    wu = Window.partitionBy("g_a", "g_b").orderBy("h")
    uni = (ua.union(ub).distinct()
           .withColumn("rk", F.row_number().over(wu))
           .where(F.col("rk") <= k)
           .groupBy("g_a", "g_b")
           .agg(F.max("h").alias("hk"),
                F.count(F.lit(1)).alias("n_sk"))
           .withColumn("n_union_kmv", F.expr(est).cast("long"))
           .select("g_a", "g_b", "n_union_kmv"))

    return (pairs
            .join(shared, ["g_a", "g_b"], "left")
            .join(inter_exact, ["g_a", "g_b"], "left")
            .join(uni, ["g_a", "g_b"])
            .select(
                "g_a", "g_b", "n_a_exact", "n_b_exact",
                F.coalesce("n_inter_exact", F.lit(0)).cast("long")
                .alias("n_inter_exact"),
                "n_a_kmv", "n_b_kmv",
                F.expr(f"(coalesce(n_shared, 0) * {KMV_SPACE}) "
                       "div theta").cast("long").alias("n_inter_kmv"),
                "n_union_kmv"))


def skyline2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """2-D Pareto skyline (Börzsönyi et al., ICDE'01 "The Skyline
    Operator"): the rows not DOMINATED by any other — no other row is
    ≥ in both objectives and > in at least one.  The multi-objective
    selection a corpus curator runs when two quality axes trade off
    (e.g. length vs lexical diversity): the skyline is every optimal
    trade-off point, with no weighting chosen in advance.

    Survival rule (derived, and what both engines compute): a row
    survives iff ``y == max y within its x group`` AND that group max
    exceeds ``max y over all STRICTLY larger x`` (a larger-x row with
    equal y dominates; an equal-x equal-y twin does not — duplicates
    of a skyline point all survive).

    Shape at scale: NO global sort of the facts — one hash agg to the
    x-grain dim (map-side partials), a running max over that dim
    ordered by x desc (bounded by the VALUE RANGE of x, never by row
    count — the exact_quantiles argument), then one hash join back on
    the uniform x key and a codegen filter.  The textbook
    sort-and-scan needs a total order over the facts; this shape
    never materializes one.

    Reference analog: none — engine extension (SURVEY §2.10 E117).
    """
    xd = df.groupBy(x_col).agg(F.max(y_col).alias("__ymax"))
    w = (Window.orderBy(F.desc(x_col))
         .rowsBetween(Window.unboundedPreceding, -1))
    xd = xd.select(x_col, "__ymax",
                   F.max("__ymax").over(w).alias("__m1"))
    return (df.join(xd, x_col)
            .where((F.col(y_col) == F.col("__ymax"))
                   & (F.col("__m1").isNull()
                      | (F.col("__ymax") > F.col("__m1"))))
            .drop("__ymax", "__m1"))


def exact_quantiles_unbounded(df: DataFrame, group_col: str,
                              value_int,
                              qs: tuple[int, ...] = (50, 95, 99),
                              fanout: int = 4096) -> DataFrame:
    """Exact per-group quantiles when the VALUE RANGE is unbounded —
    the case :func:`exact_quantiles`'s one-histogram trick cannot
    cover (its bin count is the value range).  This is distributed
    quickselect by iterative histogram refinement: each round bins
    the surviving interval into ``fanout`` sub-bins, one hash agg
    finds which sub-bin holds the target rank, and the interval
    narrows by 1/fanout — ≤ ceil(64/log2(fanout)) = 6 rounds for the
    FULL 64-bit domain, each a filtered scan + a fanout-sized
    histogram, never a sort.

    The per-round state (one row per group × quantile: bounds and
    residual rank) is collected to the driver — G·|qs| rows, dim-
    sized by construction — and re-broadcast as literal filters, so
    the facts are only ever scanned with tight pushdown-friendly
    range predicates.

    Same quantile definition as the bounded tier (smallest value
    whose cumulative count reaches ``ceil(q/100 · n)`` — the discrete
    lower quantile), so the two tiers agree exactly wherever both
    apply (pinned in tests).

    Returns ``(group, n_rows, p<q>...)``.

    Reference analog: none — engine extension (SURVEY §2.10 E119).
    """
    vals = df.select(F.col(group_col).cast("string").alias("g"),
                     value_int.cast("long").alias("v"))
    vals = vals.persist()
    try:
        base = (vals.groupBy("g")
                .agg(F.count("*").alias("n"),
                     F.min("v").alias("lo"), F.max("v").alias("hi"))
                .collect())
        # state[(g, q)] = [lo, hi, k_residual]
        state = {}
        n_rows = {}
        for r in base:
            n_rows[r.g] = r.n
            for q in qs:
                state[(r.g, q)] = [r.lo, r.hi, (q * r.n + 99) // 100]
        while True:
            live = {gq: s for gq, s in state.items() if s[0] < s[1]}
            if not live:
                break
            spark = df.sparkSession
            dim = spark.createDataFrame(
                [(g, q, s[0], s[1]) for (g, q), s in live.items()],
                "g string, q int, lo long, hi long")
            j = (vals.join(F.broadcast(dim), "g")
                 .where((F.col("v") >= F.col("lo"))
                        & (F.col("v") <= F.col("hi")))
                 .select("g", "q",
                         F.expr(f"(v - lo) div ((hi - lo + {fanout}) "
                                f"div {fanout})").alias("b")))
            hist = (j.groupBy("g", "q", "b").agg(F.count("*").alias("c"))
                    .collect())
            per = {}
            for r in hist:
                per.setdefault((r.g, r.q), []).append((r.b, r.c))
            for gq, bins in per.items():
                lo, hi, k = state[gq]
                bw = (hi - lo + fanout) // fanout
                cum = 0
                for b, c in sorted(bins):
                    if cum + c >= k:
                        state[gq] = [lo + b * bw,
                                     min(hi, lo + b * bw + bw - 1),
                                     k - cum]
                        break
                    cum += c
        rows = [(g, int(n_rows[g]),
                 *[int(state[(g, q)][0]) for q in qs])
                for g in n_rows]
    finally:
        vals.unpersist()
    spark = df.sparkSession
    schema = (f"{group_col} string, n_rows long, "
              + ", ".join(f"p{q} long" for q in qs))
    return spark.createDataFrame(rows, schema)


def coalesce_intervals(df: DataFrame, key_col: str,
                       start_col: str = "s", end_col: str = "e"
                       ) -> DataFrame:
    """Merge overlapping-or-touching intervals per key into maximal
    covered islands — the coverage primitive behind SLA/uptime math,
    crawl-window coverage, and visit-span dedup (the interval twin of
    sessionize: sessionize splits a point stream on gaps; this
    coalesces SPANS).  Two intervals merge when the later one starts
    at or before the running maximum end of everything before it;
    merging is by coverage, not pairwise overlap (a short interval
    can bridge two long ones).

    Exact integer semantics: touching intervals (end == next start)
    MERGE; a new island opens only on a strict gap.

    Shape at scale: one shuffle on the uniform key, one per-key sort
    (start, end), two pipelined windows sharing that sort (running
    max of prior ends -> island flag -> prefix-sum island id), one
    hash agg.  Output ∝ islands, never input spans.

    Returns ``(key, island_start, island_end, n_intervals,
    covered)``.

    Reference analog: none — engine extension (SURVEY §2.10 E120).
    """
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prior_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.select(
        key_col, start_col, end_col,
        F.when(prior_end.isNull()
               | (F.col(start_col) > prior_end), 1)
        .otherwise(0).alias("__new"))
    runs = flagged.withColumn(
        "__isl", F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (runs.groupBy(key_col, "__isl")
            .agg(F.min(start_col).cast("long").alias("island_start"),
                 F.max(end_col).cast("long").alias("island_end"),
                 F.count(F.lit(1)).alias("n_intervals"))
            .select(key_col, "island_start", "island_end",
                    "n_intervals",
                    (F.col("island_end") - F.col("island_start"))
                    .alias("covered")))


def gini_concentration(df: DataFrame, key_col: str, weight
                       ) -> DataFrame:
    """Gini concentration index of a weight across keys, in EXACT
    integer arithmetic scaled to ppm — the inequality number a crawl
    operator watches (is the fetch budget concentrating on a few
    hosts?) and a corpus curator reports (token share per source).

    ``G = (2·Σ_i i·w_(i) − (n+1)·Σw) / (n·Σw)`` over weights sorted
    ascending with rank i — emitted as ``gini_ppm = 10^6·(2·Σ i·w_(i)
    − (n+1)·Σw) div (n·Σw)`` in decimal(38,0), so both engines agree
    bit-for-bit.

    NO ranking of the key dim (10^8 hosts must never meet a global
    row_number): equal weights occupy a CONTIGUOUS rank block, so
    ``Σ i·w_(i) = Σ_w w·(ct·below + ct·(ct+1)/2)`` folds over the
    weight-VALUE histogram — the raw stream aggregates once to the
    key grain (map-side partials), the key grain aggregates to the
    value histogram (bounded by the value range, the exact_quantiles
    argument), and only that bounded dim sees a cumulative window.
    Returns one row ``(n_keys, total, gini_ppm)``.

    Reference analog: none — engine extension (SURVEY §2.10 E121).
    """
    per = (df.groupBy(F.col(key_col).alias("k"))
           .agg(F.sum(weight).cast("long").alias("w")))
    hist = per.groupBy("w").agg(F.count(F.lit(1)).alias("ct"))
    wv = Window.orderBy("w").rowsBetween(
        Window.unboundedPreceding, -1)
    h = hist.select(
        "w", "ct",
        F.coalesce(F.sum("ct").over(wv), F.lit(0)).alias("below"))
    return (h.agg(
        F.sum("ct").cast("long").alias("n_keys"),
        F.sum(F.expr("cast(w as decimal(38,0)) * ct")).alias("__tot"),
        F.sum(F.expr("cast(w as decimal(38,0)) * "
                     "(ct * below + ct * (ct + 1) div 2)"))
        .alias("__iw"))
        .select("n_keys",
                F.col("__tot").cast("long").alias("total"),
                F.expr("cast(1000000 as decimal(38,0)) * "
                       "(2 * __iw - (n_keys + 1) * __tot) "
                       "div (cast(n_keys as decimal(38,0)) * __tot)")
                .cast("long").alias("gini_ppm")))


def hll_sliding_distinct(df: DataFrame, group: str, ts_col: str,
                         key, hours: int = 24) -> DataFrame:
    """Trailing-window distinct count per hour from MERGED HyperLogLog
    registers — "distinct users in the last H hours, evaluated
    hourly", the streaming-dashboard primitive whose exact form needs
    per-window key-cardinality state (the reason sketches exist).
    HLL registers are max-mergeable, so the trailing window is a
    RANGE-frame ``max`` per register over the HOURLY register table —
    never a re-scan of the raw keys.

    Everything is the repo's exact-integer HLL (same register/rho
    recipe and dyadic fold as :func:`hll_distinct`, E91): both
    engines rebuild every register and every estimate bit-for-bit.
    Empty registers enter as explicit M=0 grid stubs (contributing
    the full 2^(wbits+1) dyadic term — identical to hll_distinct's
    absent-register fold), which also materializes output rows for
    every active hour.

    Shape at scale: facts aggregate ONCE to (group, hour, register)
    — 64 rows per group-hour whatever the key volume, map-side
    partials absorbing repeats; the grid, the RANGE windows and the
    fold all run over TIME-BOUNDED dims.  The exact trailing
    count-distinct rides alongside as certification (a ≤H-fold fact
    expansion — the cost the sketch exists to avoid; drop it at
    10^10).

    Returns ``(group, hr, n_exact, n_hll)`` per active hour.

    Reference analog: none — engine extension (SURVEY §2.10 E124).
    """
    h = F.md5(key)
    w = _hexchunk(h, 5) * 65536 + _hexchunk(h, 9)
    keyed = df.select(
        F.col(group).alias("g"),
        F.expr(f"unix_micros(cast({ts_col} as timestamp)) "
               "div 3600000000").alias("hr"),
        (_hexchunk(h, 1) % HLL_M).alias("j"),
        (F.lit(HLL_WBITS + 1)
         - F.when(w == F.lit(0), F.lit(0)).otherwise(F.length(F.bin(w))))
        .alias("rho"),
        key.alias("key"))
    regs = (keyed.groupBy("g", "hr", "j")
            .agg(F.max("rho").alias("M")))
    hourdim = keyed.select("g", "hr").distinct()
    stubs = hourdim.select(
        "g", "hr",
        F.explode(F.sequence(F.lit(0), F.lit(HLL_M - 1))).alias("j"),
        F.lit(0).alias("M"))
    grid = (stubs.unionByName(regs)
            .groupBy("g", "hr", "j").agg(F.max("M").alias("M")))
    wnd = (Window.partitionBy("g", "j").orderBy("hr")
           .rangeBetween(-(hours - 1), 0))
    merged = grid.select("g", "hr", "j",
                         F.max("M").over(wnd).alias("Mw"))
    est = (merged.groupBy("g", "hr")
           .agg(F.sum(F.expr(
               f"shiftleft(cast(1 as bigint), {HLL_WBITS + 1} - Mw)"))
               .alias("s2"))
           .select("g", "hr",
                   F.expr(f"{_HLL_NUM} div (1000 * s2)")
                   .alias("n_hll")))
    uniq = keyed.select("g", "hr", "key").distinct()
    exact = (hourdim.alias("d")
             .join(uniq.select(F.col("g").alias("g2"),
                               F.col("hr").alias("hr2"), "key"),
                   (F.col("g") == F.col("g2"))
                   & (F.col("hr2") <= F.col("hr"))
                   & (F.col("hr2") > F.col("hr") - hours))
             .groupBy("g", "hr")
             .agg(F.countDistinct("key").alias("n_exact")))
    return (exact.join(est, ["g", "hr"])
            .select(F.col("g").alias(group),
                    F.col("hr").cast("long").alias("hr"),
                    F.col("n_exact").cast("long").alias("n_exact"),
                    F.col("n_hll").cast("long").alias("n_hll")))


# round(log10(1 + 1/d) * 10^6) for d = 1..9 — sums to exactly 10^6
BENFORD_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992,
               51153, 45757)


def benford_audit(df: DataFrame, value_int) -> DataFrame:
    """Benford's-law first-digit audit of a positive integer measure
    — the data-quality / anomaly screen (fabricated or truncated
    numeric feeds fail it; naturally multiplicative ones pass).
    Emits one row per leading digit with the observed count, the
    Benford expectation in ppm (fixed integer literals — no runtime
    logs), and the χ² contribution scaled to ppm::

        chi_ppm(d) = (n_d·10^6 − n·p_d)² div (n·p_d)   [= χ²_d·10^6]

    in decimal(38,0), so both engines produce identical statistics;
    Σ chi_ppm vs the χ²(8) critical value is the test.

    Shape: one codegen digit projection + one 9-bucket hash agg
    (map-side partials) + a 1-row total joined onto the 9-row dim.
    Non-positive values are excluded (no leading digit).

    Reference analog: none — engine extension (SURVEY §2.10 E126).
    """
    counts = (df.select(value_int.cast("long").alias("v"))
              .where(F.col("v") > 0)
              .select(F.substring(F.col("v").cast("string"), 1, 1)
                      .cast("int").alias("digit"))
              .groupBy("digit")
              .agg(F.count(F.lit(1)).alias("n_obs")))
    tot = counts.agg(F.sum("n_obs").cast("long").alias("n"))
    exp = F.element_at(F.array(*[F.lit(p) for p in BENFORD_PPM]),
                       F.col("digit"))
    return (counts.crossJoin(F.broadcast(tot))
            .select("digit", F.col("n_obs").cast("long").alias("n_obs"),
                    exp.cast("long").alias("exp_ppm"), "n")
            .withColumn("__dev", F.expr(
                "cast(n_obs as decimal(38,0)) * 1000000 "
                "- cast(n as decimal(38,0)) * exp_ppm"))
            .withColumn("chi_ppm", F.expr(
                "cast(__dev * __dev div (cast(n as decimal(38,0)) "
                "* exp_ppm) as bigint)"))
            .drop("n", "__dev"))


AMS_K = 256                      # estimators (k//8 groups of 8)


def ams_f2(df: DataFrame, key, k: int = AMS_K) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon–Matias–Szegedy,
    STOC'96): estimate ``F2 = Σ_key f_key²`` — the SELF-JOIN SIZE of
    a key column, the number a planner wants before committing to a
    join on it (F2 ≫ n ⟹ skewed key, salt it).  Exact F2 needs a
    per-key aggregation; the AMS sketch is LINEAR: estimator i keeps
    one counter ``Z_i = Σ_rows sign_i(key)`` with 4-wise-ish hash
    signs, and ``E[Z_i²] = F2`` exactly.  Median-of-means over
    ``k = 64`` estimators in 8 groups — all integers (signs are
    ±1 from the shared hex16 recipe; the median is the lower median
    of the 8 integer group means), so both engines agree
    bit-for-bit.

    Shape at scale: each row updates k counters — a map-side k-fold
    explode whose per-estimator partial sums combine BEFORE the
    shuffle; the reduce side sees k rows total, whatever the input.
    The exact F2 (one per-key agg) rides alongside as certification
    — the state the sketch exists to avoid at 10^10 keys.

    Returns one row ``(n_rows, f2_exact, f2_ams)``.

    Reference analog: none — engine extension (SURVEY §2.10 E127).
    """
    keyed = df.select(key.cast("string").alias("key"))
    est = keyed.select(
        "key", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"))
    h = F.md5(F.concat(F.col("i").cast("string"), F.lit(":"),
                       F.col("key")))
    alpha = F.lit("0123456789abcdef")
    d = [F.instr(alpha, F.substring(h, j, 1)) - 1 for j in (1, 2, 3, 4)]
    h16 = d[0] * 4096 + d[1] * 256 + d[2] * 16 + d[3]
    sign = F.lit(1) - F.lit(2) * (h16 % 2)
    zs = (est.select("i", sign.cast("long").alias("s"))
          .groupBy("i").agg(F.sum("s").alias("z")))
    n_groups = k // 8
    grp = (zs.select((F.col("i") % n_groups).alias("g"),
                     (F.col("z") * F.col("z")).alias("z2"))
           .groupBy("g")
           .agg(F.expr("sum(z2) div 8").cast("long").alias("mean")))
    ams = (grp.agg(F.element_at(F.array_sort(F.collect_list("mean")),
                                n_groups // 2).alias("f2_ams")))
    exact = (keyed.groupBy("key").agg(F.count(F.lit(1)).alias("c"))
             .agg(F.sum(F.col("c") * F.col("c")).cast("long")
                  .alias("f2_exact"),
                  F.sum("c").cast("long").alias("n_rows")))
    return (exact.crossJoin(F.broadcast(ams))
            .select("n_rows", "f2_exact",
                    F.col("f2_ams").cast("long").alias("f2_ams")))


def time_weighted_avg(df: DataFrame, group_cols: list[str],
                      ts_col: str, value_int) -> DataFrame:
    """Time-weighted average over irregular samples (the TimescaleDB
    ``time_weight('LOCF')`` shape): each sample holds its value until
    the next one, and the average weights each value by how long it
    HELD, not by how often it was sampled — the correct mean for
    sensor/price/gauge streams where sampling density varies.

    Exact integers: value in fixed-point units, time in epoch µs;
    ``twap = Σ v_i·(t_{i+1} − t_i) div (t_n − t_1)`` over
    decimal(38,0), per group, samples ordered by (ts, value).
    Groups with fewer than two samples have zero span and are
    excluded (no held interval to average).

    Shape: one shuffle on the uniform group key, one per-group sort
    shared by the single lead window, one hash agg.

    Reference analog: none — engine extension (SURVEY §2.10 E128).
    """
    w = Window.partitionBy(*group_cols).orderBy(ts_col, "v")
    rows = df.select(
        *group_cols,
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias(ts_col),
        value_int.cast("long").alias("v"))
    stepped = rows.select(
        *group_cols, "v",
        (F.lead(ts_col).over(w) - F.col(ts_col)).alias("held_us"))
    return (stepped.where(F.col("held_us").isNotNull())
            .groupBy(*group_cols)
            .agg((F.count(F.lit(1)) + 1).cast("long").alias("n_samples"),
                 F.sum("held_us").cast("long").alias("span_us"),
                 F.expr("sum(cast(v as decimal(38,0)) * held_us) "
                        "div sum(cast(held_us as decimal(38,0)))")
                 .cast("long").alias("twap")))


def relational_division(df: DataFrame, key_col: str, attr_col: str,
                        divisor: DataFrame) -> DataFrame:
    """Relational division (Codd's ÷ — the "FOR ALL" operator): the
    keys whose attribute set covers EVERY row of ``divisor`` — users
    active on all days of a launch week, hosts linking to every page
    of a hub set, mirrors carrying the full file list.

    Double-negation form (the textbook plan, and the scale-correct
    one): required = keys × divisor (divisor is a BOUNDED dim —
    broadcast); missing = required ∖ observed (left-anti on the
    uniform key+attr); answer = keys ∖ missing.  Nothing fact-sized
    is ever nested-looped; the oracle uses the genuinely different
    NOT EXISTS(… NOT EXISTS …) form.

    Returns the qualifying ``(key)`` rows.

    Reference analog: none — engine extension (SURVEY §2.10 E129).
    """
    keys = df.select(F.col(key_col).alias("k")).distinct()
    d = F.broadcast(divisor.select(F.col(divisor.columns[0])
                                   .alias("a")).distinct())
    required = keys.crossJoin(d)
    observed = df.select(F.col(key_col).alias("k"),
                         F.col(attr_col).alias("a")).distinct()
    missing = required.join(observed, ["k", "a"], "left_anti")
    return (keys.join(missing.select("k").distinct(), "k", "left_anti")
            .select(F.col("k").alias(key_col)))


QD_B = 16                       # q-digest universe bits: [0, 2^16)
QD_K = 256                      # compression: merge threshold n div k


def _qd_compress(state: DataFrame, b: int = QD_B) -> DataFrame:
    """Bottom-up q-digest compression fold over a mixed-level node
    table ``(g, level, b, c, thr)`` — the shared kernel of
    :func:`qdigest_build` (all input at level 0) and
    :func:`qdigest_merge` (summed nodes at any level).

    Batch merge rule, applied level 0 → b−1: the two children of a
    parent combine (with any count already carried at the parent's
    level) iff their summed count ≤ thr; otherwise both children are
    FINAL sketch nodes.  Whatever survives to level ``b`` (the root)
    is final.  Deterministic — no randomness, no floats — so the
    DuckDB oracle replays it stage-for-stage as unrolled MATERIALIZED
    CTEs (the graph_stress discipline).

    Shape at scale: every round is a (g, parent)-key hash agg + a
    dim join over the NODE table, which round 0 already reduced to
    ≤ min(n, 2^b) rows per group; rounds are localCheckpointed (the
    ktruss discipline) so the final union of per-level keeps re-reads
    each round's result instead of re-deriving the whole cascade per
    branch.  Only the level-0 histogram build (in the callers)
    touches fact-sized data."""
    cur = (state.filter(F.col("level") == 0)
           .groupBy("g", "b")
           .agg(F.sum("c").alias("c"), F.max("thr").alias("thr"))
           .localCheckpoint())
    keeps = []
    for lvl in range(b):
        curp = cur.withColumn("p", F.expr("b div 2"))
        dec = (curp.groupBy("g", "p")
               .agg(F.sum("c").alias("ct"), F.max("thr").alias("thr")))
        keeps.append(
            curp.join(dec.filter(F.col("ct") > F.col("thr"))
                      .select("g", "p"), ["g", "p"])
            .select("g", F.lit(lvl).cast("int").alias("level"),
                    "b", "c", "thr"))
        up = (dec.filter(F.col("ct") <= F.col("thr"))
              .select("g", F.col("p").alias("b"),
                      F.col("ct").alias("c"), "thr"))
        inject = (state.filter(F.col("level") == lvl + 1)
                  .select("g", "b", "c", "thr"))
        cur = (up.unionByName(inject).groupBy("g", "b")
               .agg(F.sum("c").alias("c"), F.max("thr").alias("thr"))
               .localCheckpoint())
    out = cur.select("g", F.lit(b).cast("int").alias("level"), "b", "c")
    for kdf in keeps:
        out = out.unionByName(kdf.drop("thr"))
    return out


def qdigest_build(df: DataFrame, group_col: str, value_int,
                  k: int = QD_K, b: int = QD_B) -> DataFrame:
    """Per-group q-digest (Shrivastava et al., SenSys'04) over the
    integer expression ``value_int`` clamped to [0, 2^b) — the
    MERGEABLE quantile sketch completing the sketch family next to
    HLL (distinct), KMV (overlap), CMS (frequency) and AMS (F2):
    bounded state per group (O(k·log U) dyadic nodes) however many
    rows feed it, sketches for disjoint slices sum-and-recompress
    into the sketch of the union (:func:`qdigest_merge` — the same
    hourly→daily rollup the HLL register table gets), and any
    quantile reads off the node table with rank error ≤ b·⌊n/k⌋
    (each of the ≤ b stored strict ancestors of the answer leaf
    hides ≤ ⌊n/k⌋ mass — the paper's bound, pinned in tests).

    Where the EXACT tiers stay preferable the exact tiers exist
    (:func:`exact_quantiles` for range-bounded values,
    :func:`exact_quantiles_unbounded` for 64-bit domains); q-digest
    is the answer when quantile STATE must be stored per
    group×window and rolled up later — a 10^6-hosts × hourly latency
    dashboard cannot keep per-window histograms, but 3k·b longs per
    window it can.

    Build = one fact-sized (g, value) hash agg (map-side partials
    absorb repeats — the exact_quantiles scan), then the dim-sized
    compression fold (:func:`_qd_compress`).  thr = ⌊n/k⌋ per group;
    groups with n < k get thr 0 = no compression = exact leaf
    histogram (pinned: sketch ≡ exact there).

    Returns the node table ``(g, level, b, c)``: node (level, b)
    covers values [b·2^level, (b+1)·2^level).

    Reference analog: none — engine extension (SURVEY §2.10 E132).
    """
    lim = (1 << b) - 1
    v = F.greatest(F.least(value_int.cast("long"), F.lit(lim)),
                   F.lit(0))
    leaf = (df.groupBy(F.col(group_col).alias("g"), v.alias("b"))
            .agg(F.count("*").cast("long").alias("c")))
    leaf = (leaf
            .withColumn("__n", F.sum("c").over(Window.partitionBy("g")))
            .withColumn("thr", F.expr(f"__n div {k}")).drop("__n")
            .withColumn("level", F.lit(0).cast("int")))
    return _qd_compress(leaf, b)


def qdigest_merge(sketch: DataFrame, k: int = QD_K,
                  b: int = QD_B) -> DataFrame:
    """Merge q-digest sketches: ``sketch`` is a union of node tables
    whose ``g`` is already relabeled to the TARGET group (e.g. hourly
    sketches with g rewritten host→host after dropping the hour).
    Same-node counts sum, thr recomputes from the merged total
    (counts are conserved by construction, so Σc IS the merged n),
    and the same compression fold squeezes the union back to sketch
    size — the q-digest merge is exactly build's fold applied to
    mixed-level input.  Error bounds add: merging sketches of error
    ε₁, ε₂ yields ≤ ε₁+ε₂ (pinned against the band in tests)."""
    u = (sketch
         .withColumn("__n", F.sum("c").over(Window.partitionBy("g")))
         .withColumn("thr", F.expr(f"__n div {k}")).drop("__n"))
    return _qd_compress(u, b)


def qdigest_quantiles(sketch: DataFrame, group_col: str = "g",
                      qs: tuple[int, ...] = (50, 95, 99)) -> DataFrame:
    """Read quantiles off a q-digest node table: nodes sort by
    (interval upper end, level asc — deeper first at ties), counts
    cumulative-sum in that order, and the q-quantile estimate is the
    upper end of the first node whose running count reaches
    ⌈q·n/100⌉ — the same discrete lower-quantile rank rule as the
    exact tiers, so in the thr=0 regime the two agree bit-for-bit.
    One per-group window over the dim-sized node table.

    Returns ``(group_col, n_rows, n_nodes, p<q>_est...)``."""
    s = sketch.withColumn(
        "hi", F.expr("(b + 1) * cast(shiftleft(1, level) as bigint) - 1"))
    wg = Window.partitionBy("g")
    w = (Window.partitionBy("g").orderBy("hi", "level")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (s.withColumn("cum", F.sum("c").over(w))
           .withColumn("n", F.sum("c").over(wg)))
    aggs = [F.max("n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_nodes")]
    for q in qs:
        k_rank = F.expr(f"({q} * n + 99) div 100")
        aggs.append(F.min(F.when(F.col("cum") >= k_rank, F.col("hi")))
                    .cast("long").alias(f"p{q}_est"))
    return cum.groupBy(F.col("g").alias(group_col)).agg(*aggs)


def decay_scores(df: DataFrame, group_col: str, ts_col: str = "ts",
                 half_life_hours: int = 24,
                 horizon_halvings: int = 7) -> DataFrame:
    """Half-life-decayed activity mass per group in EXACT integers —
    the freshness-weighted reputation/recency score (recrawl
    prioritization, source liveliness, trending hosts) that usually
    gets written as Σ e^(−λ·age) and then drifts between engines.
    Here decay is quantized to DISCRETE HALVINGS: an event k
    half-lives old contributes 2^(H−k) quanta (H = the horizon in
    halvings; older events contribute 0 — below one quantum), so a
    fresh event is worth 2^H quanta and the score is a plain 64-bit
    integer sum any engine reproduces bit-for-bit.  The step
    approximation brackets the smooth exponential within a factor of
    2 per event — the ordering a scheduler consumes is preserved
    wherever gaps exceed one half-life, and the MERGE property is
    exact (scores for disjoint slices add, like every sketch here).

    The decay anchor is the data's own max event hour (deterministic
    — no wall clock in the plan); ``age = anchor_hour − event_hour``
    in integer hours.  One fact-sized scan + one group-key hash agg
    with map-side partials; the 1-row anchor dim enters by broadcast
    cross join (the AMS/total-dim shape).

    → ``(group_col, n_events, n_live, decayed_q)`` — decayed_q in
    quanta of 2^−H fresh-event units.

    Reference analog: none — engine extension (SURVEY §2.10 E138).
    """
    hr = F.expr(f"unix_timestamp({ts_col}) div 3600")
    e = df.select(F.col(group_col).alias("g"), hr.alias("hr"))
    anchor = e.agg(F.max("hr").alias("ah"))
    h = int(horizon_halvings)
    k = F.expr(f"(ah - hr) div {int(half_life_hours)}")
    live = k <= h
    w = F.expr(f"shiftleft(cast(1 as bigint), "
               f"cast({h} - (ah - hr) div {int(half_life_hours)} "
               f"as int))")
    return (e.crossJoin(F.broadcast(anchor))
            .groupBy(F.col("g").alias(group_col))
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.sum(live.cast("long")).cast("long").alias("n_live"),
                 F.sum(F.when(live, w).otherwise(F.lit(0)))
                 .cast("long").alias("decayed_q")))


HOLT_S = 8                       # fixed-point shift: units of 1/256
_HOLT_B = 1 << 40                # bias making every div operand ≥ 0


def holt_forecast(df: DataFrame, group: str, ts: str = "ts") -> DataFrame:
    """One-step-ahead hourly forecast per group by Holt's linear
    (double-exponential) smoothing — the capacity-planning twin of
    :func:`trailing_anomaly` (that one flags deviations; this one
    predicts the next hour's load a scheduler provisions against) —
    in EXACT fixed-point integers: smoothing constants are DYADIC
    (α=1/2, β=1/4) so every update is an integer add + a floor
    halving, state lives in units of 2^−8 events, and both engines
    reproduce the trajectory bit-for-bit.

    Recurrence over the group's observed hours (x in 2^−8 units):
    ``l ← ⌊(x + l + t)/2⌋``; ``t ← t + ⌊(l_new − l − t)/4⌋``; init
    l=x₀, t=0.  Negative-operand floor division differs between
    engines (Spark ``div`` truncates toward zero, DuckDB ``//``
    floors), so every division goes through the BIAS trick:
    ``⌊a/d⌋ = (a + B) div d − B/d`` with B = 2^40 ≫ |a| — operands
    stay positive, where truncation ≡ floor in both engines.

    Physical shape: hourly counts = one fact-sized hash agg; the fold
    is ONE JVM higher-order aggregate per group over its
    sort_array-fixed hour sequence (the aimd_trajectory shape — no
    per-hour shuffle, no Python); per-hour rows restore by slicing
    the state array against the shifted observation array.

    → ``(group, hr, n_events, forecast_q, abs_err_q)`` for every
    observed hour after the first; forecast_q = level+trend BEFORE
    seeing that hour, in 2^−8-event units; abs_err_q likewise.

    Reference analog: none — engine extension (SURVEY §2.10 E141).
    """
    s, b = HOLT_S, _HOLT_B
    hourly = (df.select(F.col(group).alias("g"),
                        F.expr(f"unix_timestamp({ts}) div 3600")
                        .alias("hr"))
              .groupBy("g", "hr")
              .agg(F.count(F.lit(1)).cast("long").alias("x")))
    per = (hourly.groupBy("g")
           .agg(F.sort_array(F.collect_list(F.struct(
               F.col("hr").alias("h"),
               F.col("x").alias("x")))).alias("obs")))
    lnew = (f"((o.x * {1 << s} + element_at(acc, -1).l "
            f"+ element_at(acc, -1).t + {b}) div 2 - {b // 2})")
    tnew = (f"(element_at(acc, -1).t + (({lnew} "
            f"- element_at(acc, -1).l - element_at(acc, -1).t "
            f"+ {b}) div 4 - {b // 4}))")
    fold = F.expr(
        f"aggregate(slice(obs, 2, size(obs) - 1), "
        f"array(named_struct('l', element_at(obs, 1).x * "
        f"cast({1 << s} as bigint), 't', cast(0 as bigint))), "
        f"(acc, o) -> concat(acc, array(named_struct("
        f"'l', {lnew}, 't', {tnew}))))")
    rows = (per.filter(F.size("obs") >= 2)
            .select("g", F.col("obs").alias("obs"), fold.alias("st"))
            .select("g", F.posexplode(F.arrays_zip(
                F.expr("slice(obs, 2, size(obs) - 1)").alias("o"),
                F.expr("slice(st, 1, size(st) - 1)").alias("p")))))
    fc = F.expr("col.p.l + col.p.t")
    return rows.select(
        F.col("g").alias(group),
        F.col("col.o.h").alias("hr"),
        F.col("col.o.x").cast("long").alias("n_events"),
        fc.cast("long").alias("forecast_q"),
        F.abs(F.expr(f"col.o.x * {1 << s}") - fc).cast("long")
        .alias("abs_err_q"))


def cusum_alarms(df: DataFrame, group: str, ts: str = "ts",
                 allowance_bp: int = 1000,
                 threshold_x: int = 1,
                 target_per_hour: int | None = None) -> DataFrame:
    """Upward change-point detection per group by a one-sided CUSUM
    control chart (Page, Biometrika 1954) over hourly counts — the
    drift detector that catches a SUSTAINED small rate shift long
    before the per-hour z-test (:func:`trailing_anomaly`) fires: the
    z-test needs one big hour, CUSUM accumulates many slightly-high
    hours (both monitors belong on a crawl/ingest pipeline; pinned:
    a +30% sustained shift alarms CUSUM while never crossing 3σ).

    Exact integer algebra: with n observed hours and T total events
    (mean = T/n stays a RATIONAL — never computed), every quantity is
    scaled by n: ``S_h = max(0, S_{h−1} + n·x_h − T − A)`` where the
    allowance ``A = T·allowance_bp/10⁴`` (slack absorbing noise) and
    the alarm fires while ``S_h > threshold_x·T`` (accumulated excess
    beyond slack exceeding ``threshold_x`` mean-hours).  With an
    explicit ``target_per_hour`` μ₀ (the textbook in-control target —
    monitoring against a KNOWN rate a long shift cannot drag upward),
    scaling drops to n=1: ``S = max(0, S + x − μ₀ − A)``.  Integer
    division appears only in A (of non-negative T) — engine-safe.

    Fold shape = the aimd/holt discipline: one fact-sized hourly agg,
    one group-key collect with sort_array, ONE JVM higher-order
    aggregate per group, posexplode back to rows.  The (n, T, A) dim
    is a per-group constant carried on the row.

    → ``(group, hr, n_events, s_scaled, alarm)``.

    Reference analog: none — engine extension (SURVEY §2.10 E143).
    """
    hourly = (df.select(F.col(group).alias("g"),
                        F.expr(f"unix_timestamp({ts}) div 3600")
                        .alias("hr"))
              .groupBy("g", "hr")
              .agg(F.count(F.lit(1)).cast("long").alias("x")))
    per = (hourly.groupBy("g")
           .agg(F.sort_array(F.collect_list(F.struct(
                F.col("hr").alias("h"),
                F.col("x").alias("x")))).alias("obs"),
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("x").cast("long").alias("t")))
    if target_per_hour is not None:
        per = (per.withColumn("n", F.lit(1).cast("long"))
               .withColumn("t", F.lit(int(target_per_hour))
                           .cast("long")))
    per = per.withColumn(
        "a", F.expr(f"t * {int(allowance_bp)} div 10000"))
    step = "greatest(element_at(acc, -1) + n * o.x - t - a, 0L)"
    fold = F.expr(
        f"slice(aggregate(obs, array(cast(0 as bigint)), "
        f"(acc, o) -> concat(acc, array({step}))), 2, size(obs))")
    rows = (per.select("g", "n", "t", F.col("obs").alias("obs"),
                       fold.alias("s"))
            .select("g", "t", F.posexplode(F.arrays_zip(
                F.col("obs").alias("o"), F.col("s").alias("s")))))
    return rows.select(
        F.col("g").alias(group),
        F.col("col.o.h").alias("hr"),
        F.col("col.o.x").cast("long").alias("n_events"),
        F.col("col.s").cast("long").alias("s_scaled"),
        (F.col("col.s") > F.col("t") * int(threshold_x))
        .cast("int").alias("alarm"))


def interarrival_regularity(df: DataFrame, client_col: str,
                            ts_sec_col: str, tie_col: str,
                            min_gaps: int = 5,
                            cv2_bp: int = 100,
                            modal_num: int = 3,
                            modal_den: int = 4) -> DataFrame:
    """Automated-client (bot/crawler) detection from request timing —
    the server-side mirror of this engine's own politeness scheduler:
    a crawler that fetches on a fixed cadence (wave_period, crawl-
    delay buckets) leaves a metronome signature in the access log
    that human traffic never does.  Two exact-integer regularity
    tests over a client's inter-arrival gaps, either sufficient:

    * **Coefficient of variation**: with n gaps summing to S and
      squared-summing to Q, ``cv² = var/mean² = (n·Q − S²)/S²`` (the
      n² scale factors of variance and squared mean cancel); the
      client is regular when ``cv² < cv2_bp/10⁴`` — tested as the
      cross-multiplied integer inequality ``10⁴·(n·Q − S²) <
      cv2_bp·S²`` (no division, no floats; n·Q−S² ≥ 0 by
      Cauchy-Schwarz).
    * **Modal-gap share**: a scheduler emitting on an exact grid
      repeats ONE gap; fire when ``modal_den·modal_cnt ≥
      modal_num·n`` (default ≥3/4 of gaps identical) — catches
      integer-period bots whose cv is inflated by a few long pauses.

    Both verdicts are integer comparisons, bit-equal in any engine;
    sub-``min_gaps`` clients are never flagged (too little evidence).

    Shape at 10^10 log rows: ONE shuffle on client (the lag window),
    then a (client, gap) hash agg whose map-side partials absorb the
    very repetition that makes a bot a bot, then a per-client agg —
    modal gap via ``max(struct(cnt, −gap))`` (ties → smallest gap,
    deterministic).  All JVM codegen, no Python in the plan.

    → ``(client, n_gaps, sum_gap, var_num, modal_gap, modal_cnt,
    is_bot)`` with ``var_num = n·Q − S²`` (the n²-scaled variance
    numerator, exact).

    Reference analog: none — engine extension (SURVEY §2.10 E148);
    the politeness scheduler it detects is operators/politeness.py.
    """
    w = Window.partitionBy("client").orderBy("t", "tie")
    gaps = (df.select(F.col(client_col).alias("client"),
                      F.col(ts_sec_col).cast("long").alias("t"),
                      F.col(tie_col).alias("tie"))
            .select("client",
                    (F.col("t") - F.lag("t").over(w)).alias("gap"))
            .where(F.col("gap").isNotNull()))
    hist = (gaps.groupBy("client", "gap")
            .agg(F.count(F.lit(1)).cast("long").alias("c")))
    per = (hist.groupBy("client")
           .agg(F.sum("c").cast("long").alias("n_gaps"),
                F.sum(F.col("gap") * F.col("c")).cast("long")
                .alias("sum_gap"),
                F.sum(F.col("gap") * F.col("gap") * F.col("c"))
                .cast("long").alias("qq"),
                F.max(F.struct(F.col("c").alias("c"),
                               (-F.col("gap")).alias("ng")))
                .alias("m")))
    var_num = (F.col("n_gaps") * F.col("qq")
               - F.col("sum_gap") * F.col("sum_gap"))
    cv_hit = (F.lit(10_000) * F.col("var_num")
              < F.lit(int(cv2_bp)) * F.col("sum_gap")
              * F.col("sum_gap"))
    modal_hit = (F.lit(int(modal_den)) * F.col("modal_cnt")
                 >= F.lit(int(modal_num)) * F.col("n_gaps"))
    return (per.select(
        "client", "n_gaps", "sum_gap",
        var_num.cast("long").alias("var_num"),
        (-F.col("m.ng")).cast("long").alias("modal_gap"),
        F.col("m.c").cast("long").alias("modal_cnt"))
        .withColumn("is_bot",
                    (F.col("n_gaps") >= int(min_gaps))
                    & (cv_hit | modal_hit)))


def slo_burn_alerts(df: DataFrame, group: str, error_pred,
                    ts: str = "ts", slo_ppm: int = 200_000,
                    short_h: int = 1, long_h: int = 6) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the Google SRE-workbook
    mechanism, E154) over a fetch/error stream: a page fires only
    when the error fraction exceeds the SLO in BOTH a short window
    (still burning now — fast reset once the incident ends) and a
    long window (sustained enough to matter — no one-bad-minute
    pages).  The alerting layer the crawl fleet's error budget needs
    on top of the z-test (spike), CUSUM (drift) and AIMD (reaction)
    monitors: those detect change, this pages on BUDGET.

    Exact integers: per (group, hour) totals, trailing sums by
    RANGE windows over the hour index (range, not rows — absent
    hours count as zero, which row-frames silently get wrong on
    sparse streams), and ``burn_ppm = 10⁶·errs div total`` compared
    against ``slo_ppm`` — no floats anywhere.

    Shape: one (group, hr) hash agg over the raw stream, then two
    range windows riding ONE shuffle on group (hour rows per group,
    bounded by elapsed time, not traffic).

    → ``(group, hr, n_events, n_errors, burn_short_ppm,
    burn_long_ppm, alert)``.

    Reference analog: none — engine extension (SURVEY §2.10 E154).
    """
    hourly = (df.select(F.col(group).alias("g"),
                        F.expr(f"unix_timestamp({ts}) div 3600")
                        .alias("hr"),
                        error_pred.cast("int").alias("e"))
              .groupBy("g", "hr")
              .agg(F.count(F.lit(1)).cast("long").alias("n"),
                   F.sum("e").cast("long").alias("errs")))
    ws = (Window.partitionBy("g").orderBy("hr")
          .rangeBetween(-(int(short_h) - 1), 0))
    wl = (Window.partitionBy("g").orderBy("hr")
          .rangeBetween(-(int(long_h) - 1), 0))
    out = (hourly
           .withColumn("ns", F.sum("n").over(ws))
           .withColumn("es", F.sum("errs").over(ws))
           .withColumn("nl", F.sum("n").over(wl))
           .withColumn("el", F.sum("errs").over(wl)))
    return out.select(
        F.col("g").alias(group), "hr",
        F.col("n").alias("n_events"),
        F.col("errs").alias("n_errors"),
        F.expr("1000000 * es div ns").alias("burn_short_ppm"),
        F.expr("1000000 * el div nl").alias("burn_long_ppm"),
        ((F.expr("1000000 * es") > F.expr(f"{int(slo_ppm)} * ns"))
         & (F.expr("1000000 * el") > F.expr(f"{int(slo_ppm)} * nl")))
        .alias("alert"))


def calibration_curve(scored: DataFrame, labels: DataFrame,
                      thresholds: tuple[int, ...],
                      id_col: str = "doc_id",
                      score_col: str = "score",
                      label_col: str = "label") -> DataFrame:
    """Threshold-sweep classifier calibration (E161) — the filter-
    design question every curation pipeline faces: does the CHEAP
    score (one codegen'd projection) predict the EXPENSIVE verdict
    (a battery of gates, a teacher model, a human label) well enough
    to run first and at what cutoff?  Per candidate threshold, the
    full confusion matrix and the three operating-point metrics in
    exact ppm — F1 via the division-free identity ``f1 = 2·tp /
    (2·tp + fp + fn)`` (no intermediate precision/recall rationals).

    Precision is NULL at thresholds where nothing is predicted
    positive (0/0 is a vacuous operating point, not a zero).

    Shape: ONE id join of the two relations, a |thresholds|-way
    literal explode, one hash agg keyed by threshold — the sweep
    costs one scan however many cutoffs are priced.

    → ``(threshold, tp, fp, fn, tn, precision_ppm, recall_ppm,
    f1_ppm)``.

    Reference analog: none — engine extension (SURVEY §2.10 E161).
    """
    j = (scored.select(F.col(id_col).alias("id"),
                       F.col(score_col).alias("score"))
         .join(labels.select(F.col(id_col).alias("id"),
                             F.col(label_col).alias("label")), "id"))
    ex = (j.select(
        F.explode(F.array(*[F.lit(int(t)) for t in thresholds]))
        .alias("threshold"), "score", "label")
        .withColumn("pred", F.col("score") >= F.col("threshold")))
    c = lambda cond: F.sum(cond.cast("int")).cast("long")
    agg = (ex.groupBy("threshold")
           .agg(c(F.col("pred") & F.col("label")).alias("tp"),
                c(F.col("pred") & ~F.col("label")).alias("fp"),
                c(~F.col("pred") & F.col("label")).alias("fn"),
                c(~F.col("pred") & ~F.col("label")).alias("tn")))
    return agg.select(
        "threshold", "tp", "fp", "fn", "tn",
        F.expr("CASE WHEN tp + fp > 0 "
               "THEN 1000000 * tp div (tp + fp) END")
        .alias("precision_ppm"),
        F.expr("CASE WHEN tp + fn > 0 "
               "THEN 1000000 * tp div (tp + fn) END")
        .alias("recall_ppm"),
        F.expr("CASE WHEN 2 * tp + fp + fn > 0 "
               "THEN 2000000 * tp div (2 * tp + fp + fn) END")
        .alias("f1_ppm"))


def attribution_credits(events: DataFrame,
                        touch_types: tuple[str, ...] = ("view", "click"),
                        conv_type: str = "purchase",
                        lookback_hours: int = 168) -> DataFrame:
    """Multi-touch attribution (E178) — the event-pipeline classic:
    split each conversion's value across the marketing touches that
    preceded it, under the four standard models at once (first-touch,
    last-touch, linear, U-shaped 40/20/40).  All credit arithmetic is
    exact integer cents with DOCUMENTED remainder routing, so the
    per-conversion credits sum to the conversion value to the cent
    under every model::

        journey  = same-user touches with conv_ts−lookback < ts ≤ conv_ts,
                   ordered by (ts, event_id), ordinal i of n
        linear   = V div n each, + V mod n to the LAST touch
        u-shape  : n=1 → V; n=2 → (V div 2, V − V div 2);
                   n≥3 → first (2V) div 5, last (2V) div 5, the rest
                   R = V − first − last linear over the n−2 middles
                   with R mod (n−2) to the FINAL middle

    Physical shape: conversions ⋈ touches on the uniform user key
    (ONE shuffle; the lookback predicate bounds the fan-out to the
    window's touches), then ordinal + journey size from one window
    over the conversion key — partition = one journey, never the
    user's full history.  A conversion with NO touches in the window
    emits a single NULL-touch row carrying full credit under every
    model (the 'direct / unattributable' bucket real reports need).

    → one row per (conversion, touch): ``(conv_id, user_id, conv_c,
    touch_id, touch_type, i, n, first_c, last_c, linear_c,
    ushape_c)``.

    Reference analog: none — engine extension (events tier)."""
    from pyspark.sql import Window

    conv = events.filter(F.col("event_type") == conv_type).select(
        F.col("event_id").alias("conv_id"), "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("conv_us"),
        F.floor(F.col("value") * 100).cast("long").alias("conv_c"))
    touch = events.filter(F.col("event_type").isin(*touch_types)).select(
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.col("user_id").alias("t_user"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("touch_us"))
    lb = lookback_hours * 3600 * 1_000_000
    j = conv.join(
        touch, (F.col("user_id") == F.col("t_user"))
        & (F.col("touch_us") <= F.col("conv_us"))
        & (F.col("touch_us") > F.col("conv_us") - lb), "left") \
        .select("conv_id", "user_id", "conv_c",
                "touch_id", "touch_type", "touch_us")
    w = Window.partitionBy("conv_id")
    wo = w.orderBy("touch_us", "touch_id")
    j = (j.withColumn("i", F.when(F.col("touch_id").isNotNull(),
                                  F.row_number().over(wo)))
         .withColumn("n", F.sum(F.when(F.col("touch_id").isNotNull(), 1)
                                .otherwise(0)).over(w)))
    v, i, n = F.col("conv_c"), F.col("i"), F.col("n")
    first_c = F.when(n == 0, v).when(i == 1, v).otherwise(F.lit(0))
    last_c = F.when(n == 0, v).when(i == n, v).otherwise(F.lit(0))
    linear_c = F.when(n == 0, v).otherwise(
        F.expr("conv_c div n")
        + F.when(i == n, F.expr("conv_c % n")).otherwise(F.lit(0)))
    head = F.expr("(2 * conv_c) div 5")
    # mass left for the n−2 middles, split by integer div; remainder
    # routed to the FINAL middle (i = n−1)
    mid_each = F.expr(
        "(conv_c - 2 * ((2 * conv_c) div 5)) div (n - 2)")
    mid_rem = F.expr(
        "(conv_c - 2 * ((2 * conv_c) div 5)) % (n - 2)")
    ushape_c = (
        F.when(n == 0, v)
        .when(n == 1, v)
        .when(n == 2, F.when(i == 1, F.expr("conv_c div 2"))
              .otherwise(v - F.expr("conv_c div 2")))
        .when(i == 1, head)
        .when(i == n, head)
        .otherwise(mid_each
                   + F.when(i == n - 1, mid_rem).otherwise(F.lit(0))))
    return j.select(
        "conv_id", "user_id", "conv_c", "touch_id", "touch_type",
        i.cast("long").alias("i"), n.cast("long").alias("n"),
        first_c.cast("long").alias("first_c"),
        last_c.cast("long").alias("last_c"),
        linear_c.cast("long").alias("linear_c"),
        ushape_c.cast("long").alias("ushape_c"))


def transition_matrix(events: DataFrame, key_col: str = "user_id",
                      state_col: str = "event_type",
                      ts_col: str = "ts") -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences (E181) — the sequence-mining primitive behind
    next-action prediction, funnel-free journey analysis, and the
    bot-behavior fingerprint (a scripted client's transition rows are
    near-deterministic where organic traffic is mixed; the sequence
    complement to E130's timing regularity).  Per (from, to) state
    pair: exact transition count and the row-conditional probability
    in ppm (share of all transitions LEAVING `from`), plus the
    self-loop marker.

    Physical shape: ONE key-partitioned window (lead over (ts,
    event_id) — the same single shuffle sessionize pays; partitions
    are one user's events, never the global stream) then one hash agg
    to ≤|states|² rows; the share window runs on that bounded dim.
    Ordering ties are impossible by construction (event_id is
    unique and last in the sort key).

    → ``(from_type, to_type, n, share_ppm, is_self)``.

    Reference analog: none — engine extension (events tier)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, "event_id")
    pairs = (events.select(key_col, "event_id", ts_col,
                           F.col(state_col).alias("from_type"))
             .withColumn("to_type", F.lead("from_type").over(w))
             .filter(F.col("to_type").isNotNull()))
    m = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    wr = Window.partitionBy("from_type")
    return (m.withColumn("row_total", F.sum("n").over(wr))
            .select("from_type", "to_type", "n",
                    F.expr("(1000000 * n) div row_total").cast("long")
                    .alias("share_ppm"),
                    (F.col("from_type") == F.col("to_type"))
                    .alias("is_self")))


def roc_auc(scored: DataFrame, group_col: str | None,
            score_int, label_col) -> DataFrame:
    """Exact tie-corrected ROC-AUC per group — the threshold-free
    companion to :func:`calibration_curve`: across ALL cutoffs at
    once, what is the probability the cheap score ranks a true
    positive above a true negative (ties counting ½)?  The scalar
    that decides whether a filter score is worth sweeping thresholds
    over at all.

    No pair enumeration: AUC is the Mann-Whitney statistic, so with
    R₁ = Σ(average ranks of positives), AUC = (R₁ − n₁(n₁+1)/2) /
    (n₁n₀) — one ranking replaces the n₁×n₀ comparison join.
    Average ranks of a tie class are half-integers, so everything is
    carried at 2× scale: a class of ``n`` rows after ``c`` earlier
    rows has rank2 = 2c + n + 1, and auc_ppm = (Σ np·rank2 −
    n₁(n₁+1))·10⁶ div (2n₁n₀) — exact integer end-to-end
    (decimal(38,0) products; n₁·2n fits with room at 10^10 rows).
    NULL where a group lacks both classes (AUC undefined, not 0).

    Scale shape: one hash agg collapses the rows to (group, score)
    CLASSES — ``score_int`` must be a bounded-precision integer
    (milli-quality, ppm-score: the same value-boundedness
    :func:`exact_quantiles` relies on), so the per-group cumulative
    window runs over ≤|score domain| rows, never the raw corpus; one
    final per-group fold.  Rows never sort globally.

    → ``(group?, n_pos, n_neg, n_score_classes, auc_ppm)``.

    Reference analog: none — engine extension (SURVEY §2.10 E184).
    """
    g = [group_col] if group_col else []
    cls = (scored.select(*g, score_int.alias("s"),
                         F.col(label_col).cast("boolean").alias("y"))
           .groupBy(*g, "s")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("y").cast("long")).alias("np")))
    w = (Window.partitionBy(*g).orderBy("s")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ranked = cls.withColumn(
        "rank2", 2 * (F.sum("n").over(w) - F.col("n"))
        + F.col("n") + 1)
    m = (ranked.groupBy(*g)
         .agg(F.sum("np").cast("long").alias("n_pos"),
              F.sum(F.col("n") - F.col("np")).cast("long")
              .alias("n_neg"),
              F.count(F.lit(1)).cast("long").alias("n_score_classes"),
              F.sum(F.expr("cast(np as decimal(38,0)) * rank2"))
              .alias("r2p")))
    return m.select(
        *g, "n_pos", "n_neg", "n_score_classes",
        F.expr(
            "CASE WHEN n_pos > 0 AND n_neg > 0 THEN cast("
            "(r2p - cast(n_pos as decimal(38,0)) * (n_pos + 1)) "
            "* 1000000 div (2 * cast(n_pos as decimal(38,0)) * n_neg) "
            "as bigint) END").alias("auc_ppm"))


def dfa_conformance(events: DataFrame, allowed: DataFrame,
                    key_col: str = "user_id", ts_col: str = "ts",
                    state_col: str = "event_type",
                    start_state: str = "START") -> DataFrame:
    """Process-model conformance audit (E188) — the control-flow
    complement to E181's learned transition matrix: given a DECLARED
    model (the ``allowed`` (from_state, to_state) whitelist, with
    ``start_state`` as the virtual source so the FIRST event is
    checked too), replay every key's event sequence and report where
    reality leaves the model — the process-mining primitive behind
    funnel-protocol QA, API-contract auditing, and bot detection
    (scripted clients violate human-flow models in characteristic
    places).

    Per key: transition count (first event included), violation
    count, the FIRST offending (from, to) pair in (ts, event_id)
    order (NULLs when conformant), and the conformant verdict.

    Physical shape: ONE key-partitioned lag window (the same single
    shuffle sessionize pays; ties impossible — event_id closes the
    sort), a BROADCAST left join against the model dim (bounded by
    |states|² by definition), one key hash agg, and a row_number
    window over the violation SUBSET only.  No collect, no global
    sort.

    → ``(key, n_steps, n_violations, first_bad_from, first_bad_to,
    conformant)``.

    Reference analog: none — engine extension (events tier)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, "event_id")
    seq = (events.select(key_col, "event_id", ts_col,
                         F.col(state_col).alias("to_state"))
           .withColumn("from_state",
                       F.coalesce(F.lag("to_state").over(w),
                                  F.lit(start_state))))
    model = (allowed.select(F.col("from_state").alias("__f"),
                            F.col("to_state").alias("__t"))
             .distinct().withColumn("__ok", F.lit(1)))
    j = (seq.join(F.broadcast(model),
                  (seq["from_state"] == model["__f"])
                  & (seq["to_state"] == model["__t"]), "left")
         .select(key_col, "event_id", ts_col, "from_state", "to_state",
                 F.col("__ok").isNull().alias("viol")))
    agg = j.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_steps"),
        F.sum(F.col("viol").cast("long")).cast("long")
        .alias("n_violations"))
    wv = Window.partitionBy(key_col).orderBy(ts_col, "event_id")
    first = (j.filter("viol")
             .withColumn("__rn", F.row_number().over(wv))
             .filter(F.col("__rn") == 1)
             .select(key_col, F.col("from_state").alias("first_bad_from"),
                     F.col("to_state").alias("first_bad_to")))
    return (agg.join(first, key_col, "left")
            .withColumn("conformant", F.col("n_violations") == 0))


def sequence_disorder(events: DataFrame, key_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Exact out-of-order audit per key (E191) — how scrambled is the
    stream between ARRIVAL order (the monotone ingest ``event_id``)
    and EVENT time?  The two numbers that size a streaming pipeline's
    watermark honestly: total Kendall disorder (inversion pairs —
    arrival says a-before-b, event time says b-before-a, strictly)
    and the worst lateness any watermark must absorb
    (``max over events of running-max(ts) − ts``).  E177's watermark
    audit prices a GIVEN delay; this measures the stream's intrinsic
    disorder so the delay can be chosen.

    Scale design: inversions are a pairwise property, but the
    quadratic pair join is only the ORACLE's job — here each key's
    (bounded) group is counted in O(n log n) with a Fenwick tree
    over dense event-time ranks inside one applyInPandas pass
    (ties share a rank, so equal timestamps are never inversions).
    One shuffle on the uniform key; group memory is O(group), the
    same bound sessionize already assumes.

    → ``(key, n_events, n_inversions, inv_ppm, max_lateness_us,
    in_order)`` where inv_ppm is inversions per possible pair
    (floor ppm, 0 when n < 2).

    Reference analog: none — engine extension (events tier)."""
    import numpy as np
    import pandas as pd

    out_schema = (f"{key_col} long, n_events long, n_inversions long, "
                  f"inv_ppm long, max_lateness_us long, in_order boolean")

    def _grp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id", kind="mergesort")
        ts = pdf["__us"].to_numpy(np.int64)
        n = len(ts)
        # dense ranks, ties collapsed (equal ts → same rank → no pair)
        ranks = np.searchsorted(np.unique(ts), ts) + 1
        m = int(ranks.max()) if n else 0
        bit = np.zeros(m + 1, dtype=np.int64)
        inv = 0
        for i, r in enumerate(ranks):
            # seen-so-far with rank <= r
            s, j = 0, int(r)
            while j > 0:
                s += bit[j]
                j -= j & (-j)
            inv += i - s
            j = int(r)
            while j <= m:
                bit[j] += 1
                j += j & (-j)
        run_max = np.maximum.accumulate(ts) if n else ts
        lateness = int((run_max - ts).max()) if n else 0
        pairs = n * (n - 1) // 2
        return pd.DataFrame({
            key_col: [pdf[key_col].iloc[0]],
            "n_events": [n],
            "n_inversions": [inv],
            "inv_ppm": [inv * 1_000_000 // pairs if pairs else 0],
            "max_lateness_us": [lateness],
            "in_order": [inv == 0],
        })

    prepped = events.select(
        key_col, "event_id",
        (F.unix_micros(F.col(ts_col).cast("timestamp")))
        .cast("long").alias("__us"))
    return prepped.groupBy(key_col).applyInPandas(_grp, out_schema)


CEP_INITIALS = {"view": "v", "click": "c", "purchase": "p",
                "signup": "s", "error": "e"}


def cep_pattern_match(events: DataFrame, pattern: str,
                      initials: dict | None = None,
                      key_col: str = "user_id",
                      type_col: str = "event_type",
                      ts_col: str = "ts") -> DataFrame:
    """Complex-event-processing pattern counts (E198) — the batch
    replay of SQL MATCH_RECOGNIZE / Flink CEP: encode each key's
    (ts, event_id)-ordered type sequence as a compact symbol string
    and count NON-OVERLAPPING regex matches of the declared pattern
    (e.g. ``vc+p`` = a view, one-or-more clicks, then a purchase —
    the engaged-conversion motif).  Regexes over the symbol string
    ARE the CEP pattern language: alternation, bounded repeats,
    optional steps all come free, and leftmost non-overlapping
    semantics match `regexp_extract_all` in both engines (Spark
    needs explicit group idx 0).

    Per key: sequence length, match count, the longest single match
    (greedy + within-symbol repeats), and whether the motif occurred
    at all.  E188 checks DECLARED single-step legality; this finds
    multi-step MOTIFS.

    Scale shape: one key agg building the symbol string via
    ``array_sort(collect_list(struct(ts, event_id, sym)))`` — exact
    order, no window pass — then codegen'd regexp projections.
    Group state is O(events-per-key), the bound every per-key
    sequence operator here shares.  Unknown event types map to ``x``
    (never matched by a pattern written over the known alphabet).

    → ``(key, n_events, n_matches, max_match_len, matched)``.
    """
    ini = initials if initials is not None else CEP_INITIALS
    sym = F.lit("x")
    for k, v in sorted(ini.items()):
        sym = F.when(F.col(type_col) == k, F.lit(v)).otherwise(sym)
    seq = (events
           .select(key_col, "event_id", F.col(ts_col).alias("__ts"),
                   sym.alias("__s"))
           .groupBy(key_col)
           .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                F.expr("array_join(transform(array_sort(collect_list("
                       "struct(__ts, event_id, __s))), r -> r.__s), '')")
                .alias("__str")))
    matches = F.expr(f"regexp_extract_all(__str, '{pattern}', 0)")
    return (seq.select(key_col, "n_events",
                       F.size(matches).cast("long").alias("n_matches"),
                       F.coalesce(
                           F.array_max(F.transform(
                               matches, lambda m: F.length(m))),
                           F.lit(0)).cast("long").alias("max_match_len"))
            .withColumn("matched", F.col("n_matches") > 0))


def abtest_chi2(events: DataFrame, variant, outcome,
                key_col: str = "user_id",
                sig_milli: int = 3841) -> DataFrame:
    """Two-proportion experiment readout (E207) — the 2×2 chi-square
    test in EXACT integer arithmetic: unit = key (deduped first, so
    heavy users don't vote repeatedly), variant = the assignment
    expression, outcome = the conversion predicate; the statistic is
    the classic

        χ² = N · (ad − bc)² / ((a+b)(c+d)(a+c)(b+d))

    carried as a decimal(38,0) numerator floored through the FIXED
    divisor chain (÷row margins, then column margins, in that order
    — sequential flooring IS the spec, ≤ 4 milli from the real
    value), so significance at α = 0.05 is the integer compare
    ``chi2_milli ≥ 3841`` (χ²₁,₀.₀₅ = 3.841) — no float, no p-value
    library, replayable anywhere.  Degenerate
    margins (an empty row or column) emit NULL chi2 and a false
    flag rather than a division by zero.

    → 1 row: (n_a, conv_a, n_b, conv_b, rate_a_ppm, rate_b_ppm,
    lift_ppm, chi2_milli, significant).

    Scale shape: one key agg (per-key variant + converted flags),
    one 1-row fold.  The variant expression must be deterministic
    per key (hash the key, not the event).
    """
    per_key = (events.select(F.col(key_col).alias("k"),
                             variant.alias("v"),
                             outcome.cast("int").alias("o"))
               .groupBy("k")
               .agg(F.max("v").alias("v"), F.max("o").alias("o")))
    cells = per_key.agg(
        F.sum(F.when(F.col("v") & (F.col("o") == 1), 1)
              .otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("v") & (F.col("o") == 0), 1)
              .otherwise(0)).cast("long").alias("b"),
        F.sum(F.when(~F.col("v") & (F.col("o") == 1), 1)
              .otherwise(0)).cast("long").alias("c"),
        F.sum(F.when(~F.col("v") & (F.col("o") == 0), 1)
              .otherwise(0)).cast("long").alias("d"))
    chi = ("CASE WHEN (a + b) > 0 AND (c + d) > 0 AND (a + c) > 0 "
           "AND (b + d) > 0 THEN CAST("
           "cast((a + b + c + d) as decimal(38,0)) * (a * d - b * c) "
           "* (a * d - b * c) * 1000 div (a + b) div (c + d) "
           "div (a + c) div (b + d) AS BIGINT) END")
    return (cells.select(
        (F.col("a") + F.col("b")).alias("n_a"),
        F.col("a").alias("conv_a"),
        (F.col("c") + F.col("d")).alias("n_b"),
        F.col("c").alias("conv_b"),
        F.expr("CASE WHEN a + b > 0 THEN a * 1000000 div (a + b) END")
        .cast("long").alias("rate_a_ppm"),
        F.expr("CASE WHEN c + d > 0 THEN c * 1000000 div (c + d) END")
        .cast("long").alias("rate_b_ppm"),
        F.expr(chi).alias("chi2_milli"))
        .withColumn("lift_ppm",
                    (F.col("rate_a_ppm") - F.col("rate_b_ppm"))
                    .cast("long"))
        .withColumn("significant",
                    F.coalesce(F.col("chi2_milli") >= sig_milli,
                               F.lit(False)))
        .select("n_a", "conv_a", "n_b", "conv_b", "rate_a_ppm",
                "rate_b_ppm", "lift_ppm", "chi2_milli", "significant"))


def activity_gaps(events: DataFrame, grain_s: int = 3600,
                  min_gap: int = 1,
                  ts_col: str = "ts") -> DataFrame:
    """Outage detection over an event stream (E209) — the SRE
    question a fetch/ingest pipeline answers from its own exhaust:
    which time windows saw NO events at all (collector down, queue
    stalled, crawler paused), and for how long?  The scale trick
    that makes a global-stream property shuffle-safe: the stream
    first collapses to DISTINCT ACTIVE BUCKETS at ``grain_s``
    (uniform-key agg — the corpus never meets a window), and gaps
    are lag deltas over that bucket dim, which is bounded by
    timespan/grain however many events exist.  A gap row is a
    maximal run of ≥ ``min_gap`` missing buckets strictly between
    two active ones (leading/trailing silence is unbounded — not an
    outage, just absence of data).

    → (gap_start_epoch, gap_end_epoch, n_missing, duration_s),
    epochs in seconds at bucket resolution.
    """
    if grain_s < 1 or min_gap < 1:
        raise ValueError("grain_s and min_gap must be >= 1")
    b = (events.select(
        (F.unix_micros(F.col(ts_col).cast("timestamp"))
         / F.lit(1_000_000)).cast("long").alias("__s"))
        .select(F.expr(f"__s div {grain_s}").alias("bucket"))
        .distinct())
    w = Window.orderBy("bucket")
    g = (b.withColumn("prev", F.lag("bucket").over(w))
         .filter(F.col("prev").isNotNull()
                 & (F.col("bucket") - F.col("prev") - 1
                    >= F.lit(min_gap))))
    return g.select(
        ((F.col("prev") + 1) * grain_s).cast("long")
        .alias("gap_start_epoch"),
        ((F.col("bucket") * grain_s) - 1).cast("long")
        .alias("gap_end_epoch"),
        (F.col("bucket") - F.col("prev") - 1).cast("long")
        .alias("n_missing"),
        ((F.col("bucket") - F.col("prev") - 1) * grain_s)
        .cast("long").alias("duration_s"))


RFM_CUT_QS = (20, 40, 60, 80)


def rfm_segments(events: DataFrame, key_col: str = "user_id",
                 ts_col: str = "ts", value_col: str = "value",
                 purchase_type: str = "purchase",
                 type_col: str = "event_type") -> DataFrame:
    """RFM segmentation (E211) — the classic
    recency/frequency/monetary customer scoring, built scale-safe:
    quintile scores come from EXACT corpus cutoffs (the
    exact_quantiles histogram machinery — value-range-bounded bins,
    never a global ntile sort of the user dim), and a user's score
    is 1 + the number of cutoffs strictly below their value (ties
    fall to the lower bucket; deterministic in both engines).

    Per user: recency = last-activity day (epoch days — higher =
    more recent = better), frequency = event count, monetary = Σ
    purchase value in floor cents.  Scores r/f/m ∈ 1..5; segment by
    the standard rulebook (first match wins): champion (r≥4∧f≥4∧m≥4)
    → loyal (f≥4) → big_spender (m≥4) → at_risk (r≤2∧f≥3) →
    hibernating (r≤2) → regular.

    → (key, last_day, n_events, cents, r_score, f_score, m_score,
    segment).

    Scale shape: one key agg, three 1-row cutoff dims (each from a
    value-histogram fold) broadcast back, codegen'd scoring.
    """
    per = (events.groupBy(F.col(key_col).alias("k"))
           .agg(F.expr(f"max(unix_micros(cast({ts_col} as timestamp)) "
                       f"div 1000000 div 86400)").cast("long")
                .alias("last_day"),
                F.count(F.lit(1)).cast("long").alias("n_events"),
                # per-EVENT cent flooring, then an integer sum — a
                # float sum's rounding is aggregation-order dependent
                F.sum(F.when(F.col(type_col) == purchase_type,
                             F.floor(F.col(value_col) * 100)
                             .cast("long")).otherwise(F.lit(0)))
                .cast("long").alias("cents"))
           .localCheckpoint())

    def cuts(col: str, names: tuple):
        qdf = exact_quantiles(per.withColumn("__g", F.lit(1)), "__g",
                              F.col(col), qs=RFM_CUT_QS)
        return F.broadcast(qdf.select(
            *[F.col(f"p{q}").alias(n)
              for q, n in zip(RFM_CUT_QS, names)]))

    rnames = tuple(f"rc{q}" for q in RFM_CUT_QS)
    fnames = tuple(f"fc{q}" for q in RFM_CUT_QS)
    mnames = tuple(f"mc{q}" for q in RFM_CUT_QS)
    j = (per.crossJoin(cuts("last_day", rnames))
         .crossJoin(cuts("n_events", fnames))
         .crossJoin(cuts("cents", mnames)))

    def score(col: str, names: tuple):
        s = F.lit(1)
        for n in names:
            s = s + (F.col(col) > F.col(n)).cast("int")
        return s.cast("int")

    seg = (F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4)
                  & (F.col("m_score") >= 4), F.lit("champion"))
           .when(F.col("f_score") >= 4, F.lit("loyal"))
           .when(F.col("m_score") >= 4, F.lit("big_spender"))
           .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3),
                 F.lit("at_risk"))
           .when(F.col("r_score") <= 2, F.lit("hibernating"))
           .otherwise(F.lit("regular")))
    return (j.withColumn("r_score", score("last_day", rnames))
            .withColumn("f_score", score("n_events", fnames))
            .withColumn("m_score", score("cents", mnames))
            .select(F.col("k").alias(key_col), "last_day", "n_events",
                    "cents", "r_score", "f_score", "m_score",
                    seg.alias("segment")))


def seasonal_profile(events: DataFrame, ts_col: str = "ts",
                     type_col: str = "event_type") -> DataFrame:
    """Hour-of-day seasonality profile per event type (E217) — the
    diurnal-cycle audit a crawl scheduler reads before placing
    recrawl waves and maintenance windows: for each (type, hour 0-23)
    the exact count, the seasonal index in floor ppm of the uniform
    expectation (1e6 = exactly average; >1e6 = rush hour), the
    type-level Herfindahl concentration of traffic across hours
    (uniform = 1e6/24 ≈ 41,666 ppm; a single-hour spike = 1e6), and
    peak/trough flags (ties break to the earliest hour).  Hours a
    type never fired in still appear with n = 0 — an index built
    only on observed hours overstates uniformity exactly where the
    signal matters.

    All-integer, engine-exact: index = ``n·24·10⁶ div total`` (fits
    BIGINT to 10^10 events/type-hour), HHI rides decimal(38,0)
    (``Σn²`` overflows BIGINT past ~3·10^9 events).

    Scale shape: one (type, hour)-key agg over the stream (uniform
    bounded keys: |types|·24), densified against the |types|×24 grid
    (both dims are aggregation outputs, bounded by construction),
    type totals broadcast back; the peak/trough window partitions
    are exactly 24 rows each.  No corpus-wide window, no driver math.

    → ``(type, hod, n, index_ppm, hhi_ppm, is_peak, is_trough)``.

    Reference analog: the reference logs queue length every 10 min
    (cmd/link-processor/main.go:210) but never profiles cadence;
    engine extension (SURVEY §2.10 E217).
    """
    spark = events.sparkSession
    cnt = (events.groupBy(F.col(type_col).alias("etype"),
                          F.hour(ts_col).alias("hod"))
           .agg(F.count(F.lit(1)).cast("long").alias("n")))
    hours = spark.range(24).select(F.col("id").cast("int")
                                   .alias("hod"))
    grid = (cnt.select("etype").distinct()
            .crossJoin(F.broadcast(hours)))
    full = (grid.join(cnt, ["etype", "hod"], "left")
            .select("etype", "hod",
                    F.coalesce("n", F.lit(0)).cast("long").alias("n")))
    tot = (full.groupBy("etype")
           .agg(F.sum("n").alias("t"),
                F.sum((F.col("n") * F.col("n"))
                      .cast("decimal(38,0)")).alias("s2")))
    w_peak = Window.partitionBy("etype").orderBy(F.desc("n"), "hod")
    w_trough = Window.partitionBy("etype").orderBy("n", "hod")
    return (full.join(F.broadcast(tot), "etype")
            .withColumn("is_peak", F.row_number().over(w_peak) == 1)
            .withColumn("is_trough",
                        F.row_number().over(w_trough) == 1)
            .select(F.col("etype").alias(type_col), "hod", "n",
                    F.expr("n * 24 * 1000000 div t").cast("long")
                    .alias("index_ppm"),
                    F.expr("CAST(s2 * 1000000 div (CAST(t AS "
                           "DECIMAL(38,0)) * t) AS BIGINT)")
                    .alias("hhi_ppm"),
                    "is_peak", "is_trough"))


def dispersion_index(events: DataFrame, ts_col: str = "ts",
                     type_col: str = "event_type",
                     flag_ppm: int = 2_000_000) -> DataFrame:
    """Index of dispersion / Fano factor per event type (E222) — the
    Poisson-or-bursty verdict over hourly buckets: variance-to-mean
    of per-hour counts, 1e6 ppm = Poisson-compatible, well above =
    bursty (retry storms, thundering herds, bot bursts), well below
    = metronomic (rate-limited clients).  The single number that
    complements E217's WHERE-in-the-day profile with HOW-clumpy.

    Exact algebra: over the SHARED clock grid (every hour observed
    anywhere in the stream — a per-type observed-buckets-only grid
    would hide burstiness exactly for the burstiest types, whose
    quiet hours vanish), sample variance / mean collapses to
    ``D_ppm = (n·Σx² − S²)·10⁶ div ((n−1)·S)`` — zero buckets
    contribute nothing to Σx², so the densify is IMPLICIT: only n
    (the global hour count) and each type's observed buckets are
    ever materialized.  ``n·Σx²`` rides decimal(38,0).  Types need
    S > 0 by construction; n ≥ 2 guarded (NULL below).

    → ``(type, n_buckets, n_events, mean_per_bucket_ppm,
    dispersion_ppm, overdispersed)``.

    Scale shape: one (type, hour) agg (bounded keys), one 1-row
    global hour-count dim broadcast back, one |types|-key fold.

    Reference analog: queue length is logged but never analyzed
    (cmd/link-processor/main.go:210); engine extension (SURVEY
    §2.10 E222).
    """
    b = (events.groupBy(F.col(type_col).alias("etype"),
                        F.date_trunc("hour", ts_col).alias("h"))
         .agg(F.count(F.lit(1)).cast("long").alias("x")))
    nh = (events.select(F.date_trunc("hour", ts_col).alias("h"))
          .distinct()
          .agg(F.count(F.lit(1)).cast("long").alias("n")))
    per = (b.groupBy("etype")
           .agg(F.sum("x").cast("long").alias("s"),
                F.sum((F.col("x") * F.col("x"))
                      .cast("decimal(38,0)")).alias("sx2")))
    return (per.crossJoin(F.broadcast(nh))
            .select(F.col("etype").alias(type_col),
                    F.col("n").alias("n_buckets"),
                    F.col("s").alias("n_events"),
                    F.expr("s * 1000000 div n").cast("long")
                    .alias("mean_per_bucket_ppm"),
                    F.expr(
                        "CASE WHEN n >= 2 THEN CAST((n * sx2 - "
                        "CAST(s AS DECIMAL(38,0)) * s) * 1000000 div "
                        "((n - 1) * CAST(s AS DECIMAL(38,0))) "
                        "AS BIGINT) END").alias("dispersion_ppm"))
            .withColumn("overdispersed",
                        F.col("dispersion_ppm") >= flag_ppm))


def active_users(events: DataFrame, ts_col: str = "ts",
                 user_col: str = "user_id") -> DataFrame:
    """Exact DAU / WAU / MAU and the stickiness ratio per calendar
    day (E231) — the activity dashboard row, computed exactly (the
    E133 sliding-HLL tier is the 10^10-user approximation; this is
    the truth it is certified against at audit scale): for every day
    in the observed [min, max] range, distinct users that day, in
    the trailing 7 days, in the trailing 30 days, and DAU/MAU in
    floor ppm (the classic stickiness read).

    Scale shape — NO range join, NO calendar BNLJ: the distinct
    (user, day) dim explodes into 30 (user, day+offset) rows (one
    per trailing window position, a map-side sequence explode) and
    the three windows fall out of ONE equi-keyed day aggregate via
    conditional distincts (offset 0 → DAU, ≤ 6 → WAU, ≤ 29 → MAU).
    Days past the observed maximum are clipped with a 1-row max-day
    dim.  Cost: |user-days| × 30 rows through one shuffle — the
    exact-tier price; beyond it, the HLL register tier takes over.

    → ``(day 'yyyy-MM-dd', dau, wau, mau, stickiness_ppm)``; days
    inside the range with no activity still appear when any user
    was active in the trailing 30 days.

    Reference analog: none; engine extension (SURVEY §2.10 E231).
    """
    ud = (events.select(
        F.col(user_col).alias("u"),
        F.date_trunc("day", F.col(ts_col)).alias("d")).distinct())
    mx = ud.agg(F.max("d").alias("mxd"))
    ex = (ud.select(
        "u", "d",
        F.explode(F.sequence(F.lit(0), F.lit(29))).alias("off"))
        .select("u", "off",
                (F.col("d") + F.make_interval(days=F.col("off")))
                .alias("day")))
    agg = (ex.crossJoin(F.broadcast(mx))
           .filter(F.col("day") <= F.col("mxd"))
           .groupBy("day")
           .agg(F.countDistinct(F.when(F.col("off") == 0,
                                       F.col("u"))).cast("long")
                .alias("dau"),
                F.countDistinct(F.when(F.col("off") <= 6,
                                       F.col("u"))).cast("long")
                .alias("wau"),
                F.countDistinct("u").cast("long").alias("mau")))
    return (agg.select(F.date_format("day", "yyyy-MM-dd")
                       .alias("day"), "dau", "wau", "mau")
            .withColumn("stickiness_ppm",
                        F.expr("CASE WHEN mau > 0 THEN "
                               "dau * 1000000 div mau ELSE 0 END")
                        .cast("long")))


def markov_stationary(events: DataFrame, rounds: int = 4,
                      ts_col: str = "ts", user_col: str = "user_id",
                      type_col: str = "event_type",
                      id_col: str = "event_id") -> DataFrame:
    """Stationary event mix of the per-user transition chain (E232)
    — where the E118 transition matrix SETTLES: iterate the chain
    from the uniform mix and compare against the empirical event
    shares.  A type whose stationary share sits far above its
    empirical share is where user behavior is HEADING (funnels fill
    it); far below and it is an entry-point type kept alive only by
    session starts — the drift verdict a product/crawl-scheduling
    review reads off one table.

    Exact recurrence in floor ppm: π₀ = uniform (10⁶ div k, +1 to
    the first types so Σ = 10⁶ exactly); per round
    ``π'_j = Σ_i (π_i · n_ij) div n_i`` — floor PER EDGE
    (deterministic in any engine; ≤ |types|² ppm units evaporate
    per round, the documented OPIC-style remainder policy); a type
    with no outgoing transitions self-loops its whole mass.

    Scale shape: ONE corpus shuffle (the user-key lead window that
    E118 already pays) builds the transition counts; every
    iteration then runs on the ≤ |types|² dim.

    → ``(type, empirical_ppm, stationary_ppm, delta_ppm)``.

    ``id_col`` (default ``event_id``) closes (ts) ordering ties —
    the same monotone-ingest-id convention sessionize uses.

    Reference analog: none; engine extension (SURVEY §2.10 E232).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("u").orderBy(ts_col, id_col)
    seq = (events.select(F.col(user_col).alias("u"), F.col(id_col),
                         F.col(ts_col), F.col(type_col).alias("a"))
           .withColumn("b", F.lead("a").over(w))
           .filter(F.col("b").isNotNull()))
    tm = (seq.groupBy("a", "b")
          .agg(F.count(F.lit(1)).cast("long").alias("n"))
          .localCheckpoint())
    out_deg = tm.groupBy("a").agg(F.sum("n").alias("na"))
    types = (events.select(F.col(type_col).alias("t")).distinct()
             .localCheckpoint())
    k = types.count()
    base, extra = 1_000_000 // k, 1_000_000 % k
    rw = W.orderBy("t")
    pi = (types.withColumn("rn", F.row_number().over(rw))
          .select("t", (F.lit(base)
                        + F.when(F.col("rn") <= extra, 1)
                        .otherwise(0)).cast("long").alias("pi"))
          .localCheckpoint())
    for _ in range(rounds):
        flow = (pi.join(out_deg.select(F.col("a").alias("t"), "na"),
                        "t", "left"))
        moving = (flow.filter(F.col("na").isNotNull())
                  .join(tm.select(F.col("a").alias("t"), "b", "n"),
                        "t")
                  .select(F.col("b").alias("t"),
                          F.expr("(pi * n) div na").cast("long")
                          .alias("c")))
        staying = (flow.filter(F.col("na").isNull())
                   .select("t", F.col("pi").cast("long").alias("c")))
        pi = (moving.unionByName(staying)
              .groupBy("t")
              .agg(F.sum("c").cast("long").alias("pi"))
              .join(types, "t", "right")
              .select("t", F.coalesce("pi", F.lit(0)).cast("long")
                      .alias("pi"))
              .localCheckpoint())
    emp = (events.groupBy(F.col(type_col).alias("t"))
           .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    tot = emp.agg(F.sum("cnt").alias("tot"))
    return (emp.crossJoin(F.broadcast(tot))
            .select("t", F.expr("cnt * 1000000 div tot").cast("long")
                    .alias("empirical_ppm"))
            .join(pi, "t")
            .select(F.col("t").alias(type_col), "empirical_ppm",
                    F.col("pi").alias("stationary_ppm"))
            .withColumn("delta_ppm",
                        (F.col("stationary_ppm")
                         - F.col("empirical_ppm")).cast("long")))


def mann_kendall(events: DataFrame, ts_col: str = "ts",
                 type_col: str = "event_type",
                 tau_flag_ppm: int = 200_000) -> DataFrame:
    """Mann-Kendall trend test per event type (E237) — the
    distribution-free is-this-series-drifting verdict a capacity /
    abuse review runs on daily volumes before trusting any forecast:
    S = Σ_{i<j} sign(x_j − x_i) over the day-ordered daily counts,
    Kendall's tau = S / C(n,2) in floor-toward-zero ppm (`div`
    semantics, identical in both engines), and the trend verdict at
    ±``tau_flag_ppm``.  Exact integers throughout — no variance
    approximation, no normal tables; at these n the exact tau IS the
    evidence (the z-test is a driver-side afterthought when wanted).

    → ``(type, n_days, s_stat, tau_ppm, trend ∈ up|down|flat)``.

    Scale shape: one fact scan → (type, day) agg; the pair
    enumeration runs on the bounded DAY dim (series length, never
    row count) as a per-type self-join — |days|²/2 dim rows per
    type, the classic O(n²) MK cost paid where n = calendar days.

    Reference analog: none — engine extension (SURVEY §2.10 E237).
    """
    d = (events.groupBy(F.col(type_col).alias("etype"),
                        F.date_trunc("day", ts_col).alias("d"))
         .agg(F.count(F.lit(1)).cast("long").alias("x")))
    a = d.select("etype", F.col("d").alias("di"), F.col("x").alias("xi"))
    b = d.select("etype", F.col("d").alias("dj"), F.col("x").alias("xj"))
    s = (a.join(b, "etype")
         .filter(F.col("di") < F.col("dj"))
         .groupBy("etype")
         .agg(F.sum(F.signum(F.col("xj") - F.col("xi")).cast("long"))
              .cast("long").alias("s_stat")))
    n = d.groupBy("etype").agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    out = (n.join(s, "etype", "left")
           .select(F.col("etype").alias(type_col), "n_days",
                   F.coalesce("s_stat", F.lit(0)).cast("long")
                   .alias("s_stat"))
           .withColumn(
               "tau_ppm",
               F.expr("CASE WHEN n_days >= 2 THEN "
                      "s_stat * 1000000 div "
                      "(n_days * (n_days - 1) div 2) END")
               .cast("long")))
    return out.withColumn(
        "trend",
        F.when(F.col("tau_ppm") >= tau_flag_ppm, "up")
         .when(F.col("tau_ppm") <= -tau_flag_ppm, "down")
         .otherwise("flat"))


def autocorrelation(events: DataFrame,
                    lags: tuple[int, ...] = (1, 2, 3, 24),
                    ts_col: str = "ts",
                    type_col: str = "event_type") -> DataFrame:
    """Exact integer autocorrelation of the per-type hourly count
    series (E238) — the is-it-diurnal / is-it-sticky read behind
    E217's seasonality profile: the biased ACF estimate r_k =
    Σ_{t≤n−k} c_t·c_{t+k} / Σ c_t² with c_t = n·x_t − S (the
    mean-centering multiplied through by n so every term stays an
    integer; the n² factors cancel in the ratio), in
    floor-toward-zero ppm.  High r at lag 24 on an hourly grid =
    diurnal; high r₁ = bursty persistence; ≈0 = Poisson-ish.

    Computed on the DENSE shared hour grid (min..max observed hour,
    zero-filled) — gap hours are real observations of 0; skipping
    them would destroy the lag alignment entirely.

    → ``(type, lag, n_hours, r_ppm)``; r_ppm NULL for a constant
    series (zero variance).

    Scale shape: one fact scan → (type, hour) agg; the grid explode,
    lag windows, and folds all run on the bounded |types|×|hours|
    dim (calendar-sized, never row-count-sized), windows partitioned
    by type.

    Reference analog: none — engine extension (SURVEY §2.10 E238).
    """
    hc = (events.groupBy(F.col(type_col).alias("etype"),
                         F.date_trunc("hour", ts_col).alias("h"))
          .agg(F.count(F.lit(1)).cast("long").alias("x")))
    bounds = hc.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    hours = (bounds.select(F.explode(F.sequence(
        "mn", "mx", F.expr("interval 1 hour"))).alias("h")))
    types = hc.select("etype").distinct()
    dense = (types.crossJoin(hours)
             .join(hc, ["etype", "h"], "left")
             .select("etype", "h",
                     F.coalesce("x", F.lit(0)).cast("long").alias("x")))
    tot = (dense.groupBy("etype")
           .agg(F.sum("x").cast("long").alias("s"),
                F.count(F.lit(1)).cast("long").alias("n")))
    c = (dense.join(tot, "etype")
         .select("etype", "h", "n",
                 (F.col("n") * F.col("x") - F.col("s"))
                 .cast("decimal(38,0)").alias("c")))
    w = Window.partitionBy("etype").orderBy("h")
    lagged = c.select(
        "etype", "n", "c",
        *[F.lead("c", k).over(w).alias(f"c_{k}") for k in lags])
    d0 = (lagged.groupBy("etype")
          .agg(F.max("n").alias("n_hours"),
               F.sum(F.col("c") * F.col("c")).alias("d0")))
    per_lag = (lagged.select(
        "etype",
        F.explode(F.array(*[
            F.struct(F.lit(k).cast("long").alias("lag"),
                     (F.col("c") * F.col(f"c_{k}")).alias("p"))
            for k in lags])).alias("kp"))
        .select("etype", "kp.lag", "kp.p")
        .filter(F.col("p").isNotNull())
        .groupBy("etype", "lag")
        .agg(F.sum("p").alias("dk")))
    return (per_lag.join(d0, "etype")
            .select(F.col("etype").alias(type_col), "lag",
                    F.col("n_hours").cast("long").alias("n_hours"),
                    F.expr("CASE WHEN d0 <> 0 THEN "
                           "dk * 1000000 div d0 END")
                    .cast("long").alias("r_ppm")))


def cohen_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa between two boolean labelers (E239) — the
    filter-ensemble agreement audit: when two independent quality
    heuristics disagree beyond chance, the corpus they'd jointly
    curate depends on arbitration order; kappa prices that.  Exact
    integer ppm: po = (n00+n11)/n, pe = (a1·b1 + a0·b0)/n²
    (marginal products on decimal(38,0) — n² overflows BIGINT past
    ~3e9 rows), kappa = (po − pe)/(1 − pe) evaluated on the ppm
    grid with floor-toward-zero division; NULL when pe = 1 (both
    labelers constant — kappa undefined).

    → one row: ``(n, n00, n01, n10, n11, po_ppm, pe_ppm,
    kappa_ppm)``.

    Scale shape: ONE scan, one aggregate row (conditional sums —
    map-side partials, 1-row shuffle state); no join, no window.

    Reference analog: none — engine extension (SURVEY §2.10 E239).
    """
    a = F.col(a_col).cast("boolean")
    b = F.col(b_col).cast("boolean")
    cell = lambda pa, pb: F.sum(((a == pa) & (b == pb))  # noqa: E731
                                .cast("long")).cast("long")
    one = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        cell(False, False).alias("n00"), cell(False, True).alias("n01"),
        cell(True, False).alias("n10"), cell(True, True).alias("n11"))
    return (one
            .withColumn("po_ppm",
                        F.expr("(n00 + n11) * 1000000 div n")
                        .cast("long"))
            .withColumn("pe_ppm",
                        F.expr(
                            "CAST((CAST(n10 + n11 AS DECIMAL(38,0)) "
                            "* (n01 + n11) + CAST(n00 + n01 AS "
                            "DECIMAL(38,0)) * (n00 + n10)) * 1000000 "
                            "div (CAST(n AS DECIMAL(38,0)) * n) "
                            "AS BIGINT)"))
            .withColumn("kappa_ppm",
                        F.expr("CASE WHEN pe_ppm < 1000000 THEN "
                               "(po_ppm - pe_ppm) * 1000000 div "
                               "(1000000 - pe_ppm) END").cast("long")))


def count_min_audit(events: DataFrame, key_col: str = "user_id",
                    d: int = 4, w: int = 256,
                    k: int = 10) -> DataFrame:
    """Count-Min sketch audit (E245, Cormode & Muthukrishnan '05) —
    the mergeable heavy-hitter counter a 10^6-key×per-window
    dashboard stores where exact per-key counts cannot be kept,
    priced against the exact truth at audit scale: build the d×w
    sketch (row j buckets key at hex16(j ':' key) mod w, cells sum
    event counts), read each key's estimate as the min over its d
    cells, and report the top-``k`` exact keys with estimate,
    overcount (≥ 0 always — CMS never undercounts), and the classic
    ε-bound check overcount ≤ 2N div w (probabilistic per row —
    the audit SHOWS when an undersized sketch breaks it).

    → ``(key, exact_n, cms_n, overcount_n, bound_n, within_bound,
    rank)`` for the top-k keys by exact count (key tie-break).

    Scale shape: ONE fact scan builds the exact (key, n) dim; the
    sketch is then built FROM that dim (equivalent by linearity —
    cell = Σ n over keys hashing in), so the d× expansion runs on
    |keys|, not rows; estimates are d bounded-dim joins (d·w cells
    is the broadcast dim).  Hashing is the shared md5/hex16 recipe,
    bit-identical in both engines.

    Reference analog: none — engine extension (SURVEY §2.10 E245).
    """
    from ..operators.graph_algos import _hex16

    exact = (events.select(F.col(key_col).cast("string").alias("key"))
             .groupBy("key")
             .agg(F.count(F.lit(1)).cast("long").alias("exact_n")))
    cells = (exact.select("key", "exact_n", F.explode(F.array(*[
        F.struct(F.lit(j).cast("int").alias("j"),
                 (_hex16(F.concat(F.lit(f"{j}:"), F.col("key")))
                  % w).alias("b"))
        for j in range(d)])).alias("c"))
        .select("key", "exact_n", "c.j", "c.b"))
    sketch = (cells.groupBy("j", "b")
              .agg(F.sum("exact_n").cast("long").alias("cell")))
    est = (cells.join(F.broadcast(sketch), ["j", "b"])
           .groupBy("key")
           .agg(F.max("exact_n").cast("long").alias("exact_n"),
                F.min("cell").cast("long").alias("cms_n")))
    tot = exact.agg(F.sum("exact_n").cast("long").alias("n_total"))
    wtop = Window.orderBy(F.desc("exact_n"), "key")
    return (est.crossJoin(F.broadcast(tot))
            .withColumn("rank", F.row_number().over(wtop).cast("long"))
            .filter(F.col("rank") <= k)
            .select("key", "exact_n", "cms_n",
                    (F.col("cms_n") - F.col("exact_n")).cast("long")
                    .alias("overcount_n"),
                    F.expr(f"2 * n_total div {w}").cast("long")
                    .alias("bound_n"), "rank")
            .withColumn("within_bound",
                        F.col("overcount_n") <= F.col("bound_n")))
