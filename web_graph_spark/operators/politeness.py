"""Per-host politeness scheduling (operator O4, north_star extension).

Each wave may crawl at most ``budget[host]`` pages per host; within a
host, lowest ``seq`` first (FIFO, O1).  Unscheduled rows carry over
with their seq unchanged — the oracle implements the identical rule so
crawl-order equality stays well-defined under any budget.

Physical shape: ``row_number() OVER (PARTITION BY host ORDER BY seq)``
filtered by a rank bound.  Spark ≥3.5 rewrites the constant-bound rank
filter into ``WindowGroupLimit`` — a map-side partial top-K per host
BEFORE the shuffle — so a hot host with 10^7 pending URLs ships only
``limit`` rows to the window stage instead of all of them
(tests/test_plans.py pins this).  The per-host exact budget (from the
broadcast budgets dim) is applied after the cheap global cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def schedule_wave(pending: DataFrame, budgets: DataFrame | None,
                  default_budget: int, host_col: str = "host",
                  seq_col: str = "seq",
                  priority_col: str | None = None,
                  broadcast_budgets: bool = True,
                  max_budget: int | None = None) -> tuple[DataFrame, int]:
    """Split pending frontier into (scheduled, cap) for this wave.

    budgets: per-host dim (host, max_pages_per_wave).
    broadcast_budgets: True = broadcast-hint the dim join (right for
    the common small dim); False = plain equi-join, letting the
    planner shuffle both sides — the 10^7-host dim at target scale is
    NOT a broadcast (VERDICT r3 #4); callers gate on the dim's size
    (SparkCrawler.BUDGETS_BROADCAST_MAX).  The constant-cap
    WindowGroupLimit prefilter is unaffected either way.
    priority_col: optional score ranked ASCENDING before FIFO seq —
    the north_star's "depth + host-budget priority" uses ``depth``, so
    shallower carryover URLs win a budget-constrained wave over deeper
    fresh discoveries (pure BFS ≡ priority None, the Go-oracle mode).
    Returns the scheduled DataFrame with a ``host_rank`` column.
    """
    order = ([F.col(priority_col).asc(), F.col(seq_col).asc()]
             if priority_col else [F.col(seq_col).asc()])
    w = Window.partitionBy(host_col).orderBy(*order)
    ranked = pending.withColumn("host_rank", F.row_number().over(w))
    # A constant rank bound must dominate every host's effective budget
    # (dim value, or default for hosts missing from the dim).
    # max_budget: the dim's precomputed max — callers that keep the dim
    # across waves (SparkCrawler) pass it so the cap costs no per-call
    # agg job; None falls back to computing it here.
    cap = default_budget
    if budgets is not None and default_budget < (1 << 40):
        m = (max_budget if max_budget is not None
             else budgets.agg(F.max("max_pages_per_wave")).collect()[0][0])
        if m is not None:
            cap = max(int(m), default_budget)
    if cap < (1 << 40):
        # constant bound → WindowGroupLimit (map-side top-K per host)
        ranked = ranked.filter(F.col("host_rank") <= F.lit(cap))
    if budgets is not None:
        # join only the budget column — the dim may carry extra columns
        # (e.g. wave_period, consumed by the crawler's period gate)
        bud = budgets.select(host_col, "max_pages_per_wave")
        if broadcast_budgets:
            bud = F.broadcast(bud)
        ranked = (ranked.join(bud, on=host_col, how="left")
                  .filter(F.col("host_rank") <=
                          F.coalesce(F.col("max_pages_per_wave"),
                                     F.lit(default_budget)))
                  .drop("max_pages_per_wave"))
    elif default_budget < (1 << 40):
        ranked = ranked.filter(F.col("host_rank") <= F.lit(default_budget))
    return ranked, cap


def allocate_budget(weights: DataFrame, budget: int,
                    host_col: str = "host",
                    weight_col: str = "weight") -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of a global fetch
    budget across hosts — the planning step between source quality /
    inventory signals and :func:`schedule_wave`'s per-host budgets
    dim: every host gets ``floor(budget * w / W)`` fetches, and the
    ``budget - Σfloor`` leftover goes one-each to the largest
    remainders (tie-break host ASC).  All integer arithmetic, so the
    result is exact, engine-independent, and sums to ``budget``
    EXACTLY — the invariant a fleet-wide fetch planner actually needs
    (probabilistic rounding over- or under-commits the fleet).

    Returns ``(host, weight, alloc)``.

    Scale shape: one 1-row total, one codegen'd projection over the
    hosts dim, and the remainder top-R via
    :func:`~web_graph_spark.operators.frontier.take_global` — exact,
    range-partitioned, never a single-reducer sort of 10^8 hosts.
    The two driver-side scalars (W exists inside the plan; R must
    bound take_global) are one collect of one row each."""
    from web_graph_spark.operators.frontier import take_global

    if budget < 0:
        raise ValueError("budget must be >= 0")
    tot = weights.agg(F.sum(weight_col).cast("long").alias("__W"))
    base = (weights.select(F.col(host_col).alias("host"),
                           F.col(weight_col).cast("long").alias("weight"))
            .crossJoin(F.broadcast(tot))
            .select("host", "weight",
                    F.expr(f"({budget} * weight) div __W")
                    .cast("long").alias("floor_a"),
                    F.expr(f"({budget} * weight) % __W")
                    .cast("long").alias("rem"))
            .localCheckpoint(eager=True))
    got = base.agg(F.sum("floor_a").cast("long").alias("s"),
                   F.count("*").cast("long").alias("n")).collect()
    r = budget - int(got[0]["s"] or 0)
    winners = (take_global(
        base.withColumn("__nr", -F.col("rem")), r, ["__nr", "host"],
        small_hint=int(got[0]["n"]))
        .select("host", F.lit(1).cast("long").alias("bump"))
        if r > 0 else None)
    out = base
    if winners is not None:
        out = out.join(winners, "host", "left")
    else:
        out = out.withColumn("bump", F.lit(None).cast("long"))
    return out.select(
        "host", "weight",
        (F.col("floor_a") + F.coalesce(F.col("bump"), F.lit(0)))
        .cast("long").alias("alloc"))


def crawl_delay_compliance(fetch_log: DataFrame, delays: DataFrame,
                           host_col: str = "host",
                           ts_sec_col: str = "t",
                           tie_col: str = "tie") -> DataFrame:
    """Did the fleet actually honor per-host crawl-delay? (E152) —
    the evidence side of politeness: :func:`schedule_wave` ENFORCES
    budgets before fetching; this audits the fetch log AFTER the
    fact, the artifact you produce when a webmaster (or your own SRE)
    asks "show me".  Per host with declared delay d, over the
    time-ordered fetch gaps:

    * ``n_violations`` — gaps strictly under d;
    * ``min_gap`` — the single worst spacing observed;
    * ``worst_deficit`` — max(d − gap) over violations (how BAD the
      worst one was, 0 when compliant) — the retraining signal for
      the pacing loop;
    * ``compliant`` — zero violations.

    All integer-second arithmetic.  Shape: ONE shuffle on host (the
    lag window); the per-host agg rides the same partitioning; the
    delay dim joins broadcast (a crawl-delay relation is
    hosts-with-robots sized, tiny next to a fetch log).  Hosts
    missing from ``delays`` are skipped — no declared delay, nothing
    to violate.

    → ``(host, crawl_delay, n_fetches, n_gaps, min_gap,
    n_violations, worst_deficit, compliant)``.

    Reference analog: the reference's politeness is a 2-worker cap +
    client timeouts (linkprocessor.go:51-75) with nothing to audit;
    engine extension (SURVEY §2.10 E152).
    """
    w = Window.partitionBy("host").orderBy("t", "tie")
    base = fetch_log.select(F.col(host_col).alias("host"),
                            F.col(ts_sec_col).cast("long").alias("t"),
                            F.col(tie_col).alias("tie"))
    gaps = base.select(
        "host", (F.col("t") - F.lag("t").over(w)).alias("gap"))
    d = F.broadcast(delays.select(
        F.col("host"), F.col("crawl_delay").cast("long")))
    j = gaps.join(d, "host", "inner")
    viol = F.col("gap") < F.col("crawl_delay")
    return (j.groupBy("host")
            .agg(F.max("crawl_delay").alias("crawl_delay"),
                 (F.count("gap") + 1).cast("long").alias("n_fetches"),
                 F.count("gap").cast("long").alias("n_gaps"),
                 F.min("gap").cast("long").alias("min_gap"),
                 F.sum(F.when(viol, 1).otherwise(0)).cast("long")
                 .alias("n_violations"),
                 F.coalesce(
                     F.max(F.when(viol, F.col("crawl_delay")
                                  - F.col("gap"))),
                     F.lit(0)).cast("long").alias("worst_deficit"))
            .withColumn("compliant", F.col("n_violations") == 0))


def drain_plan(df: DataFrame, host_col: str = "host",
               pending_col: str = "n_pending",
               budget_col: str = "budget") -> DataFrame:
    """Frontier drain forecast (E159) — "when will this crawl
    finish?" answered exactly, per wave, BEFORE fetching anything:
    under per-host politeness budgets each host drains
    ``⌈pending/budget⌉`` waves, and the completion curve (URLs done,
    hosts finished, done-ppm per wave) is pure arithmetic over the
    per-host (pending, budget) dim.  The long tail this surfaces is
    the operational insight: one huge host with a tiny budget sets
    the makespan while the fleet idles — the case for
    :func:`allocate_budget` rebalancing (and the snake assignment
    E136) made with numbers.

    Shape: everything happens on the HOST DIM (one row per host —
    pending COUNTS, not the URLs themselves); the explode emits
    Σ⌈pending/budget⌉ ≤ hosts × makespan dim rows, the per-wave agg
    and two cumulative windows run over the MAKESPAN-sized result.
    The frontier's 10^10 URLs are never touched.

    → ``(wave, urls_fetched, hosts_done, urls_done, done_ppm)``,
    one row per wave 1..makespan.

    Reference analog: none (the reference crawls until its channel
    drains, with no forecast); engine extension (SURVEY §2.10 E159).
    """
    ex = df.select(
        F.col(host_col).alias("host"),
        F.col(pending_col).cast("long").alias("n_pending"),
        F.col(budget_col).cast("long").alias("budget"),
        F.expr(f"({pending_col} + {budget_col} - 1) "
               f"div {budget_col}").alias("wtd"))
    steps = (ex.select(
        "host", "n_pending", "budget", "wtd",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("wtd")))
        .alias("wave"))
        .select(
            "wave",
            F.least(F.col("budget"),
                    F.col("n_pending")
                    - F.col("budget") * (F.col("wave") - 1))
            .alias("delta"),
            (F.col("wave") == F.col("wtd")).cast("int")
            .alias("finishes")))
    per_wave = (steps.groupBy("wave")
                .agg(F.sum("delta").cast("long")
                     .alias("urls_fetched"),
                     F.sum("finishes").cast("long").alias("fin")))
    cum = (Window.orderBy("wave")
           .rowsBetween(Window.unboundedPreceding, 0))
    tot = Window.orderBy("wave").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return (per_wave
            .withColumn("hosts_done", F.sum("fin").over(cum))
            .withColumn("urls_done",
                        F.sum("urls_fetched").over(cum))
            .withColumn("total",
                        F.sum("urls_fetched").over(tot))
            .withColumn("done_ppm",
                        F.expr("1000000 * urls_done div total"))
            .select("wave", "urls_fetched", "hosts_done",
                    "urls_done", "done_ppm"))


def fair_share(df: DataFrame, capacity: int, host_col: str = "host",
               demand_col: str = "demand") -> DataFrame:
    """Max-min fair (water-filling) split of a GLOBAL fetch capacity
    across hosts (E164) — the other canonical allocator next to
    :func:`allocate_budget`'s weighted apportionment: no host gets
    more than it asked for (``demand`` caps the grant), capacity a
    small host leaves unused flows to the hosts still hungry, and
    every capped host receives the same water level — the
    Bertsekas–Gallager fairness a crawl fleet wants when demands are
    wildly skewed (one 10^7-URL host must not starve 10^4 small
    hosts, and a 3-URL host must not hoard a 10^3 grant).

    Exact integer semantics, fully deterministic: the water level is
    the largest ``L`` with ``Σ min(demand_i, L) ≤ capacity`` computed
    on the DEMAND HISTOGRAM; hosts with demand ≤ L get their demand;
    the rest get ``L`` plus — for the first ``r = remainder`` capped
    hosts in (demand ASC, host ASC) order — one extra unit, so the
    grants sum to ``min(capacity, Σ demand)`` EXACTLY.

    Scale shape: the window runs over the demand-VALUE histogram
    (≤ distinct demand values rows, not hosts); the residual +1
    winners come from :func:`~web_graph_spark.operators.frontier.
    take_global` (range-partitioned exact top-r, never a global
    sort of the host dim); two driver-side scalars (the boundary
    row and the total) are one collect of one row each — the
    allocate_budget precedent.

    Returns ``(host, demand, alloc, capped)``.

    Reference analog: none (the reference's politeness is a global
    2-worker cap, linkprocessor.go:51-75); engine extension (SURVEY
    §2.10 E164).
    """
    from web_graph_spark.operators.frontier import take_global

    if capacity < 0:
        raise ValueError("capacity must be >= 0")
    hosts = df.select(F.col(host_col).alias("host"),
                      F.col(demand_col).cast("long").alias("demand"))
    hist = hosts.groupBy("demand").agg(
        F.count(F.lit(1)).cast("long").alias("n_d"),
        F.sum("demand").cast("long").alias("s_d"))
    tot = hosts.agg(F.count(F.lit(1)).cast("long").alias("n_total"),
                    F.coalesce(F.sum("demand"), F.lit(0)).cast("long")
                    .alias("s_total")).collect()[0]
    n_total, s_total = int(tot["n_total"] or 0), int(tot["s_total"] or 0)
    if n_total == 0:
        return hosts.select("host", "demand",
                            F.lit(0).cast("long").alias("alloc"),
                            F.lit(False).alias("capped"))
    w = Window.orderBy("demand").rowsBetween(
        Window.unboundedPreceding, 0)
    cum = (hist.withColumn("cum_n", F.sum("n_d").over(w))
           .withColumn("cum_s", F.sum("s_d").over(w)))
    # t(d) = cost of satisfying every host with demand <= d at level d
    t = ((F.col("cum_s") - F.col("s_d"))
         + F.col("demand") * (F.lit(n_total)
                              - (F.col("cum_n") - F.col("n_d"))))
    feas = (cum.withColumn("t", t.cast("long"))
            .filter(F.col("t") <= F.lit(int(capacity)))
            .orderBy(F.col("demand").desc()).limit(1)
            .select("demand", "cum_n", "cum_s").collect())
    if feas:
        d_star = int(feas[0]["demand"])
        n_star, s_star = int(feas[0]["cum_n"]), int(feas[0]["cum_s"])
    else:
        d_star, n_star, s_star = -1, 0, 0
    m = n_total - n_star
    if m == 0:
        return hosts.select(
            "host", "demand", F.col("demand").alias("alloc"),
            F.lit(False).alias("capped"))
    level = (int(capacity) - s_star) // m
    r = (int(capacity) - s_star) % m
    capped = hosts.filter(F.col("demand") > F.lit(d_star))
    winners = (take_global(capped, r, ["demand", "host"],
                           small_hint=m)
               .select("host", F.lit(1).cast("long").alias("bump"))
               if r > 0 else None)
    out = hosts.withColumn(
        "capped", F.col("demand") > F.lit(d_star))
    if winners is not None:
        out = out.join(winners, "host", "left")
    else:
        out = out.withColumn("bump", F.lit(None).cast("long"))
    return out.select(
        "host", "demand",
        F.when(~F.col("capped"), F.col("demand"))
        .otherwise(F.lit(level) + F.coalesce(F.col("bump"), F.lit(0)))
        .cast("long").alias("alloc"),
        "capped")


WFQ_SCALE = 1_000_000_000


def wfq_order(df: DataFrame, host_col: str = "host",
              picks_col: str = "alloc",
              weight_col: str | None = None) -> DataFrame:
    """Weighted-fair-queueing fetch interleave (E165) — the step
    between a per-host wave budget (:func:`schedule_wave`,
    :func:`fair_share`) and the wire: in WHAT ORDER do the wave's
    fetches run so that hosts are served smoothly in proportion to
    their weights, instead of all of one host's grant firing
    back-to-back (bursty, politeness-hostile) or strict round-robin
    ignoring rates?  Classic virtual-finish-time WFQ (Demers et al.
    1989), exact and integer: host ``h`` with weight ``w_h`` gets its
    ``j``-th pick the virtual key::

        vkey = (j * WFQ_SCALE) div w_h

    and the global order is (vkey, host, j) — floor division can tie
    keys the true rationals would split, and the (host, j) tie-break
    resolves those deterministically, so the order is a pure function
    of the input.  A host with twice the weight fetches twice as
    often at every prefix of the schedule (±1, the classic WFQ
    fairness bound).

    Rows with ``picks ≤ 0`` emit nothing; rows with ``weight ≤ 0``
    but positive picks are dropped too (no rate = no service),
    documented rather than raised — both are per-row data conditions
    a 10^8-host dim cannot throw on.

    Scale shape: one explode of Σpicks rows (the wave's actual fetch
    list — nothing bigger exists in this problem) and ONE dense
    global numbering via :func:`~web_graph_spark.operators.frontier.
    ordered_seq` (range-partitioned rank, never a single-reducer
    sort).

    Returns ``(ord, host, j, vkey)`` — ``ord`` is 1-based.

    Reference analog: the reference fetches in channel-arrival order
    with a 2-worker cap (linkprocessor.go:51-75); engine extension
    (SURVEY §2.10 E165).
    """
    from web_graph_spark.operators.frontier import ordered_seq

    w_col = weight_col or picks_col
    base = (df.select(F.col(host_col).alias("host"),
                      F.col(picks_col).cast("long").alias("n_picks"),
                      F.col(w_col).cast("long").alias("weight"))
            .filter((F.col("n_picks") > 0) & (F.col("weight") > 0)))
    picks = base.select(
        "host", "weight",
        F.explode(F.sequence(F.lit(1).cast("long"),
                             F.col("n_picks"))).alias("j"))
    keyed = picks.select(
        "host", "j",
        F.expr(f"(j * {WFQ_SCALE}L) div weight").cast("long")
        .alias("vkey"))
    return (ordered_seq(keyed, ["vkey", "host", "j"], start=1,
                        out_col="ord")
            .select("ord", "host", "j", "vkey"))


def connection_plan(schedule: DataFrame, gap_limit: int,
                    host_col: str = "host",
                    ord_col: str = "ord") -> DataFrame:
    """Keep-alive connection audit of a fetch schedule (E167) — the
    tension :func:`wfq_order` creates, priced: smooth politeness
    interleaving maximizes the spacing between a host's fetches, but
    a pooled fetcher (operators/fetch.py keep-alive pool) only reuses
    a connection whose idle gap stays within the server's keep-alive
    window.  Model the window as ``gap_limit`` schedule positions: a
    host's fetch reuses the connection iff the gap to its previous
    fetch is ≤ gap_limit, else the fetcher pays a fresh
    connect+TLS setup.  Per host, exact over the schedule order:

    * ``n_setups`` = 1 + #(gaps > gap_limit) — connections opened;
    * ``reuse_ppm`` = 10^6 · (n_fetches − n_setups) div n_fetches;
    * ``max_gap`` — the worst idle spacing (what gap_limit would
      have to be to single-connection this host).

    Feed it two candidate schedules (WFQ vs host-batched) and the
    reuse_ppm delta is the connection cost of politeness smoothing —
    the design number for picking the interleave.

    Shape: ONE shuffle on host (the lag window); the per-host agg
    rides the same partitioning; nothing scales past the schedule's
    own row count.

    Returns ``(host, n_fetches, n_setups, reuse_ppm, max_gap)``;
    ``max_gap`` is 0 for single-fetch hosts.

    Reference analog: the reference's http.Client pools connections
    implicitly (linkprocessor.go:51-60) with nothing to audit;
    engine extension (SURVEY §2.10 E167).
    """
    if gap_limit < 0:
        raise ValueError("gap_limit must be >= 0")
    w = Window.partitionBy("host").orderBy("o")
    base = schedule.select(F.col(host_col).alias("host"),
                           F.col(ord_col).cast("long").alias("o"))
    gaps = base.select(
        "host", (F.col("o") - F.lag("o").over(w)).alias("gap"))
    return (gaps.groupBy("host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_fetches"),
                 (1 + F.sum(F.when(F.col("gap") > gap_limit, 1)
                            .otherwise(0))).cast("long")
                 .alias("n_setups"),
                 F.coalesce(F.max("gap"), F.lit(0)).cast("long")
                 .alias("max_gap"))
            .select("host", "n_fetches", "n_setups",
                    F.expr("1000000 * (n_fetches - n_setups) "
                           "div n_fetches").cast("long")
                    .alias("reuse_ppm"),
                    "max_gap"))


def ip_budget_split(demand: DataFrame, dns: DataFrame, ip_cap: int,
                    host_col: str = "host", demand_col: str = "demand",
                    ip_col: str = "ip") -> DataFrame:
    """Per-IP politeness split — the virtual-hosting correction to
    per-host budgets: hundreds of vhosts resolving to ONE server must
    share that server's fetch rate, or the crawler is polite on paper
    and hammering the box in practice (the reference rate-limits per
    host only, pkg/linkprocessor/linkprocessor.go:51-75 — its DoH
    resolver sees the IPs but never feeds them back into pacing).

    Joins the per-host demand dim (already host-budget-capped pending
    counts) to the resolver relation, then apportions each IP's
    ``ip_cap`` among its vhosts:

      T = Σ demand(ip)
      T ≤ ip_cap  →  grant = demand            (cap not binding)
      T > ip_cap  →  grouped largest-remainder (Hamilton): base =
                     ip_cap·d div T, the ip_cap − Σbase leftover
                     units go one-each to the largest ``ip_cap·d mod
                     T`` remainders (tie host ASC) — exactly
                     :func:`allocate_budget`'s rule, but PER GROUP:
                     totals/ranks live in ip-keyed windows, never as
                     driver scalars, so 10^7 IPs cost one shuffle.

    Hamilton under a binding cap never over-grants (base < d when
    T > ip_cap ≥ 1 unit), Σ grant = ip_cap exactly per constrained
    IP, and every division is integer-on-non-negative (Spark ``div``
    ≡ DuckDB ``//``).  Hosts absent from ``dns`` keep their demand
    un-split under a sentinel ip NULL — surfacing resolver gaps
    instead of silently dropping those hosts from the wave.

    → (host, ip, n_vhosts, demand, grant, starved, shared)

    Scale shape: one host-key equi-join + one ip-key window stage;
    both keys uniform (host strings / IPs), no collect, no global
    sort.
    """
    if ip_cap < 1:
        raise ValueError("ip_cap must be >= 1")
    d = demand.select(F.col(host_col).alias("host"),
                      F.col(demand_col).cast("long").alias("demand"))
    j = d.join(dns.select(F.col(host_col).alias("host"),
                          F.col(ip_col).alias("ip")), "host", "left")
    w_ip = Window.partitionBy("ip")
    w_rank = Window.partitionBy("ip").orderBy(F.col("rem").desc(), "host")
    # base/rem only exist under a binding cap (T > ip_cap ≥ 1), so the
    # division never sees T = 0 — all-zero-demand groups take the
    # unconstrained branch
    binding0 = F.col("ip").isNotNull() & (F.col("T") > F.lit(ip_cap))
    t = (j.withColumn("T", F.sum("demand").over(w_ip))
         .withColumn("n_vhosts", F.count(F.lit(1)).over(w_ip))
         .withColumn("base",
                     F.when(binding0, F.expr(f"({ip_cap} * demand) div T"))
                      .otherwise(F.lit(0)))
         .withColumn("rem",
                     F.when(binding0, F.expr(f"({ip_cap} * demand) % T"))
                      .otherwise(F.lit(0)))
         .withColumn("sum_base", F.sum("base").over(w_ip))
         .withColumn("rk", F.row_number().over(w_rank)))
    binding = F.col("ip").isNotNull() & (F.col("T") > F.lit(ip_cap))
    grant = F.when(
        binding,
        F.col("base") + F.when(
            F.col("rk") <= F.lit(ip_cap) - F.col("sum_base"),
            F.lit(1)).otherwise(F.lit(0))
    ).otherwise(F.col("demand"))
    return (t.select(
        "host", "ip",
        F.when(F.col("ip").isNotNull(), F.col("n_vhosts"))
         .otherwise(F.lit(1)).cast("long").alias("n_vhosts"),
        "demand", grant.cast("long").alias("grant"))
        .withColumn("starved",
                    (F.col("demand") - F.col("grant")).cast("long"))
        .withColumn("shared", F.col("n_vhosts") > 1))


def byte_budget_schedule(pending: DataFrame, byte_cap: int,
                         host_col: str = "host",
                         order_col: str = "seq",
                         bytes_col: str = "bytes") -> DataFrame:
    """Byte-weighted politeness cut (E194) — the bandwidth complement
    to :func:`schedule_wave`'s page-COUNT budgets: a host serving
    10 MB pages costs 100× the host serving 100 KB pages at the same
    page budget, so real fetch fleets cap *bytes per host per wave*.
    Admit rows in FIFO order while the host's running byte total
    stays ≤ ``byte_cap``, with the make-progress rule: the host's
    FIRST pending row is always admitted even when it alone exceeds
    the cap (otherwise one oversized page starves its host forever —
    it gets fetched, the budget is blown, the wave moves on).

    Rows are returned with the verdict rather than filtered, so the
    caller both schedules (admitted) and carries over (the rest)
    from one pass — the same contract as the budget cut.

    → input columns + ``(cum_bytes, admitted)``.

    Scale shape: ONE host-keyed window pass (running sum + rank over
    (order_col) — ties broken by ``bytes_col`` then input order are
    the caller's job: pass a unique order key, as the frontier's
    dense seq is).  Compose AFTER the count-budget cut when hosts
    can hold 10^7 pending rows — the cumsum must scan whatever it is
    given; the count cut bounds that to the page budget.
    """
    if byte_cap < 1:
        raise ValueError("byte_cap must be >= 1")
    w = (Window.partitionBy(host_col).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wr = Window.partitionBy(host_col).orderBy(order_col)
    return (pending
            .withColumn("cum_bytes",
                        F.sum(bytes_col).over(w).cast("long"))
            .withColumn("__rk", F.row_number().over(wr))
            .withColumn("admitted",
                        (F.col("cum_bytes") <= F.lit(byte_cap))
                        | (F.col("__rk") == 1))
            .drop("__rk"))
