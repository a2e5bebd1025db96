"""Distributed graph algorithms over the page/link graph.

The reference exposes only point lookups over its two graph tables
(J1-J5, /root/reference/cmd/link-api/main.go:87-191); whole-graph
analytics happen client-side in the force-graph UI
(/root/reference/frontend/index.html:92-140).  At 100 TB the
"explore the graph" capability has to move engine-side, so this module
adds the two standard whole-graph operators, both expressed as
DataFrame loops (no RDDs, no driver-side adjacency):

* :func:`connected_components` — alternating large-star / small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14).  O(log^2 n) rounds, each round = one groupBy(min) + one
  join, both shuffle-partitioned on the node key; converges to star
  graphs rooted at each component's minimum node id, so the output
  label is deterministic (= min doc_id of the component) and
  oracle-checkable against a recursive-CTE reachability query.
* :func:`pagerank` — classic power iteration as join + groupBy(sum),
  with dangling-mass redistribution.  Out-degrees are computed once
  and cached; each iteration shuffles on the destination key only.

Scale notes: both loops truncate lineage with ``localCheckpoint``
every few rounds (iterative plans otherwise grow unboundedly and
re-plan from the source each round), and both converge on a
DataFrame-side count rather than collecting state to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window

from web_graph_spark.plans import cut_lineage as _cut
from pyspark.sql import functions as F

__all__ = ["connected_components", "pagerank", "triangle_counts",
           "label_propagation", "strongly_connected_components"]


def _canon_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge set as (u, v) with u != v, deduplicated."""
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    return (e.filter(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("u"),
                    F.greatest("u", "v").alias("v"))
            .distinct())


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(N(u) ∪ {u}).  Input/output: directed pair list (u, v)."""
    und = e.select("u", "v").unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (und.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m")))
    return (und.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges large→small; connect each node's smaller
    neighborhood (and itself) to its minimum."""
    o = e.select(F.greatest("u", "v").alias("u"),
                 F.least("u", "v").alias("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = o.join(mins, "u").select(F.col("v").alias("n"), "m",
                                    F.col("u").alias("center"))
    selfs = mins.select(F.col("u").alias("n"), "m",
                        F.col("u").alias("center"))
    out = (nbrs.unionByName(selfs)
           .select(F.col("n").alias("u"), F.col("m").alias("v"))
           .filter(F.col("u") != F.col("v"))
           .select(F.least("u", "v").alias("u"),
                   F.greatest("u", "v").alias("v"))
           .distinct())
    return out


def _edge_digest(e: DataFrame) -> tuple:
    """(count, Σ xxhash64(u,v), Σ xxhash64(seed',u,v)) — an
    order-insensitive set digest.  One cheap agg job (map-side
    partial, 1-row shuffle) instead of the two full exceptAll shuffles
    a set-equality check would cost.  The edge set is canonical (u<v,
    distinct), so digest equality implies set equality up to a
    collision of BOTH independent hash sums (~2^-128 per round —
    beyond cosmic-ray territory; the second sum exists because a
    single 2^-64 sum is at least arguable)."""
    r = e.agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.xxhash64("u", "v").cast("decimal(38,0)"))
               .alias("h"),
              F.sum(F.xxhash64(F.lit(0x5EED), "u", "v")
                    .cast("decimal(38,0)")).alias("h2")).first()
    if r["n"] and (r["h"] is None or r["h2"] is None):
        # non-ANSI decimal overflow yields NULL; two NULL digests would
        # compare equal across rounds and fake convergence.  At
        # decimal(38,0) a same-sign worst case needs ~10^19 edges —
        # unreachable — but fail loudly rather than silently converge.
        raise ArithmeticError("edge digest overflowed decimal(38,0)")
    return (r["n"], r["h"], r["h2"])


def connected_components(vertices: DataFrame, edges: DataFrame,
                         id_col: str = "doc_id",
                         src: str = "src_doc_id", dst: str = "tgt_doc_id",
                         max_rounds: int = 50) -> DataFrame:
    """(id_col, component) — component = min vertex id reachable via
    undirected edges.  Isolated vertices label themselves.

    Raises RuntimeError if the star-graph fixpoint is not reached in
    ``max_rounds`` — a non-converged edge set could label one node into
    several components, so silent truncation is never acceptable.
    """
    e = _canon_edges(edges, src, dst).transform(_cut)
    digest = _edge_digest(e)
    converged = False
    for _ in range(max_rounds):
        e2 = _small_star(_large_star(e)).transform(_cut)
        d2 = _edge_digest(e2)
        e = e2
        if d2 == digest:
            converged = True
            break
        digest = d2
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "rounds — raise max_rounds (O(log^2 n) expected)")
    # stars: every surviving edge is (member, root); roots and
    # isolated vertices label themselves.
    labels = e.select(F.greatest("u", "v").alias(id_col),
                      F.least("u", "v").alias("component"))
    ids = vertices.select(F.col(id_col).cast("long").alias(id_col))
    return (ids.join(labels, id_col, "left")
            .select(id_col,
                    F.coalesce("component", F.col(id_col))
                     .alias("component")))


def bfs_depths(edges: DataFrame, seeds: DataFrame,
               src: str = "src_doc_id", dst: str = "tgt_doc_id",
               id_col: str = "doc_id", max_depth: int = 64) -> DataFrame:
    """(id_col, depth) — minimum DIRECTED hop distance from the seed
    set; unreachable vertices are absent.  The crawl-analysis query
    behind "how deep does wave-N reach" / frontier-depth histograms
    (the reference's BFS order makes depth = wave for an unbounded
    budget, crawler.py O1).

    Level-synchronous frontier expansion — exactly one edges⋈frontier
    shuffle per level:

    * the edge set is hash-repartitioned on ``src`` ONCE and persisted;
      every level's equi-join on ``src`` reuses that output
      partitioning, so only the (small) frontier side shuffles per
      round,
    * each new frontier is ``localCheckpoint``ed — lineage stays flat
      (plans never re-derive earlier levels), and the visited set is a
      union of already-materialized level DataFrames, not a recursive
      plan,
    * termination = empty frontier (``isEmpty`` on a checkpointed
      handle is a metadata peek, not a recompute).  ``max_depth`` is a
      guard against adversarial diameters, raised loudly rather than
      silently truncated.

    At 10^10 edges a deployment would keep ``visited`` in a bucketed
    table (the crawler's frontier_log layout) instead of a k-way
    union; semantics are identical and tests pin this implementation
    against a recursive-CTE oracle."""
    e = (edges.select(F.col(src).cast("long").alias("__s"),
                      F.col(dst).cast("long").alias("__t"))
         .distinct().repartition("__s").persist())
    level = (seeds.select(F.col(id_col).cast("long").alias(id_col))
             .distinct()
             .withColumn("depth", F.lit(0).cast("long"))
             .transform(_cut))
    levels = [level]
    visited = level.select(id_col)
    d = 0
    while not level.isEmpty():
        d += 1
        level = (e.join(level.select(F.col(id_col).alias("__s")), "__s")
                 .select(F.col("__t").alias(id_col)).distinct()
                 .join(visited, id_col, "left_anti")
                 .withColumn("depth", F.lit(d).cast("long"))
                 .transform(_cut))
        if level.isEmpty():
            break
        # guard AFTER computing the level: a graph whose deepest level
        # is exactly max_depth must complete, not raise — only an
        # unvisited frontier BEYOND the cap is an error
        if d > max_depth:
            e.unpersist()
            raise RuntimeError(
                f"bfs_depths exceeded max_depth={max_depth} levels — "
                "raise the guard for high-diameter graphs")
        levels.append(level)
        visited = visited.unionByName(level.select(id_col))
    e.unpersist()
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def pagerank(vertices: DataFrame, edges: DataFrame,
             id_col: str = "doc_id",
             src: str = "src_doc_id", dst: str = "tgt_doc_id",
             n_iter: int = 8, damping: float = 0.85) -> DataFrame:
    """(id_col, rank) after ``n_iter`` power iterations; Σ rank ≈ 1.

    Dangling nodes' mass is redistributed uniformly each round (the
    standard stochastic-matrix completion), so ranks stay a proper
    distribution and the result matches a dense numpy reference.

    Determinism: the loop runs in DECIMAL(38,18).  Decimal addition is
    exact (associative/commutative), so groupBy sums give bit-identical
    results regardless of partitioning, task order, or AQE re-plans —
    unlike doubles, whose sum depends on reduction order.  Per-row
    division/multiplication round HALF_UP at scale 18: deterministic.
    That makes the output a fixed function of (graph, n_iter, damping),
    safe to pin with a golden-parquet oracle.

    Laziness: the dangling mass joins back as a 1-row crossJoin instead
    of a per-iteration ``.first()`` — the only actions in the loop are
    the lineage-truncating localCheckpoints (every 2 rounds), not one
    driver round-trip per round.
    """
    from decimal import Decimal

    DEC = "decimal(38,18)"
    ids = vertices.select(F.col(id_col).cast("long").alias("id"))
    n = ids.count()
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .filter(F.col("src") != F.col("dst")).distinct())
    deg = e.groupBy("src").agg(F.count("*").cast("decimal(10,0)")
                               .alias("out_deg"))
    # (src, dst, out_deg) is loop-invariant: compute once, keep hot.
    adj = e.join(deg, "src").persist()
    adj.count()
    d = F.lit(Decimal(str(damping)))
    teleport = F.lit((Decimal(1) - Decimal(str(damping)))
                     / Decimal(n)).cast(DEC)
    init = F.lit(Decimal(1) / Decimal(n)).cast(DEC)
    zero = F.lit(Decimal(0)).cast(DEC)
    ranks = ids.select("id", init.alias("rank"))
    for i in range(n_iter):
        contrib = (adj.join(ranks.withColumnRenamed("id", "src"), "src")
                   .select(F.col("dst").alias("id"),
                           (F.col("rank") / F.col("out_deg")).cast(DEC)
                           .alias("w")))
        summed = contrib.groupBy("id").agg(F.sum("w").alias("in_w"))
        # dangling mass = Σ ranks of zero-out-deg nodes, folded back
        # in-plan: 1-row aggregate × ids (broadcast NL join of one row).
        dang = (ranks.join(deg.select(F.col("src").alias("id")),
                           "id", "left_anti")
                .agg(F.coalesce(F.sum("rank"), zero).alias("dangling")))
        ranks = (ids.join(summed, "id", "left")
                 .crossJoin(dang)
                 .select("id",
                         (teleport
                          + (d * F.col("dangling") / F.lit(n)).cast(DEC)
                          + (d * F.coalesce("in_w", zero)).cast(DEC))
                         .cast(DEC).alias("rank")))
        if (i + 1) % 2 == 0 and (i + 1) < n_iter:
            ranks = ranks.transform(_cut)
    out = ranks.select(F.col("id").alias(id_col),
                       F.col("rank").cast("double").alias("rank"))
    out = out.transform(_cut)  # materialize before freeing adj
    adj.unpersist()
    return out


def hits(vertices: DataFrame, edges: DataFrame,
         id_col: str = "doc_id",
         src: str = "src_doc_id", dst: str = "tgt_doc_id",
         n_iter: int = 8) -> DataFrame:
    """(id_col, hub, auth) after ``n_iter`` HITS iterations
    (Kleinberg 1999): auth(v) = Σ_{u→v} hub(u), hub(u) = Σ_{u→v}
    auth(v), each L1-normalized per half-step.  The complementary
    centrality to PageRank for crawl analysis: authorities are the
    pages good hubs point AT (fetch-priority candidates), hubs are the
    link-list pages worth re-crawling for discovery.

    Same determinism contract as :func:`pagerank`: score SUMS run in
    DECIMAL(38,18) (exact, aggregation-order-independent); the
    normalizing division is per-row double math by one scalar (see
    inline note), deterministic regardless of partitioning — the
    output is a fixed function of (graph, n_iter) and safe to freeze
    as a golden oracle.  L1 rather
    than the textbook L2 normalization keeps the arithmetic inside
    decimal (no sqrt) — scores are scale-factors of the L2 variant
    with identical RANKING per half-step.  The normalizer folds back
    as a 1-row crossJoin (no per-iteration driver action); lineage is
    truncated every 2 rounds.  Two shuffles per half-step, both keyed
    on uniform vertex ids."""
    from decimal import Decimal

    DEC = "decimal(38,18)"
    ids = vertices.select(F.col(id_col).cast("long").alias("id"))
    n = ids.count()
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .filter(F.col("src") != F.col("dst")).distinct().persist())
    e.count()
    init = F.lit(Decimal(1) / Decimal(n)).cast(DEC)
    zero = F.lit(Decimal(0)).cast(DEC)
    hub = ids.select("id", init.alias("hub"))
    auth = ids.select("id", zero.alias("auth"))

    def _half(scores, val, edge_key, group_key, out):
        raw = (e.join(scores.withColumnRenamed("id", edge_key)
                      .withColumnRenamed(val, "__v"), edge_key)
               .groupBy(group_key).agg(F.sum("__v").alias("raw")))
        tot = raw.agg(F.coalesce(F.sum("raw"), zero).alias("tot"))
        # The normalizing division runs in DOUBLE, not decimal: Spark's
        # decimal-division type rule truncates a (38,18)/(38,18)
        # quotient to scale 6 (precision overflow), a ppm-level
        # quantization.  Per-row IEEE division by a single scalar is
        # still a deterministic function of the inputs (the SUMS stay
        # exact decimal — that is where aggregation order lived), so
        # the golden-oracle contract holds.
        ratio = (F.coalesce("raw", zero).cast("double")
                 / F.col("tot").cast("double"))
        return (ids.join(raw.withColumnRenamed(group_key, "id"),
                         "id", "left")
                .crossJoin(tot)
                .select("id",
                        F.when(F.col("tot") > 0, ratio.cast(DEC))
                        .otherwise(zero).alias(out)))

    for i in range(n_iter):
        auth = _half(hub, "hub", "src", "dst", "auth")
        hub = _half(auth, "auth", "dst", "src", "hub")
        if (i + 1) % 2 == 0 and (i + 1) < n_iter:
            hub = hub.transform(_cut)
            auth = auth.transform(_cut)
    out = (hub.join(auth, "id")
           .select(F.col("id").alias(id_col),
                   F.col("hub").cast("double").alias("hub"),
                   F.col("auth").cast("double").alias("auth")))
    out = out.transform(_cut)  # materialize before freeing e
    e.unpersist()
    return out


def triangle_counts(edges: DataFrame, src: str = "src_doc_id",
                    dst: str = "tgt_doc_id") -> DataFrame:
    """Per-vertex triangle counts + local clustering coefficient via
    degree-ordered edge orientation (the compact-forward algorithm,
    Latapy 2008 — the standard way to count triangles on power-law
    graphs without a skew blowup).

    Every undirected edge is oriented from its lower-ranked to its
    higher-ranked endpoint, rank = (degree, id).  Under that
    orientation each vertex's OUT-neighborhood is O(sqrt(m)) even when
    its degree is huge — the hub that would explode a naive id-ordered
    wedge self-join holds almost no out-edges — so the wedge join's
    per-key fan-out is bounded and each triangle is found exactly once
    (at its lowest-ranked vertex).  Three shuffles total: the degree
    agg, the wedge self-join on u, and the closing join on (x, y);
    every key is uniform-or-bounded by construction.

    → (doc_id, degree, n_triangles, cc_bp) for every vertex incident
    to at least one edge; cc_bp = floor(2T/(d(d-1)) * 10000), exact
    integer arithmetic so any SQL engine reproduces it bit-for-bit.
    """
    a, b = F.col(src), F.col(dst)
    und = (edges.select(F.least(a, b).alias("a"),
                        F.greatest(a, b).alias("b"))
           .filter(F.col("a") != F.col("b")).distinct())
    deg = (und.select(F.col("a").alias("v"))
           .unionByName(und.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count("*").alias("d")))
    ed = (und
          .join(deg.select(F.col("v").alias("a"),
                           F.col("d").alias("da")), "a")
          .join(deg.select(F.col("v").alias("b"),
                           F.col("d").alias("db")), "b"))
    a_first = ((F.col("da") < F.col("db")) |
               ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))))
    fwd = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"))
    e1 = fwd.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    e2 = fwd.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    wedges = (e1.join(e2, "u")
              .filter((F.col("dx") < F.col("dy")) |
                      ((F.col("dx") == F.col("dy"))
                       & (F.col("x") < F.col("y")))))
    tri = wedges.join(fwd.select(F.col("u").alias("x"),
                                 F.col("v").alias("y")), ["x", "y"])
    per = (tri.select(F.explode(F.array("u", "x", "y")).alias("doc_id"))
           .groupBy("doc_id").agg(F.count("*").alias("n_triangles")))
    return (deg
            .join(per, deg["v"] == per["doc_id"], "left")
            .select(F.col("v").alias("doc_id"),
                    F.col("d").cast("long").alias("degree"),
                    F.coalesce("n_triangles", F.lit(0)).cast("long")
                    .alias("n_triangles"),
                    F.expr("coalesce(n_triangles, 0) * 20000 div "
                           "greatest(d * (d - 1), 1)").cast("long")
                    .alias("cc_bp")))


def label_propagation(vertices: DataFrame, edges: DataFrame,
                      id_col: str = "doc_id",
                      src: str = "src_doc_id", dst: str = "tgt_doc_id",
                      iters: int = 4) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007, the
    GraphFrames/Pregel formulation) → (id_col, community).

    Every vertex starts labelled with its own id; each of the
    ``iters`` synchronous rounds relabels every non-isolated vertex
    with the MODE of its neighbors' previous-round labels, ties broken
    by the SMALLEST label.  The deterministic tie-break (instead of
    the random pick of the original paper) makes the result
    reproducible and oracle-checkable by unrolling the same K rounds
    in SQL.  Isolated vertices keep their own label.

    The reference keeps no community structure at all (its graph
    analytics are client-side, frontend/index.html:92-140); this is
    the engine-side mirror-farm / site-family detector a corpus
    pipeline runs before per-community dedup.

    Physical shape per round: one shuffle join (labels ⋈ undirected
    edges on the neighbor key) + two hash aggregations — the
    (vertex, label) count collapses duplicate votes map-side, and the
    per-vertex argmax is ``max_by(lbl, (n, -lbl))``, an agg rather
    than a window, so there is no per-vertex sort and no skew blowup
    on hub vertices.  Labels are ``localCheckpoint``ed each round:
    fixed iteration count, flat lineage.
    """
    ce = _canon_edges(edges, src, dst).transform(_cut)  # one distinct
    und = (ce.select("u", "v")
           .unionByName(ce.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
           .transform(_cut))
    ids = vertices.select(F.col(id_col).cast("long").alias("id"))
    lbl = ids.select("id", F.col("id").alias("lbl"))
    for _ in range(iters):
        votes = (und.join(lbl.withColumnRenamed("id", "v"), "v")
                 .groupBy(F.col("u").alias("id"), "lbl")
                 .agg(F.count("*").alias("n")))
        best = (votes.groupBy("id")
                .agg(F.max_by(
                    "lbl", F.struct(F.col("n"), (-F.col("lbl")).alias("t"))
                ).alias("new_lbl")))
        lbl = (lbl.join(best, "id", "left")
               .select("id", F.coalesce("new_lbl", "lbl").alias("lbl"))
               .transform(_cut))
    return lbl.select(F.col("id").alias(id_col),
                      F.col("lbl").cast("long").alias("community"))


def _min_prop(ids: DataFrame, edges: DataFrame,
              max_iter: int = 200) -> DataFrame:
    """Directed min-label propagation to fixpoint: label(v) = min id u
    with a path u →* v over ``edges`` (src, dst).  Labels start at the
    vertex's own id and only ever decrease; the changed-row count
    rides the SAME action as the per-round localCheckpoint via
    ``Observation`` (per the repo's perf note: metrics must attach
    above the materialization), so each round costs exactly ONE job.
    Returns (id, lbl)."""
    from pyspark.sql import Observation

    lbl = ids.select("id", F.col("id").alias("lbl")).transform(_cut)
    for _ in range(max_iter):
        upd = (edges.join(lbl.withColumnRenamed("id", "src"), "src")
               .groupBy(F.col("dst").alias("id"))
               .agg(F.min("lbl").alias("in_lbl")))
        obs = Observation()
        nxt = (lbl.join(upd, "id", "left")
               .select("id",
                       F.least("lbl", F.coalesce("in_lbl", "lbl"))
                       .alias("lbl"),
                       (F.coalesce("in_lbl", "lbl") < F.col("lbl"))
                       .cast("long").alias("__chg"))
               .observe(obs, F.sum("__chg").alias("c"))
               .transform(_cut))
        lbl = nxt.select("id", "lbl")
        if not (obs.get["c"] or 0):
            return lbl
    raise RuntimeError(f"min-label propagation exceeded {max_iter} rounds")


def strongly_connected_components(vertices: DataFrame, edges: DataFrame,
                                  id_col: str = "doc_id",
                                  src: str = "src_doc_id",
                                  dst: str = "tgt_doc_id",
                                  max_rounds: int = 50) -> DataFrame:
    """(id_col, scc) over the DIRECTED graph — scc = min vertex id of
    the strongly connected component.  The bowtie decomposition query
    (Broder et al., "Graph structure in the Web", WWW 2000): CC says
    which pages touch, SCC says which pages form the mutually-
    reachable CORE vs the IN/OUT tendrils — the difference between "a
    link exists" and "link equity circulates".

    Algorithm: forward/backward min-label refinement WITH PEELING.
    Each round computes, within the unresolved subgraph, F(v) = min id
    reaching v and B(v) = min id v reaches (directed min-label
    propagation to fixpoint, Σlabel as the monotone convergence
    witness).  Vertices with F == B are FINALIZED as members of
    SCC(F) and leave the computation; the rest refine their group key
    to (F, B), edges crossing groups are dropped, and the next round
    runs on the (strictly smaller) remainder.

    Correctness: a path between two same-SCC vertices only ever
    visits that SCC (every intermediate vertex lies on a cycle
    through both), so group restriction never splits an SCC; and
    within a group where every vertex shares (f0, b0), F(b0) = f0
    forces f0 ≤ b0 while B(f0) = b0 forces b0 ≤ f0 — so a group with
    f0 = b0 has a vertex that reaches all members and is reached by
    all members: exactly an SCC, finalized safely.  Vertices with
    F ≠ B are NOT yet attributable (their pivot may lie outside the
    eventual SCC), hence the refine-and-rerun.

    Scale shape: every round is min-propagation joins shuffled on the
    edge endpoint keys (uniform by construction) with flat lineage
    (localCheckpoint per inner round).  The forward and backward
    propagations of a round are INDEPENDENT job chains, so they are
    submitted from two driver threads and run concurrently — on a
    cluster they interleave on free executor slots; on the iterative
    tail (tiny frames, fixed per-job overhead dominating) this halves
    the wall of every outer round.  Peeling makes round cost
    shrink geometrically on web-shaped graphs (the giant core and the
    tendril bulk finalize in the first two rounds — measured 97% of
    vertices by round 2 on the synthetic web); outer rounds ∝ peel
    depth, inner rounds ∝ subgraph diameter.  An adversarial
    10^10-edge chain would instead want single-machine Tarjan on the
    (tiny) contracted quotient graph, which the peeled remainder
    approaches round by round.
    """
    e = (edges.select(F.col(src).cast("long").alias("src"),
                      F.col(dst).cast("long").alias("dst"))
         .filter(F.col("src") != F.col("dst")).distinct()
         .transform(_cut))
    ids = (vertices.select(F.col(id_col).cast("long").alias("id"))
           .transform(_cut))
    resolved: list[DataFrame] = []
    from concurrent.futures import ThreadPoolExecutor
    for _ in range(max_rounds):
        rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_fut = pool.submit(_min_prop, ids, e)
            b_fut = pool.submit(_min_prop, ids, rev)
            fwd, bwd = f_fut.result(), b_fut.result()
        fb = (fwd.withColumnRenamed("lbl", "f")
              .join(bwd.withColumnRenamed("lbl", "b"), "id")
              .transform(_cut))
        resolved.append(fb.filter(F.col("f") == F.col("b"))
                        .select("id", F.col("f").alias("scc")))
        rest = fb.filter(F.col("f") != F.col("b"))
        ids = rest.select("id").transform(_cut)
        if ids.isEmpty():
            break
        # refine groups to (f, b); only intra-group edges survive
        key = rest.select("id", F.xxhash64("f", "b").alias("g"))
        e = (e.join(key.withColumnRenamed("id", "src")
                    .withColumnRenamed("g", "gs"), "src")
             .join(key.withColumnRenamed("id", "dst")
                   .withColumnRenamed("g", "gd"), "dst")
             .filter(F.col("gs") == F.col("gd"))
             .select("src", "dst")
             .transform(_cut))
    else:
        raise RuntimeError(
            f"SCC peeling did not finish in {max_rounds} rounds")
    out = resolved[0]
    for r in resolved[1:]:
        out = out.unionByName(r)
    return out.select(F.col("id").alias(id_col), "scc")


def kcore(vertices: DataFrame, edges: DataFrame, k: int = 3,
          rounds: int = 6, id_col: str = "doc_id",
          src: str = "src_doc_id", dst: str = "tgt_doc_id") -> DataFrame:
    """(id_col, core_deg) for vertices in the undirected k-core —
    the maximal subgraph where every vertex keeps degree ≥ k —
    ``core_deg`` being the vertex's degree WITHIN the core.  The
    classic dense-region extractor over a web graph: link farms and
    tightly-knit site families concentrate in high-k cores while
    tendrils and one-link pages peel away, so crawl planning reads it
    next to the bowtie regions (a growing k-core share of new pages
    flags spam-graph capture).

    Synchronous fixed-round peeling: each round drops every vertex
    whose degree among surviving vertices is < k, simultaneously
    (Matula & Beck's peeling restricted to one k).  ``rounds`` must
    reach the graph's peel depth for the output to be the true
    k-core; because peeling is monotone (the survivor set only
    shrinks, and a converged round is a no-op) running EXTRA rounds
    is always safe, so the contract query unrolls the same fixed
    count in SQL and a test pins that the last two rounds are
    already equal at the test scale.

    Scale shape: per round one endpoint-key shuffle (edges ⋉ alive on
    both ends, then a uniform-key degree agg); the alive set only
    shrinks, lineage stays flat via localCheckpoint.  Worst-case a
    chain graph peels one layer per round — the same adversarial
    caveat as SCC's peel depth, irrelevant on web-shaped graphs where
    low-degree mass leaves in the first round or two.
    """
    und0 = _canon_edges(edges, src, dst)
    und = (und0.select("u", "v")
           .unionByName(und0.select(F.col("v").alias("u"),
                                    F.col("u").alias("v")))
           .transform(_cut))
    alive = (vertices.select(F.col(id_col).cast("long").alias("id"))
             .distinct().transform(_cut))
    for _ in range(rounds):
        e2 = (und.join(alive.withColumnRenamed("id", "u"), "u", "semi")
              .join(alive.withColumnRenamed("id", "v"), "v", "semi"))
        deg = e2.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        alive = (deg.filter(F.col("d") >= k)
                 .select(F.col("u").alias("id")).transform(_cut))
    final = (und.join(alive.withColumnRenamed("id", "u"), "u", "semi")
             .join(alive.withColumnRenamed("id", "v"), "v", "semi")
             .groupBy("u").agg(F.count(F.lit(1)).cast("long")
                               .alias("core_deg")))
    return final.select(F.col("u").alias(id_col), "core_deg")


def bowtie_classify(vertices: DataFrame, edges: DataFrame,
                    id_col: str = "doc_id",
                    src: str = "src_doc_id",
                    dst: str = "tgt_doc_id") -> DataFrame:
    """The full Broder bowtie taxonomy (WWW 2000) — ``(id_col, scc,
    region)`` with region ∈ CORE | IN | OUT | TENDRIL | DISC:

    * CORE    — the largest SCC (ties broken by smallest SCC label:
                deterministic, oracle-checkable),
    * IN      — reaches the core but is not in it,
    * OUT     — reached from the core but not in it,
    * TENDRIL — weakly connected to the core, neither reaches nor is
                reached (includes the paper's tubes — distinguishing
                them needs nothing new, but the 5-way split is what
                crawl planning consumes),
    * DISC    — not even weakly connected to the core.

    Composition of the module's own primitives: one SCC run, two
    directed BFS closures from the core (forward and on reversed
    edges — ``bfs_depths``, one frontier shuffle per level), one
    undirected CC for weak connectivity.  Crawl planning reads this
    table directly: IN pages are seed candidates (they feed the
    core), OUT growth signals a crawl escaping into link farms, a
    shrinking CORE share flags frontier starvation.

    Assembly shape: the four memberships are stacked as (id,
    priority) rows and reduced with ONE min-aggregate, then joined to
    the SCC table once — a single shuffle on id.  (The obvious
    alternative — left-joining the four membership frames one by one —
    is both a worse distributed plan (4 joins) and pathological to
    compile on Spark 4.1: the chained same-key joins over
    checkpointed frames drove driver-side query compilation to ~60 s
    vs 1.7 s for this shape, measured at sf0.01.)
    """
    scc = strongly_connected_components(vertices, edges, id_col=id_col,
                                        src=src, dst=dst)
    scc = scc.transform(_cut)
    # largest SCC, smallest label on ties — a 1-row dim
    core_lbl = (scc.groupBy("scc").agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.col("n").desc(), F.col("scc").asc())
                .limit(1).select(F.col("scc").alias("core")))
    core_members = (scc.join(F.broadcast(core_lbl),
                             scc["scc"] == F.col("core"))
                    .select(F.col(id_col)).transform(_cut))
    # the forward closure, backward closure, and weak-CC runs are
    # independent job chains — submit them from three driver threads
    # (same rationale as the SCC round's concurrent F/B propagation)
    from concurrent.futures import ThreadPoolExecutor
    rev_edges = edges.select(F.col(dst).alias(src), F.col(src).alias(dst))
    with ThreadPoolExecutor(max_workers=3) as pool:
        f_fut = pool.submit(bfs_depths, edges, core_members, src=src,
                            dst=dst, id_col=id_col, max_depth=1 << 20)
        b_fut = pool.submit(bfs_depths, rev_edges, core_members, src=src,
                            dst=dst, id_col=id_col, max_depth=1 << 20)
        w_fut = pool.submit(connected_components, vertices, edges,
                            id_col=id_col, src=src, dst=dst)
        fwd = f_fut.result().select(id_col)
        bwd = b_fut.result().select(id_col)
        weak = w_fut.result().transform(_cut)
    core_weak = (weak.join(core_members, id_col)
                 .select(F.col("component")).distinct())
    tendril = (weak.join(F.broadcast(core_weak.withColumnRenamed(
                   "component", "__wc")),
                   F.col("component") == F.col("__wc"))
               .select(id_col))
    # membership stack: CORE ⊂ fwd ∩ bwd ⊂ tendril's weak component —
    # min priority picks the strongest region in one aggregate
    tags = (core_members.select(id_col, F.lit(0).alias("__p"))
            .unionByName(bwd.select(id_col, F.lit(1).alias("__p")))
            .unionByName(fwd.select(id_col, F.lit(2).alias("__p")))
            .unionByName(tendril.select(id_col, F.lit(3).alias("__p"))))
    best = tags.groupBy(id_col).agg(F.min("__p").alias("__p"))
    return (scc.join(best, id_col, "left")
            .select(id_col, "scc",
                    F.when(F.col("__p") == 0, "CORE")
                    .when(F.col("__p") == 1, "IN")
                    .when(F.col("__p") == 2, "OUT")
                    .when(F.col("__p") == 3, "TENDRIL")
                    .otherwise("DISC").alias("region")))


def _hex16(col):
    """Integer in [0, 65535] from the first 4 hex chars of md5 —
    cross-engine: ``instr``/``strpos`` over the hex alphabet and plain
    integer arithmetic reproduce bit-for-bit anywhere (Spark has
    ``conv``; DuckDB doesn't — this shared recipe avoids it)."""
    h = F.md5(col)
    alpha = F.lit("0123456789abcdef")
    digit = [F.instr(alpha, F.substring(h, i, 1)) - 1 for i in (1, 2, 3, 4)]
    return (digit[0] * 4096 + digit[1] * 256 + digit[2] * 16
            + digit[3]).cast("long")


def random_walks(edges: DataFrame, seeds: DataFrame, length: int = 4,
                 n_walks: int = 2,
                 src: str = "src_doc_id", dst: str = "tgt_doc_id",
                 id_col: str = "doc_id") -> DataFrame:
    """Deterministic hash-seeded random walks — the DeepWalk /
    node2vec(p=q=1) corpus generator (Perozzi et al., KDD'14): the
    walk sequences ARE the training sentences a skip-gram graph
    embedding consumes, so emitting them at corpus scale is a
    first-class pipeline op.  Returns ``(walk_id, step, vertex)`` for
    ``n_walks`` walks of up to ``length`` steps from every seed
    vertex; a walk that reaches a sink (no out-edges) simply ends —
    its later steps are absent, like a sentence that ran out of words.

    "Random" is a hash: step t of walk w moves to the neighbor at
    index ``hex16(md5(w || ':' || t)) mod out_degree`` in the
    dst-sorted adjacency list.  Deterministic across runs, cluster
    sizes, and engines (the oracle unrolls the same arithmetic), yet
    distributionally uniform per step — the property embedding
    training actually needs, and reproducible-pipeline practice
    besides.

    Physical shape — the part that survives 10^10 edges: the adjacency
    is materialized ONCE as ``(src, idx, dst, deg)`` (row_number over
    a src-partitioned window + a broadcast-free self-agg), and each
    step moves exactly ONE row per live walk through an equi-join on
    ``(src, idx)`` — a hub with 10^6 out-links costs the same as a
    leaf because the walk picks its index BEFORE the join, never
    fanning out edges-per-walk.  Per step: one shuffle of |walks|
    rows; lineage stays flat via localCheckpoint."""
    from pyspark.sql import Window

    nbr = (edges.select(F.col(src).cast("long").alias("__s"),
                        F.col(dst).cast("long").alias("__t"))
           .distinct()
           .withColumn("idx", F.row_number().over(
               Window.partitionBy("__s").orderBy("__t")))
           .persist())
    deg = nbr.groupBy("__s").agg(F.max("idx").alias("deg"))

    cur = (seeds.select(F.col(id_col).cast("long").alias("v"))
           .distinct()
           .crossJoin(F.broadcast(
               seeds.sparkSession.range(n_walks).select(
                   F.col("id").alias("rep"))))
           .select(F.concat(F.col("v").cast("string"), F.lit(":"),
                            F.col("rep").cast("string")).alias("walk_id"),
                   "v")
           .transform(_cut))
    out = cur.select("walk_id", F.lit(0).cast("int").alias("step"),
                     F.col("v").alias("vertex"))
    for t in range(1, length + 1):
        coin = _hex16(F.concat(F.col("walk_id"), F.lit(f":{t}")))
        cur = (cur.join(deg, cur.v == deg["__s"])
               .withColumn("idx", (coin % F.col("deg") + 1).cast("int"))
               .join(nbr, ["__s", "idx"])
               .select("walk_id", F.col("__t").alias("v"))
               .transform(_cut))
        out = out.unionByName(
            cur.select("walk_id", F.lit(t).cast("int").alias("step"),
                       F.col("v").alias("vertex")))
    nbr.unpersist()
    return out


def ra_link_predict(edges: DataFrame, src: str = "src_doc_id",
                    dst: str = "tgt_doc_id", min_common: int = 2,
                    deg_cap: int = 64, topk: int = 500) -> DataFrame:
    """Link prediction by the resource-allocation index (Zhou, Lü &
    Zhang 2009 — the strongest of the classic local similarity
    indices): for a NON-adjacent pair (a, b), RA = Σ_{z ∈ N(a)∩N(b)}
    1/deg(z).  A crawl pipeline uses it to propose likely-missing
    edges (frontier seeding, related-pages) from graph structure
    alone.  Adamic-Adar's 1/log(deg) needs floats; 1/deg is the
    published alternative with the same hub-discounting intent and an
    EXACT integer form: weight = 10^6 div deg(z), summed as ppm.

    Scale shape: wedges enumerate through the common neighbor z, so
    the self-join fan-out is sum(deg(z)²) — a hub z would dominate,
    but its wedges carry weight 1/deg(z) → ~0, so RA deployments cap
    the center degree.  ``deg_cap`` applies that cut BEFORE the join
    (z with deg > cap contributes < 10^6/cap ppm per wedge), bounding
    worst-case pair output at |V|·cap² independent of skew — the
    mirror-hosts ubiquity-cap argument.  Degrees come from one
    map-side-combined agg co-partitioned with the wedge join's key;
    known edges drop via left-anti on the pair key; top-k is
    TakeOrderedAndProject, never a global sort."""
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = (fwd.union(fwd.select(F.col("v").alias("u"),
                                F.col("u").alias("v")))
           .filter(F.col("u") != F.col("v")).distinct())
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    center = (und.join(deg, "u")
              .filter(F.col("deg") <= deg_cap)
              .withColumn("w", F.expr("1000000L div deg")))
    a = center.select("u", F.col("v").alias("a"), "w")
    b = center.select("u", F.col("v").alias("b"))
    wedges = (a.join(b, "u")
              .filter(F.col("a") < F.col("b"))
              .groupBy("a", "b")
              .agg(F.count(F.lit(1)).alias("n_common"),
                   F.sum("w").cast("long").alias("ra_ppm")))
    adj = (und.filter(F.col("u") < F.col("v"))
           .select(F.col("u").alias("a"), F.col("v").alias("b")))
    return (wedges.join(adj, ["a", "b"], "left_anti")
            .filter(F.col("n_common") >= min_common)
            .orderBy(F.desc("ra_ppm"), F.asc("a"), F.asc("b"))
            .limit(topk))


def modularity_by_community(vertices: DataFrame, edges: DataFrame,
                            labels: DataFrame,
                            id_col: str = "doc_id",
                            src: str = "src_doc_id",
                            dst: str = "tgt_doc_id") -> DataFrame:
    """Per-community modularity decomposition (Newman & Girvan 2004)
    over the undirected simple graph — the QUALITY metric for a
    community assignment, computed in exact integer arithmetic so a
    SQL oracle reproduces it bit-for-bit.

    With m undirected edges, community c holding e_c internal edges
    and total incident degree deg_c, the modularity contribution is
    e_c/m − (deg_c/2m)².  Scaled by 4m² that is the integer

        q_num = 4·m·e_c − deg_c²      (Q = Σ_c q_num / (4m²))

    so no float division ever happens; the caller recovers Q when it
    wants a float.  ``labels`` is any (id_col, community) frame —
    label-propagation output here, but the metric is
    assignment-agnostic (the mirror-farm detector's acceptance test).

    Physical shape at 10^10 edges: the internal-edge count is two
    shuffle joins of the edge list against the labels (uniform doc-id
    keys) + one community-key agg; the degree branch is one agg off
    the shared undirected view; m rides a 1-row aggregate broadcast
    (constant-size build at any scale).  No window, no driver
    materialization; hot communities are absorbed by map-side partial
    aggregation.  Returns (community, n_members, n_internal, deg_sum,
    m_edges, q_num).
    """
    ce = _canon_edges(edges, src, dst).transform(_cut)
    und = ce.select("u", "v").unionByName(
        ce.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("id")).agg(
        F.count(F.lit(1)).alias("deg"))
    lbl = labels.select(F.col(id_col).cast("long").alias("id"),
                        F.col("community").cast("long").alias("community"))
    # internal edges: both endpoints carry the same label
    lu = lbl.select(F.col("id").alias("u"), F.col("community").alias("cu"))
    lv = lbl.select(F.col("id").alias("v"), F.col("community").alias("cv"))
    internal = (ce.join(lu, "u").join(lv, "v")
                .filter(F.col("cu") == F.col("cv"))
                .groupBy(F.col("cu").alias("community"))
                .agg(F.count(F.lit(1)).alias("n_internal")))
    per_comm = (lbl.join(deg, "id", "left")
                .groupBy("community")
                .agg(F.count(F.lit(1)).alias("n_members"),
                     F.sum(F.coalesce("deg", F.lit(0)))
                      .cast("long").alias("deg_sum")))
    m_row = ce.agg(F.count(F.lit(1)).cast("long").alias("m_edges"))
    return (per_comm
            .join(internal, "community", "left")
            .withColumn("n_internal",
                        F.coalesce("n_internal", F.lit(0)).cast("long"))
            .crossJoin(F.broadcast(m_row))
            .select("community",
                    F.col("n_members").cast("long").alias("n_members"),
                    "n_internal", "deg_sum", "m_edges",
                    (F.lit(4) * F.col("m_edges") * F.col("n_internal")
                     - F.col("deg_sum") * F.col("deg_sum"))
                    .cast("long").alias("q_num")))


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          rounds: int = 4, scale: int = 10 ** 12,
                          src: str = "src_doc_id",
                          dst: str = "tgt_doc_id",
                          seed_col: str = "seed_seq") -> DataFrame:
    """Personalized PageRank from a seed set in EXACT integer
    arithmetic — the focused-crawl prioritizer (Haveliwala, WWW'02):
    mass teleports back to the SEEDS instead of uniformly, so scores
    rank pages by relevance to the crawl's topic entry points rather
    than global authority (E10's complement; the reference keeps no
    ranking at all — its graph analytics are client-side,
    frontend/index.html:92-140).

    Determinism discipline: ranks are integer micro-mass units
    (``scale`` total), every division is integer ``div`` on
    non-negative values (identical truncation in Spark and DuckDB),
    dangling/rounding mass evaporates rather than being redistributed
    — with a fixed round count the recurrence itself is the spec, so
    a SQL oracle unrolls it bit-for-bit:

        r_0(s)  = scale div |S|                        (s ∈ S)
        inc(v)  = Σ_{u→v} r(u) div outdeg(u)
        r'(v)   = 85·inc(v) div 100  +  [v ∈ S]·tele,
        tele    = (15·scale div 100) div |S|

    Physical shape per round: ONE shuffle join (ranks ⋈ edges on the
    uniform src key — rank rows are the sparse reached set, far
    smaller than |V| in early waves) + one dst-key agg; the seed
    teleport is a unionByName folded into the same agg, so no second
    shuffle.  Ranks are localCheckpointed per round: flat lineage at
    any round count.  Returns (doc_id, ppr) for reached pages
    (ppr > 0) — the sparse frontier-priority dim a scheduler joins
    against pending URLs.
    """
    e = (edges.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"))
         .distinct().transform(_cut))
    out = e.groupBy("u").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = e.join(out, "u").transform(_cut)
    s = seeds.select(F.col(seed_col).cast("long").alias("id")).distinct()
    n_seeds = s.count()
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: empty seed set")
    tele = (15 * scale // 100) // n_seeds
    r = s.select("id", F.lit(scale // n_seeds).cast("long").alias("ppr"))
    for _ in range(rounds):
        inc = (ew.join(r.withColumnRenamed("id", "u"), "u")
               .select(F.col("v").alias("id"),
                       F.expr("ppr div outdeg").alias("m"))
               .groupBy("id").agg(F.sum("m").alias("inc")))
        r = (inc.select("id", F.expr("85 * inc div 100").alias("ppr"))
             .unionByName(s.select("id", F.lit(tele).alias("ppr")))
             .groupBy("id")
             .agg(F.sum("ppr").cast("long").alias("ppr"))
             .transform(_cut))
    return (r.filter(F.col("ppr") > 0)
            .select(F.col("id").alias("doc_id"), "ppr"))


def opic_importance(edges: DataFrame, vertices: DataFrame,
                    rounds: int = 4, scale: int = 10 ** 12,
                    id_col: str = "doc_id",
                    src: str = "src_doc_id",
                    dst: str = "tgt_doc_id") -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda &
    Cobena, WWW'03) in EXACT integer arithmetic: the crawl-NATIVE
    importance estimator.  PageRank (E10) needs the whole graph and
    iterates to convergence offline; OPIC is the scheduler's online
    form — every page holds *cash*, distributes it to its out-links
    when visited, and banks the distributed amount in its *history*;
    ``importance ≈ history + cash`` at any point, so the frontier can
    be priority-ordered while the crawl is still discovering the
    graph.  This batch form plays one synchronous distribution round
    per crawl wave (the paper's "Greedy off-line" schedule).

    Determinism discipline (matches :func:`personalized_pagerank`):
    integer micro-cash units (``scale`` total), every division an
    integer ``div`` on non-negative values, per-node rounding
    remainders evaporate.  Dangling pages bank their cash to the
    paper's VIRTUAL page, which redistributes ``D div n`` to every
    page next round (the remainder ``D mod n`` evaporates too) — with
    a fixed round count the recurrence is the spec and a SQL oracle
    unrolls it bit-for-bit:

        c_0(v)  = scale div n,   h_0(v) = 0
        D       = Σ_{outdeg(u) = 0} c(u)
        inc(v)  = Σ_{u→v} c(u) div outdeg(u)
        h'(v)   = h(v) + c(v)
        c'(v)   = inc(v) + D div n

    Physical shape per round: ONE shuffle join (cash ⋈ edges on the
    uniform src key) + one dst-key agg for ``inc``; the dangling mass
    is a 1-row aggregate crossed back on (IdentityBroadcastMode — the
    allowlisted 1-row-dim shape), so no second fact shuffle.  State is
    localCheckpointed per round: flat lineage at any round count.
    Targets that are not in ``vertices`` are dropped by the state
    rebuild (their received cash evaporates — deterministic, mirrored
    by the oracle's ``FROM state LEFT JOIN inc``).

    → ``(doc_id, cash, hist, importance)`` for all vertices, where
    ``importance = hist + cash`` is the frontier-priority key.

    Reference analog: none — engine extension (the reference keeps no
    ranking; its frontier is FIFO, pkg/crawler/crawler.go).
    """
    e = (edges.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"))
         .distinct().transform(_cut))
    out = e.groupBy("u").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = e.join(out, "u").transform(_cut)
    n = vertices.select(F.col(id_col).cast("long").alias("id")) \
                .distinct().count()
    if n == 0:
        raise ValueError("opic_importance: empty vertex set")
    st = (vertices.select(F.col(id_col).cast("long").alias("id"))
          .distinct()
          .select("id", F.lit(scale // n).cast("long").alias("cash"),
                  F.lit(0).cast("long").alias("hist"))
          .transform(_cut))
    for _ in range(rounds):
        d_row = (st.join(out, st["id"] == out["u"], "left")
                 .filter(F.col("outdeg").isNull())
                 .agg(F.coalesce(F.sum("cash"), F.lit(0))
                      .cast("long").alias("d")))
        inc = (ew.join(st.select(F.col("id").alias("u"), "cash"), "u")
               .select(F.col("v").alias("id"),
                       F.expr("cash div outdeg").alias("m"))
               .groupBy("id").agg(F.sum("m").cast("long").alias("inc")))
        st = (st.join(inc, "id", "left")
              .crossJoin(F.broadcast(d_row))
              .select("id",
                      (F.coalesce(F.col("inc"), F.lit(0))
                       + F.expr(f"d div {n}")).cast("long").alias("cash"),
                      (F.col("hist") + F.col("cash")).cast("long")
                      .alias("hist"))
              .transform(_cut))
    return st.select(F.col("id").alias("doc_id"), "cash", "hist",
                     (F.col("hist") + F.col("cash")).cast("long")
                     .alias("importance"))


def reciprocity(edges: DataFrame, groups: DataFrame,
                src: str = "src_doc_id", dst: str = "tgt_doc_id",
                group_col: str = "host") -> DataFrame:
    """Per-group directed-edge reciprocity — the share of edges whose
    reverse edge also exists (Broder et al. 2000 report it as a basic
    shape statistic of the web graph; a high-reciprocity host cluster
    is the navigational-template / link-exchange signal spam triage
    keys on, the directed complement to ``dedup_mirror_hosts``).

    ``groups`` maps source vertices to a group key (e.g. doc_id →
    host).  Self-loops are excluded (a loop is trivially its own
    reverse).  Returns (group, n_edges, n_recip, recip_bp) with the
    ratio floored to integer basis points.

    Scale shape: one distinct on the (src, dst) pair, one self-join
    against the reversed pair — both on the same uniform composite
    key, so the second join reuses the first's hash partitioning —
    then one group join + map-side-combinable aggregation.  No window,
    no driver materialization; 10^10 edges is two pair-key shuffles.
    """
    e = (edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
         .filter(F.col("s") != F.col("t")).distinct())
    rev = e.select(F.col("t").alias("s"), F.col("s").alias("t"),
                   F.lit(1).alias("__rev"))
    flagged = e.join(rev, ["s", "t"], "left")
    g = groups.select(F.col(src).alias("s"), group_col)
    return (flagged.join(g, "s")
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_edges"),
                 F.count("__rev").alias("n_recip"))
            .withColumn("recip_bp",
                        F.expr("n_recip * 10000 div n_edges")))


def hyperball(edges: DataFrame, vertices: DataFrame,
              id_col: str = "doc_id",
              src: str = "src_doc_id", dst: str = "tgt_doc_id",
              n_hops: int = 3) -> DataFrame:
    """(id_col, n_regs, s2, n_ball) — HyperBall / HyperANF (Boldi,
    Rosa & Vigna, WSDM'11 / WWW'14): per-node HyperLogLog sketches of
    the OUT-reachability ball within ``n_hops``, the algorithm behind
    neighborhood-function / effective-diameter statistics on web-scale
    graphs (exact per-node ball sizes need |V|·ball pairs — 10^14+ at
    the reference's ambition; HyperBall holds 64 integer registers per
    node whatever the ball size).

    Register semantics make this cross-engine EXACT: HLL of a set is
    the register-wise max over its members' singleton sketches, and
    ball membership is plain bounded reachability — so a SQL oracle
    can rebuild every register from a recursive CTE plus the shared
    hex16 md5 recipe (functions/stats.py:hll_distinct) and match every
    estimate bit-for-bit.  B_0(v) = {v}; each round is the register
    relaxation B_t(v) = B_{t-1}(v) ∪ ⋃_{v→w} B_{t-1}(w), i.e. one
    equi-join (edges, pre-partitioned on ``dst`` once and persisted,
    ship each node's registers to its in-neighbors) + one
    groupBy(node, register).max — map-side partial max absorbs
    high-in-degree hubs before the shuffle.  State stays SPARSE (only
    touched registers exist; absent registers fold in arithmetically
    at the final estimate, same as hll_distinct) and is
    ``localCheckpoint``ed per round so lineage never re-derives
    earlier rounds.  Early exit when Σ M stops growing (register
    values only ever increase, and any change strictly increases the
    sum — a saturated ball terminates before ``n_hops``).

    Ball MEMBERSHIP is the ``vertices`` set (only vertices carry
    singleton seeds, only vertices are reported), but PATHS may pass
    through nodes outside it — an outside node relays whatever
    registers reach it, each physical edge costing one hop, exactly
    like the oracle's recursive step (the contract graph's endpoints
    are all pages so the distinction is moot there).  Raw estimator
    only —
    same ±13%·√m zone and <2.5·m overestimate caveat as
    hll_distinct; what is pinned is determinism and the register
    algebra, certified by the oracle's exact recursive-CTE rebuild.
    """
    e, base, state = _hll_seed(edges, vertices, id_col, src, dst)
    prev_mass = None
    for _ in range(n_hops):
        state = _hll_relax(e, state)
        mass = state.agg(F.sum("M")).collect()[0][0]
        if mass == prev_mass:
            break
        prev_mass = mass
    out = _hll_estimate(state, base, id_col)
    e.unpersist()
    return out


def _hll_seed(edges: DataFrame, vertices: DataFrame, id_col: str,
              src: str, dst: str):
    """(persisted dst-partitioned edges, vertex base, B_0 register
    state) — the shared HyperBall setup; see :func:`hyperball`."""
    from web_graph_spark.functions.stats import HLL_M, HLL_WBITS, _hexchunk

    e = (edges.select(F.col(src).cast("long").alias("__s"),
                      F.col(dst).cast("long").alias("__t"))
         .filter(F.col("__s") != F.col("__t"))
         .distinct().repartition("__t").persist())
    h = F.md5(F.col("__v").cast("string"))
    w = _hexchunk(h, 5) * 65536 + _hexchunk(h, 9)
    base = (vertices.select(F.col(id_col).cast("long").alias("__v"))
            .distinct())
    state = (base
             .select("__v",
                     (_hexchunk(h, 1) % HLL_M).cast("int").alias("j"),
                     (F.lit(HLL_WBITS + 1)
                      - F.when(w == F.lit(0), F.lit(0))
                         .otherwise(F.length(F.bin(w))))
                     .cast("int").alias("M"))
             .transform(_cut))
    return e, base, state


def _hll_relax(e: DataFrame, state: DataFrame) -> DataFrame:
    """One HyperBall round: B_t(v) = B_{t-1}(v) ∪ ⋃_{v→w} B_{t-1}(w)
    as register-wise max; checkpointed so lineage stays flat."""
    msgs = (e.join(state.withColumnRenamed("__v", "__t"), "__t")
            .select(F.col("__s").alias("__v"), "j", "M"))
    return (state.unionByName(msgs)
            .groupBy("__v", "j").agg(F.max("M").alias("M"))
            .transform(_cut))


def _hll_estimate(state: DataFrame, base: DataFrame,
                  id_col: str) -> DataFrame:
    """(id_col, n_regs, s2, n_ball) — the hll_distinct fold over a
    register state, restricted to the vertex base."""
    from web_graph_spark.functions.stats import HLL_M, HLL_WBITS, _HLL_NUM

    return (state.join(base, "__v", "semi").groupBy("__v")
            .agg(F.sum(F.expr(
                f"shiftleft(cast(1 as bigint), {HLL_WBITS + 1} - M)"))
                 .alias("s_present"),
                 F.count(F.lit(1)).cast("long").alias("n_regs"))
            .select(F.col("__v").alias(id_col), "n_regs",
                    (F.col("s_present")
                     + (F.lit(HLL_M) - F.col("n_regs"))
                     * F.lit(1 << (HLL_WBITS + 1))).alias("s2"))
            .select(id_col, "n_regs", "s2",
                    F.expr(f"{_HLL_NUM} div (1000 * s2)")
                    .alias("n_ball")))


def harmonic_hyperball(edges: DataFrame, vertices: DataFrame,
                       id_col: str = "doc_id",
                       src: str = "src_doc_id",
                       dst: str = "tgt_doc_id",
                       n_hops: int = 3) -> DataFrame:
    """(id_col, n_ball, h_lcm) — harmonic centrality from HyperBall
    deltas (Boldi & Vigna, "In-Core Computation of Geometric
    Centralities with HyperBall", ICDMW'13): H(v) = Σ_u 1/d(v,u)
    estimated as Σ_t (n_t(v) − n_{t−1}(v)) / t over the per-round ball
    estimates, truncated at ``n_hops`` — the centrality a 10^10-node
    graph can actually afford (exact H needs all-pairs distances).

    Exact integer arithmetic end-to-end: the score is reported in
    1/lcm(1..n_hops) units (n_hops=3 → sixths: 6·Δ₁ + 3·Δ₂ + 2·Δ₃),
    and the per-round estimates n_t are the same deterministic
    register folds as :func:`hyperball` — so a SQL oracle re-derives
    every score bit-for-bit from a min-distance recursive CTE + the
    hex16 register rebuild at each t.  Ball estimates are monotone in
    t (registers only grow), so every delta is ≥ 0.

    Same physical loop as :func:`hyperball` (the per-round estimate
    is one extra fold over the already-checkpointed state — a
    dim-sized job, no extra fact shuffle); early exit on register-
    mass saturation pads the remaining rounds with zero deltas."""
    import math

    lcm = math.lcm(*range(1, n_hops + 1))
    e, base, state = _hll_seed(edges, vertices, id_col, src, dst)
    est = [_hll_estimate(state, base, id_col)
           .select(id_col, F.lit(0).alias("__t"), "n_ball")]
    prev_mass = None
    for t in range(1, n_hops + 1):
        state = _hll_relax(e, state)
        est.append(_hll_estimate(state, base, id_col)
                   .select(id_col, F.lit(t).alias("__t"), "n_ball"))
        mass = state.agg(F.sum("M")).collect()[0][0]
        if mass == prev_mass:
            # saturated: rounds t+1..n_hops would be identical — pad
            # with the same fold so every delta past t is exactly 0
            for t2 in range(t + 1, n_hops + 1):
                est.append(_hll_estimate(state, base, id_col)
                           .select(id_col, F.lit(t2).alias("__t"),
                                   "n_ball"))
            break
        prev_mass = mass
    prof = est[0]
    for df in est[1:]:
        prof = prof.unionByName(df)
    n_at = [F.max(F.when(F.col("__t") == t, F.col("n_ball")))
            for t in range(n_hops + 1)]
    h = sum((F.lit(lcm // t) * (n_at[t] - n_at[t - 1])
             for t in range(1, n_hops + 1)), F.lit(0))
    out = (prof.groupBy(id_col)
           .agg(n_at[n_hops].cast("long").alias("n_ball"),
                h.cast("long").alias("h_lcm")))
    e.unpersist()
    return out


def neighborhood_function(edges: DataFrame, vertices: DataFrame,
                          id_col: str = "doc_id",
                          src: str = "src_doc_id",
                          dst: str = "tgt_doc_id",
                          n_hops: int = 3,
                          eff_bp: int = 9000) -> DataFrame:
    """(t, n_pairs, frac_bp, is_effective) — the neighborhood function
    N(t) = |{(v,u) : d(v,u) ≤ t}| and the effective-diameter flag (the
    first t whose N(t) reaches ``eff_bp``/10⁴ of N(n_hops)) — the
    global graph-shape summary HyperANF was built for (Boldi-Rosa-
    Vigna; Broder et al.'s "how far apart is the web" question).
    N(t) sums the per-node HyperBall estimates, so it inherits their
    exact integer determinism; ``frac_bp`` is integer basis points of
    the truncated-horizon total (a true N(∞) fraction would need the
    full diameter — the truncation is the documented HyperANF
    practice).  Same loop as :func:`hyperball`; each round adds one
    dim-sized fold + a 1-row sum, and early exit pads saturated
    rounds (their N(t) is by then constant)."""
    e, base, state = _hll_seed(edges, vertices, id_col, src, dst)

    def total(st):
        return (_hll_estimate(st, base, id_col)
                .agg(F.sum("n_ball")).collect()[0][0] or 0)

    ns = [total(state)]
    prev_mass = None
    for _ in range(n_hops):
        state = _hll_relax(e, state)
        ns.append(total(state))
        mass = state.agg(F.sum("M")).collect()[0][0]
        if mass == prev_mass:
            ns.extend([ns[-1]] * (n_hops - (len(ns) - 1)))
            break
        prev_mass = mass
    e.unpersist()
    spark = edges.sparkSession
    horizon = ns[n_hops]
    rows = []
    eff_found = False
    for t, n in enumerate(ns):
        frac = n * 10000 // horizon if horizon else 0
        is_eff = (not eff_found) and frac >= eff_bp
        eff_found = eff_found or is_eff
        rows.append((t, int(n), int(frac), bool(is_eff)))
    return spark.createDataFrame(
        rows, "t int, n_pairs long, frac_bp long, is_effective boolean")


def ktruss(edges: DataFrame, k: int = 4, rounds: int = 6,
           src: str = "src_doc_id", dst: str = "tgt_doc_id") -> DataFrame:
    """(u, v, support) — edges of the undirected k-truss (Cohen 2008):
    the maximal subgraph where every EDGE sits in ≥ k−2 triangles
    within the subgraph, with ``support`` the edge's settled triangle
    count.  The edge-grained sharpening of :func:`kcore` (a k-truss is
    always inside the (k−1)-core): link farms that inflate degree
    without closing triangles pass a core filter but fail truss — the
    standard spam/community-core refinement on web graphs.

    Synchronous fixed-round support peeling, same contract as
    :func:`kcore`: each round enumerates triangles among surviving
    edges ((a<b)(b<c)(a<c) id-oriented joins — two edge-key shuffles),
    counts per-edge support with map-side partials, and drops every
    edge under k−2 SIMULTANEOUSLY.  Peeling is monotone, a converged
    round is a no-op, so extra rounds are always safe and the oracle
    unrolls the same fixed count in SQL; a test pins last-two-rounds
    equality at the contract scale.  (At 10^10 edges the enumeration
    inside each round would orient by (degree, id) as
    :func:`triangle_counts` does — id-orientation is kept here for
    byte-exact oracle replay; the peeling semantics are identical.)
    """
    e = _canon_edges(edges, src, dst).transform(_cut)

    def support(ed: DataFrame) -> DataFrame:
        ab = ed.select(F.col("u").alias("a"), F.col("v").alias("b"))
        bc = ed.select(F.col("u").alias("b"), F.col("v").alias("c"))
        ac = ed.select(F.col("u").alias("a"), F.col("v").alias("c"))
        tri = ab.join(bc, "b").join(ac, ["a", "c"])
        return (tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
                .unionByName(tri.select(F.col("b").alias("u"),
                                        F.col("c").alias("v")))
                .unionByName(tri.select(F.col("a").alias("u"),
                                        F.col("c").alias("v")))
                .groupBy("u", "v").agg(F.count(F.lit(1)).alias("s")))
    for _ in range(rounds):
        e = (e.join(support(e), ["u", "v"], "left")
             .filter(F.coalesce(F.col("s"), F.lit(0)) >= k - 2)
             .select("u", "v").transform(_cut))
    return (e.join(support(e), ["u", "v"], "left")
            .select("u", "v",
                    F.coalesce(F.col("s"), F.lit(0)).cast("long")
                    .alias("support")))


def sssp(edges: DataFrame, seeds: DataFrame, weight: str = "w",
         src: str = "src_doc_id", dst: str = "tgt_doc_id",
         id_col: str = "doc_id", rounds: int = 8) -> DataFrame:
    """(id_col, dist) — single-source (multi-seed) shortest path over
    non-negative INTEGER edge weights: synchronous Bellman-Ford,
    ``rounds`` relaxations, so the result is exact over every path of
    ≤ ``rounds`` edges (the weighted complement of :func:`bfs_depths`;
    at web diameters a handful of rounds settles the graph — the
    fixed-round contract is the same "extra rounds are no-ops"
    monotone deal as kcore/ktruss, oracle-replayable as a bounded
    recursive CTE).  Crawl reading: weight = fetch cost / politeness
    delay / link penalty, dist = cheapest discovery cost from the
    seed set.

    Per round: one edges⋈frontier equi-join on ``src`` (edges hash-
    partitioned once and persisted) + one min-agg with map-side
    partials; only VERTICES IMPROVED LAST ROUND relay (the frontier
    shrinks to nothing on convergence, making converged rounds
    free-ish); state is localCheckpointed.  Unreachable vertices are
    absent from the output."""
    e = (edges.select(F.col(src).cast("long").alias("__s"),
                      F.col(dst).cast("long").alias("__t"),
                      F.col(weight).cast("long").alias("__w"))
         .filter(F.col("__s") != F.col("__t"))
         .groupBy("__s", "__t").agg(F.min("__w").alias("__w"))
         .repartition("__s").persist())
    dist = (seeds.select(F.col(id_col).cast("long").alias("__v"))
            .distinct()
            .withColumn("d", F.lit(0).cast("long"))
            .transform(_cut))
    frontier = dist
    for _ in range(rounds):
        if frontier.isEmpty():
            break
        cand = (e.join(frontier.withColumnRenamed("__v", "__s"), "__s")
                .select(F.col("__t").alias("__v"),
                        (F.col("d") + F.col("__w")).alias("d"))
                .groupBy("__v").agg(F.min("d").alias("d")))
        merged = (dist.unionByName(cand)
                  .groupBy("__v").agg(F.min("d").alias("d"))
                  .transform(_cut))
        # improved = strictly better than before (new vertices count)
        frontier = (merged.join(dist.withColumnRenamed("d", "__old"),
                                "__v", "left")
                    .filter(F.col("__old").isNull()
                            | (F.col("d") < F.col("__old")))
                    .select("__v", "d").transform(_cut))
        dist = merged
    e.unpersist()
    return dist.select(F.col("__v").alias(id_col), F.col("d").alias("dist"))


def stress_centrality(edges: DataFrame, seeds: DataFrame,
                      src: str = "src_doc_id", dst: str = "tgt_doc_id",
                      id_col: str = "doc_id",
                      horizon: int = 6) -> DataFrame:
    """Fixed-horizon stress centrality from a seed set (Shimbel 1953;
    the INTEGER member of the betweenness family, via the Brandes'08
    variant framework): for every vertex v, the number of shortest
    paths from any seed that PASS THROUGH v, truncated at ``horizon``
    hops.  Betweenness proper accumulates rational δ = σ(v)/σ(w)
    dependencies — floats that drift between engines; stress counts
    paths instead: per seed s, ``stress_s(v) = σ_s(v) · P_s(v)``
    where σ is the forward shortest-path count and ``P_s(v) =
    Σ_{DAG edges v→w} (1 + P_s(w))`` counts shortest-path
    continuations below v in the BFS DAG — all integers, so both
    engines agree bit-for-bit (the same discipline that picked
    harmonic-centrality lcm units and integer PageRank decimals).

    Level-synchronous forward pass exactly like :func:`bfs_depths`
    (edges hash-partitioned on src once + persisted; one frontier
    shuffle per level; flat lineage via localCheckpoint), then a
    backward pass over the SAME materialized levels — one
    uniform-key join per level, deepest first.  ``horizon`` is a
    semantic parameter (the truncation radius), not a guard: paths
    longer than it are out of scope by definition, which is what
    makes the operator unrollable to a plain-SQL oracle.

    Returns ``(id_col, n_sources, stress)`` for every non-seed
    vertex reached by at least one seed.

    Reference analog: none — engine extension (SURVEY §2.10 E122).
    """
    e = (edges.select(F.col(src).cast("long").alias("__s"),
                      F.col(dst).cast("long").alias("__t"))
         .where(F.col("__s") != F.col("__t"))
         .distinct().repartition("__s").persist())
    f0 = (seeds.select(F.col(id_col).cast("long").alias("s"))
          .distinct()
          .select("s", F.col("s").alias("v"),
                  F.lit(0).alias("d"),
                  F.lit(1).cast("long").alias("sig"))
          .transform(_cut))
    levels = [f0]
    visited = f0.select("s", "v")
    for lv in range(1, horizon + 1):
        prev = levels[-1]
        nxt = (prev.join(e, prev["v"] == e["__s"])
               .select("s", F.col("__t").alias("v"), "sig")
               .join(visited, ["s", "v"], "left_anti")
               .groupBy("s", "v")
               .agg(F.sum("sig").cast("long").alias("sig"))
               .withColumn("d", F.lit(lv))
               .select("s", "v", "d", "sig")
               .transform(_cut))
        if nxt.isEmpty():
            break
        levels.append(nxt)
        visited = nxt.select("s", "v").union(visited).transform(_cut)
    fall = levels[0]
    for lvf in levels[1:]:
        fall = fall.unionByName(lvf)
    fall = fall.persist()

    # shortest-path DAG edges (s, v -> w) with d(w) = d(v) + 1
    a1 = fall.select("s", F.col("v"), F.col("d"))
    a2 = fall.select(F.col("s").alias("s2"), F.col("v").alias("w"),
                     F.col("d").alias("d2"))
    dag = (a1.join(e, a1["v"] == e["__s"])
           .join(a2, (F.col("s") == F.col("s2"))
                 & (F.col("__t") == F.col("w"))
                 & (F.col("d2") == F.col("d") + 1))
           .select("s", "v", "w", "d")
           .persist())

    deepest = len(levels) - 1
    p_frames = {deepest: None}
    for lv in range(deepest - 1, -1, -1):
        dl = dag.where(F.col("d") == lv)
        pw = p_frames[lv + 1]
        if pw is not None:
            dl = (dl.join(pw.select(F.col("s"), F.col("v").alias("w"),
                                    F.col("p").alias("pw")),
                          ["s", "w"], "left"))
        else:
            dl = dl.withColumn("pw", F.lit(None).cast("long"))
        p_frames[lv] = (dl.groupBy("s", "v")
                        .agg(F.sum(F.lit(1) + F.coalesce("pw", F.lit(0)))
                             .cast("long").alias("p"))
                        .transform(_cut))
    pall = None
    for lv, fr in p_frames.items():
        if fr is None:
            continue
        pall = fr if pall is None else pall.unionByName(fr)

    scored = fall.where(F.col("v") != F.col("s"))
    if pall is not None:
        scored = scored.join(pall, ["s", "v"], "left")
    else:
        scored = scored.withColumn("p", F.lit(None).cast("long"))
    return (scored
            .groupBy(F.col("v").alias(id_col))
            .agg(F.countDistinct("s").cast("long").alias("n_sources"),
                 F.sum(F.col("sig") * F.coalesce("p", F.lit(0)))
                 .cast("long").alias("stress")))


WIDEST_INF = 1 << 62


def widest_paths(edges: DataFrame, seeds: DataFrame,
                 weight: str = "w",
                 src: str = "src_doc_id", dst: str = "tgt_doc_id",
                 id_col: str = "doc_id", rounds: int = 8) -> DataFrame:
    """(id_col, cap) — widest / bottleneck path from the seed set:
    the maximum over paths of the MINIMUM edge capacity along the
    path (the max-min semiring twin of :func:`sssp`'s min-plus —
    network capacity routing, and for a crawl: the best worst-link
    bandwidth/politeness budget on any route to a page).  Same
    synchronous frontier Bellman-Ford skeleton, same fixed-``rounds``
    truncation contract (exact over paths of ≤ rounds edges; extra
    rounds are no-ops after convergence), so the same bounded
    unrolled-SQL oracle discipline applies — only the semiring
    changed: relax = ``least(cap(u), w)``, merge = ``max``.

    Parallel edges keep their best capacity in the one-time edge
    prep; seeds carry an internal +inf that never escapes (seed rows
    are excluded from the output — a bottleneck to a seed itself is
    undefined).  Per round: one equi-join on the once-partitioned
    edge table + one max-agg with map-side partials; only vertices
    improved last round relay.

    Reference analog: none — engine extension (SURVEY §2.10 E123).
    """
    e = (edges.select(F.col(src).cast("long").alias("__s"),
                      F.col(dst).cast("long").alias("__t"),
                      F.col(weight).cast("long").alias("__w"))
         .filter(F.col("__s") != F.col("__t"))
         .groupBy("__s", "__t").agg(F.max("__w").alias("__w"))
         .repartition("__s").persist())
    sd = (seeds.select(F.col(id_col).cast("long").alias("__v"))
          .distinct())
    cap = (sd.withColumn("c", F.lit(WIDEST_INF).cast("long"))
           .transform(_cut))
    frontier = cap
    for _ in range(rounds):
        if frontier.isEmpty():
            break
        cand = (e.join(frontier.withColumnRenamed("__v", "__s"), "__s")
                .select(F.col("__t").alias("__v"),
                        F.least(F.col("c"), F.col("__w")).alias("c"))
                .groupBy("__v").agg(F.max("c").alias("c")))
        merged = (cap.unionByName(cand)
                  .groupBy("__v").agg(F.max("c").alias("c"))
                  .transform(_cut))
        frontier = (merged.join(cap.withColumnRenamed("c", "__old"),
                                "__v", "left")
                    .filter(F.col("__old").isNull()
                            | (F.col("c") > F.col("__old")))
                    .select("__v", "c").transform(_cut))
        cap = merged
    e.unpersist()
    return (cap.join(sd, "__v", "left_anti")
            .select(F.col("__v").alias(id_col), F.col("c").alias("cap")))


def degree_assortativity(edges: DataFrame,
                         src: str = "src_doc_id",
                         dst: str = "tgt_doc_id") -> DataFrame:
    """Degree assortativity (Newman 2002) of the undirected graph in
    EXACT integer arithmetic: do high-degree vertices attach to
    high-degree vertices (r > 0, social-network-like) or to leaves
    (r < 0, web/internet-like)?  The Pearson correlation of endpoint
    degrees over the edge list — but ``r`` itself needs square
    roots, so the exact emission is ``r² in ppm`` plus the SIGN of
    the covariance: ``r2_ppm = (n·Sxy − Sx·Sy)²·10^6 div
    ((n·Sxx − Sx²)·(n·Syy − Sy²))`` over decimal(38,0), monotone in
    |r| and bit-equal in any engine.

    Edges are undirected-deduped and each contributes BOTH endpoint
    orderings (the standard symmetrization, making Sx = Sy by
    construction — pinned).  Shape: degrees = one uniform-key agg;
    two joins edge⋈degree; one 1-row moment fold.

    Returns one row ``(n_edges, cov_sign, r2_ppm)``.

    Reference analog: none — engine extension (SURVEY §2.10 E130).
    """
    und = (edges.select(F.least(F.col(src), F.col(dst)).alias("u"),
                        F.greatest(F.col(src), F.col(dst)).alias("v"))
           .where(F.col("u") != F.col("v")).distinct())
    sym = (und.select("u", "v")
           .unionAll(und.select(F.col("v").alias("u"),
                                F.col("u").alias("v"))))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    pairs = (sym
             .join(deg.select(F.col("u"), F.col("d").alias("dx")), "u")
             .join(deg.select(F.col("u").alias("v"),
                              F.col("d").alias("dy")), "v"))
    m = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.expr("cast(dx as decimal(38,0)) * dy")).alias("sxy"),
        F.sum(F.expr("cast(dx as decimal(38,0)) * dx")).alias("sxx"),
        F.sum(F.expr("cast(dy as decimal(38,0)) * dy")).alias("syy"))
    return m.select(
        (F.col("n") / 2).cast("long").alias("n_edges"),
        F.expr("cast(sign(cast(n as decimal(38,0)) * sxy "
               "- cast(sx as decimal(38,0)) * sy) as int)")
        .alias("cov_sign"),
        F.expr(
            "case when (cast(n as decimal(38,0)) * sxx "
            "- cast(sx as decimal(38,0)) * sx) = 0 "
            "or (cast(n as decimal(38,0)) * syy "
            "- cast(sy as decimal(38,0)) * sy) = 0 then 0 else "
            "cast((cast(n as decimal(38,0)) * sxy "
            "- cast(sx as decimal(38,0)) * sy) "
            "* (cast(n as decimal(38,0)) * sxy "
            "- cast(sx as decimal(38,0)) * sy) * 1000000 "
            "div ((cast(n as decimal(38,0)) * sxx "
            "- cast(sx as decimal(38,0)) * sx) "
            "* (cast(n as decimal(38,0)) * syy "
            "- cast(sy as decimal(38,0)) * sy)) as bigint) end")
        .alias("r2_ppm"))


def luby_mis(vertices: DataFrame, edges: DataFrame,
             id_col: str = "doc_id", src: str = "src_doc_id",
             dst: str = "tgt_doc_id", rounds: int = 6) -> DataFrame:
    """Maximal independent set by Luby's algorithm (Luby, STOC'85 —
    THE textbook symmetry-breaking primitive of parallel graph
    computing): each round every live vertex draws a priority, joins
    the MIS iff it beats every live neighbor, and winners plus their
    neighborhoods leave the graph — expected O(log n) rounds kill a
    constant fraction of EDGES per round, all data-parallel.  The
    crawl uses: pick a set of pages/hosts no two of which are
    adjacent (conflict-free fetch scheduling, independent seed
    selection, landmark spacing) without any sequential greedy scan.

    Determinism discipline: the "random" priority is the full md5
    hex string of ``round ':' id`` — unique per vertex per round
    (collision = md5 collision), lexicographically compared the same
    by any engine, no floats, no RNG state.  A vertex with no LIVE
    neighbor wins vacuously (round 0 therefore admits all isolated
    vertices).  Fixed-round contract like :func:`kcore`: the oracle
    unrolls the SAME rounds; at contract scale the graph is fully
    decided well before round 6 (asserted in tests — residual empty),
    and independence/maximality are pinned structurally.

    Per round: one (id)-key join attaching priorities, one
    neighbor-min agg, two anti-joins — every key uniform; rounds
    localCheckpoint (the ktruss discipline).  → ``(id_col, round)``
    for every MIS member, round = admission round.

    Reference analog: none — engine extension (SURVEY §2.10 E135).
    """
    e = _canon_edges(edges, src, dst).transform(_cut)
    v = (vertices.select(F.col(id_col).alias("id")).distinct()
         .transform(_cut))
    out = None
    for r in range(rounds):
        und = (e.select(F.col("u").alias("a"), F.col("v").alias("b"))
               .unionByName(e.select(F.col("v").alias("a"),
                                     F.col("u").alias("b"))))
        pr = v.select("id", F.md5(F.concat(F.lit(f"{r}:"),
                                           F.col("id").cast("string")))
                      .alias("p"))
        nm = (und.join(pr.select(F.col("id").alias("b"),
                                 F.col("p").alias("pb")), "b")
              .groupBy(F.col("a").alias("id"))
              .agg(F.min("pb").alias("minp")))
        win = (pr.join(nm, "id", "left")
               .filter(F.col("minp").isNull()
                       | (F.col("p") < F.col("minp")))
               .select("id"))
        w = win.select("id", F.lit(r).cast("int").alias("round")) \
               .transform(_cut)
        out = w if out is None else out.unionByName(w)
        removed = (w.select("id")
                   .unionByName(und.join(w.select(F.col("id")
                                                  .alias("a")), "a")
                                .select(F.col("b").alias("id")))
                   .distinct())
        v = v.join(removed, "id", "left_anti").transform(_cut)
        e = (e.join(removed.select(F.col("id").alias("u")), "u",
                    "left_anti")
             .join(removed.select(F.col("id").alias("v")), "v",
                   "left_anti").transform(_cut))
    return out.select(F.col("id").alias(id_col), "round")


def condensation_tiers(vertices: DataFrame, edges: DataFrame,
                       id_col: str = "doc_id", src: str = "src_doc_id",
                       dst: str = "tgt_doc_id",
                       max_rounds: int = 64) -> DataFrame:
    """Topological TIERS of the condensation DAG: contract the
    directed graph to its SCCs (:func:`strongly_connected_components`
    — the quotient is acyclic by construction), then assign every
    component ``tier`` = its longest path length from any source —
    the dependency layering a crawl scheduler walks (IN-tendril
    components before the core, core before OUT; process tier k only
    after k−1) and the "how deep is the web from its entry points"
    number next to the bowtie's which-region labels.

    Longest-path-from-sources is the DAG scheduling depth (critical
    path): ``tier(c) = 0`` for sources, else ``1 + max over
    predecessors`` — computed by monotone max-propagation to
    fixpoint: each round one (component-key) join + one max agg over
    the CONDENSED edge set (orders of magnitude smaller than the
    page graph — the quotient of the synthetic web is a few hundred
    nodes for 500 pages, and at 10^10 the condensation is the tiny
    graph single machines handle; rounds ∝ DAG depth).  Σtier is the
    monotone convergence witness (strictly grows until fixpoint,
    bounded by depth·|C|), same discipline as the SCC inner loop;
    rounds are localCheckpointed.

    → ``(scc, tier, n_members)`` per component.

    Reference analog: none — engine extension (SURVEY §2.10 E142).
    """
    scc = strongly_connected_components(vertices, edges, id_col=id_col,
                                        src=src, dst=dst)
    scc = scc.transform(_cut)
    key = scc.select(F.col(id_col).alias("k"), "scc")
    ce = (edges.select(F.col(src).alias("k"), F.col(dst).alias("d"))
          .join(key, "k").select(F.col("scc").alias("ca"), "d")
          .join(key.select(F.col("k").alias("d"),
                           F.col("scc").alias("cb")), "d")
          .filter(F.col("ca") != F.col("cb"))
          .select("ca", "cb").distinct().transform(_cut))
    t = (scc.select("scc").distinct()
         .select("scc", F.lit(0).cast("long").alias("tier"))
         .transform(_cut))
    prev = -1
    for _ in range(max_rounds):
        total = t.agg(F.sum("tier")).first()[0]
        if total == prev:
            break
        prev = total
        up = (ce.join(t.select(F.col("scc").alias("ca"),
                               F.col("tier").alias("ta")), "ca")
              .groupBy(F.col("cb").alias("scc"))
              .agg((F.max("ta") + 1).alias("tu")))
        t = (t.join(up, "scc", "left")
             .select("scc", F.greatest("tier", F.coalesce(
                 "tu", F.lit(0))).cast("long").alias("tier"))
             .transform(_cut))
    else:
        raise RuntimeError(
            f"tier propagation did not converge in {max_rounds} rounds")
    members = scc.groupBy("scc").agg(F.count(F.lit(1)).cast("long")
                                     .alias("n_members"))
    return t.join(members, "scc").select(
        "scc", "tier", "n_members")


def crosslingual_matrix(edges: DataFrame, langs: DataFrame,
                        src_col: str = "src",
                        tgt_col: str = "tgt") -> DataFrame:
    """Cross-lingual link structure (E160) — how language communities
    cite each other: the (source language × target language) matrix
    of link counts with each row's share of its source language's
    out-links in exact ppm.  The quantity behind two pipeline
    decisions: whether anchor text is usable as cross-lingual
    training signal (how much en→zh linking actually exists), and
    whether per-language crawl shards can be scheduled independently
    (high insularity = the diagonal dominates = cheap to shard by
    lang).

    Shape: two uniform doc-id joins (the lang dim is one row per
    document — broadcast when small, shuffle-join at 10^10 where AQE
    handles it), one (src_lang, tgt_lang) hash agg — at most
    |langs|² output rows — and a share window over that DIM.

    → ``(src_lang, tgt_lang, n_links, share_ppm, is_cross)``.

    Reference analog: none — engine extension (SURVEY §2.10 E160).
    """
    from pyspark.sql import Window

    sl = langs.select(F.col("doc_id").alias("s"),
                      F.col("lang").alias("src_lang"))
    tl = langs.select(F.col("doc_id").alias("t"),
                      F.col("lang").alias("tgt_lang"))
    e = (edges.select(F.col(src_col).alias("s"),
                      F.col(tgt_col).alias("t"))
         .join(sl, "s").join(tl, "t"))
    m = (e.groupBy("src_lang", "tgt_lang")
         .agg(F.count(F.lit(1)).cast("long").alias("n_links")))
    w = Window.partitionBy("src_lang")
    return (m.withColumn("src_total", F.sum("n_links").over(w))
            .withColumn("share_ppm",
                        F.expr("1000000 * n_links div src_total"))
            .withColumn("is_cross",
                        F.col("src_lang") != F.col("tgt_lang"))
            .select("src_lang", "tgt_lang", "n_links", "share_ppm",
                    "is_cross"))


def salsa_scores(edges: DataFrame, src: str = "src_doc_id",
                 dst: str = "tgt_doc_id",
                 scale: int = 10 ** 9) -> DataFrame:
    """SALSA — Stochastic Approach for Link-Structure Analysis
    (Lempel & Moran, WWW9 2000), the random-walk repair of HITS'
    TKC anomaly and the ranking behind production who-to-follow /
    related-page systems.  Where HITS (E-series :func:`hits`) needs
    iterated mutual reinforcement, SALSA's stationary distributions
    have a CLOSED FORM (paper §3.2): within each connected component
    of the bipartite support graph the authority chain's stationary
    weight is proportional to in-degree (hub chain: out-degree), and
    components are weighted by their share of that side's nodes —

        a(v) = (|A_c| / |A|) · (indeg(v)  / E_c)
        h(u) = (|H_c| / |H|) · (outdeg(u) / E_c)

    with E_c the edges inside component c (= Σ indeg over A_c
    = Σ outdeg over H_c).  That closed form is what makes SALSA the
    100-TB-friendly member of the family: NO iteration, NO float
    normalization, and crucially the co-citation chain graph (whose
    pair materialization is quadratic in hub fan-out — the thing that
    explodes on a 10^6-out-link hub) is never built.  Component
    structure comes from the BIPARTITE graph directly (hub copy
    2u ⟷ auth copy 2v+1 per edge), which has exactly |E| edges and
    the same authority-side components as the chain graph (a chain
    step auth→hub→auth is two bipartite hops).

    Physical shape: one distinct on the edge list, the large-star/
    small-star CC fixpoint on the bipartite encoding (O(log²) rounds,
    every shuffle on uniform ids), then two hash aggs (per-component,
    per-side totals) and one broadcast of the 2-row side dim.  All
    arithmetic is exact integer: score_ppb = (comp_nodes · deg ·
    scale) div (side_total · comp_edges) — BIGINT-exact while
    comp_nodes·deg·scale < 2^63 (at 10^10 edges move scale to ppm or
    the products to decimal(38,0); the div is floor on non-negatives
    so any engine reproduces it bit-for-bit).

    → one row per (doc_id, side): ``(doc_id, side, deg, comp_nodes,
    comp_edges, score_ppb)`` where side ∈ {'hub','auth'}; a page with
    both in- and out-links gets two rows (SALSA keeps the two
    personae distinct by construction).  Σ score_ppb per side =
    scale − (floor-division evaporation).

    Reference analog: none — engine extension (the reference keeps no
    ranking; its frontier is FIFO, pkg/crawler/crawler.go)."""
    e = (edges.select(F.col(src).cast("long").alias("u"),
                      F.col(dst).cast("long").alias("v"))
         .distinct().transform(_cut))
    be = e.select((F.col("u") * 2).alias("bh"),
                  (F.col("v") * 2 + 1).alias("ba"))
    bn = (be.select(F.col("bh").alias("bid"))
          .unionByName(be.select(F.col("ba").alias("bid")))
          .distinct())
    cc = connected_components(bn, be, id_col="bid",
                              src="bh", dst="ba")
    hub = (e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
           .select((F.col("u") * 2).alias("bid"),
                   F.col("u").alias("doc_id"),
                   F.lit("hub").alias("side"), "deg"))
    auth = (e.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
            .select((F.col("v") * 2 + 1).alias("bid"),
                    F.col("v").alias("doc_id"),
                    F.lit("auth").alias("side"), "deg"))
    nodes = hub.unionByName(auth).join(cc, "bid")
    comp = (nodes.groupBy("component", "side")
            .agg(F.count(F.lit(1)).alias("comp_nodes"),
                 F.sum("deg").cast("long").alias("comp_edges")))
    tot = nodes.groupBy("side").agg(
        F.count(F.lit(1)).alias("side_total"))
    return (nodes.join(comp, ["component", "side"])
            .join(F.broadcast(tot), "side")
            .select("doc_id", "side", F.col("deg").cast("long").alias("deg"),
                    F.col("comp_nodes").cast("long").alias("comp_nodes"),
                    "comp_edges",
                    F.expr(f"(comp_nodes * deg * {scale}) "
                           "div (side_total * comp_edges)")
                    .cast("long").alias("score_ppb")))


def densest_subgraph(vertices: DataFrame, edges: DataFrame,
                     rounds: int = 8, id_col: str = "doc_id",
                     src: str = "src_doc_id",
                     dst: str = "tgt_doc_id") -> DataFrame:
    """Greedy densest-subgraph extraction by synchronous
    (2+ε)-approximation peeling (Bahmani, Kumar & Vassilvitskii,
    VLDB'12) with ε = 1/2: each round simultaneously removes every
    vertex whose surviving degree is ≤ 3·|E(S)|/|S| (the 2(1+ε)
    density bar), and the answer is the BEST-density survivor set
    seen across all rounds — guaranteed within 3× of the optimum.
    The web use: the single tightest link community (a link-farm /
    mutual-admiration core) extracted without enumerating per-k
    cores; crawl planning reads it as the spam-capture epicentre
    next to E85's k-core and E50's communities.

    Exact integer algebra throughout: the peel bar is applied by
    cross-multiplication (``deg·|S| > 3·|E|`` keeps a vertex), and
    the best round is chosen by exact rational comparison
    ``ne_i·ns_j > ne_j·ns_i`` (earliest round wins ties) — no
    floating-point density anywhere, so the fixed-round unrolled SQL
    oracle replays bit-for-bit.  Output: one row per vertex of the
    winning set with its in-set degree, plus the set's (round, size,
    edges, floor-ppm density) witness columns.

    Scale shape: per round one endpoint-key semi-join pair + one
    uniform-key degree agg (same shuffle bill as one k-core round);
    the two per-round counts are the scalar actions the peel bar
    needs (BKV's MapReduce rounds do the same).  Survivors shrink by
    ≥ 1/3 per round (Σdeg = 2|E| forces it), so ⌈log_{3/2}|V|⌉
    rounds always converge — ``rounds`` = 8 covers the sandbox graph
    with two idempotent tail rounds to spare; empty-set tail rounds
    short-circuit.  Lineage stays flat via localCheckpoint.
    Reference analog: none (the Go engine has no graph analytics);
    this is part of the LLM-pipeline tier the rebuild adds.
    """
    e0 = _canon_edges(edges, src, dst).transform(_cut)
    und = (e0.select("u", "v")
           .unionByName(e0.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
           .transform(_cut))
    alive = (vertices.select(F.col(id_col).cast("long").alias("id"))
             .distinct().transform(_cut))
    hist: list[tuple[int, int, int, DataFrame]] = []
    for i in range(rounds + 1):
        e_in = (e0.join(alive.withColumnRenamed("id", "u"), "u", "semi")
                .join(alive.withColumnRenamed("id", "v"), "v", "semi"))
        ne, ns = e_in.count(), alive.count()
        hist.append((i, ne, ns, alive))
        if ns == 0 or i == rounds:
            break
        deg = (und.join(alive.withColumnRenamed("id", "u"), "u", "semi")
               .join(alive.withColumnRenamed("id", "v"), "v", "semi")
               .groupBy("u").agg(F.count(F.lit(1)).alias("d")))
        alive = (deg.filter(F.col("d") * F.lit(ns) > F.lit(3 * ne))
                 .select(F.col("u").alias("id")).transform(_cut))
    best = hist[0]
    for cand in hist[1:]:
        if cand[2] > 0 and cand[1] * best[2] > best[1] * cand[2]:
            best = cand
    r, ne, ns, sel = best
    deg_in = (und.join(sel.withColumnRenamed("id", "u"), "u", "semi")
              .join(sel.withColumnRenamed("id", "v"), "v", "semi")
              .groupBy("u").agg(F.count(F.lit(1)).cast("long")
                                .alias("deg_in")))
    return deg_in.select(
        F.col("u").alias(id_col), "deg_in",
        F.lit(r).cast("int").alias("best_round"),
        F.lit(ns).cast("long").alias("set_size"),
        F.lit(ne).cast("long").alias("set_edges"),
        F.lit(ne * 1_000_000 // ns if ns else 0).cast("long")
        .alias("density_ppm"))


def spam_mass(edges: DataFrame, trusted: DataFrame, vertices: DataFrame,
              rounds: int = 4, scale: int = 10 ** 12,
              src: str = "src_doc_id", dst: str = "tgt_doc_id",
              id_col: str = "doc_id", trusted_col: str = "seed_seq",
              flag_ppm: int = 500_000) -> DataFrame:
    """TrustRank spam mass (Gyöngyi, Garcia-Molina & Pedersen,
    VLDB'04) in EXACT integer arithmetic — the crawl scheduler's spam
    demotion signal: how much of a page's PageRank arrives from
    OUTSIDE the trusted region of the web?

    Two runs of the E87 integer PPR recurrence over the same edge
    relation, differing only in the teleport set:

      pr(v) = teleport-to-ALL-vertices run   (classic PageRank with
              evaporating dangling/rounding mass)
      tr(v) = teleport-to-TRUSTED-seeds run  (TrustRank: mass can
              only enter through the whitelist)

    and the paper's relative mass, clamped to [0, 1] in floor ppm so
    every division stays non-negative (Spark ``div`` truncates toward
    zero while DuckDB ``//`` floors — identical only when operands
    are non-negative, the same determinism discipline as E87/E170):

      spam_mass_ppm = (pr − min(tr, pr)) · 10⁶ div pr
      spam_flag     = spam_mass_ppm ≥ flag_ppm

    tr > pr happens for pages near the seeds (trust teleport
    concentrates there) — genuinely trusted, so the clamp maps them
    to spam mass 0 rather than a sign-dependent division.

    Physical shape: the two recurrences are independent rank⋈edges
    chains on the uniform src key (each ONE shuffle join + one agg
    per round, localCheckpointed flat); the final combine is a single
    doc_id equi-join of two ≤|V| rank sets.  At 10^10 vertices raise
    ``scale`` so the global teleport ``(15·scale div 100) div n``
    stays positive — the guard below enforces it.

    → (doc_id, pr, tr, spam_mass_ppm, spam_flag) for pr > 0 rows.

    Reference analog: none (the Go engine ranks nothing) — engine
    extension; oracle = both chains unrolled in SQL
    (__spark_entry__._spam_mass_sql).
    """
    v = vertices.select(F.col(id_col).cast("long").alias("id")).distinct()
    n = v.count()
    if n == 0:
        raise ValueError("spam_mass: empty vertex set")
    if (15 * scale // 100) // n == 0:
        raise ValueError(
            f"spam_mass: scale={scale} floors the uniform teleport to 0 "
            f"at n={n} vertices — raise scale above ~7·n")
    pr = personalized_pagerank(edges, v, rounds=rounds, scale=scale,
                               src=src, dst=dst, seed_col="id") \
        .withColumnRenamed("ppr", "pr")
    tr = personalized_pagerank(edges, trusted, rounds=rounds, scale=scale,
                               src=src, dst=dst, seed_col=trusted_col) \
        .withColumnRenamed("ppr", "tr")
    tr_c = F.least(F.coalesce(F.col("tr"), F.lit(0)), F.col("pr"))
    ppm = F.expr("(pr - least(coalesce(tr, 0), pr)) * 1000000 div pr")
    return (pr.join(tr, "doc_id", "left")
            .select("doc_id", "pr",
                    tr_c.cast("long").alias("tr"),
                    ppm.cast("long").alias("spam_mass_ppm"))
            .withColumn("spam_flag",
                        F.col("spam_mass_ppm") >= F.lit(flag_ppm)))


def conductance_by_community(vertices: DataFrame, edges: DataFrame,
                             labels: DataFrame,
                             id_col: str = "doc_id",
                             src: str = "src_doc_id",
                             dst: str = "tgt_doc_id") -> DataFrame:
    """Per-community conductance (E193) — the OTHER standard quality
    metric for a community assignment (Kannan/Vempala/Vetta's cluster
    criterion; Leskovec's NCP plots): φ(c) = cut(c) / min(vol(c),
    vol(rest)).  Modularity (E86) rewards internal density against a
    null model; conductance measures how LEAKY the boundary is — a
    mirror farm scores near 0, a random split near 1, and the two
    metrics disagree exactly where resolution-limit artifacts live,
    which is why an acceptance suite wants both.

    Exact integer identity: over the undirected simple graph,
    vol(c) = Σ_c deg and cut(c) = vol(c) − 2·internal(c), so the
    metric reuses E86's aggregates verbatim — two label joins + one
    community agg + the shared degree view + the 1-row 2m broadcast.
    φ in floor ppm (non-negative ÷ non-negative); NULL when the
    denominator is 0 (isolated community or the whole graph — φ
    undefined, not 0).

    → (community, n_members, vol, cut, conductance_ppm).
    """
    ce = _canon_edges(edges, src, dst).transform(_cut)
    und = ce.select("u", "v").unionByName(
        ce.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("id")).agg(
        F.count(F.lit(1)).alias("deg"))
    lbl = labels.select(F.col(id_col).cast("long").alias("id"),
                        F.col("community").cast("long").alias("community"))
    lu = lbl.select(F.col("id").alias("u"), F.col("community").alias("cu"))
    lv = lbl.select(F.col("id").alias("v"), F.col("community").alias("cv"))
    internal = (ce.join(lu, "u").join(lv, "v")
                .filter(F.col("cu") == F.col("cv"))
                .groupBy(F.col("cu").alias("community"))
                .agg(F.count(F.lit(1)).alias("n_internal")))
    per_comm = (lbl.join(deg, "id", "left")
                .groupBy("community")
                .agg(F.count(F.lit(1)).cast("long").alias("n_members"),
                     F.sum(F.coalesce("deg", F.lit(0)))
                      .cast("long").alias("vol")))
    m_row = ce.agg(F.count(F.lit(1)).cast("long").alias("m_edges"))
    return (per_comm
            .join(internal, "community", "left")
            .withColumn("cut",
                        (F.col("vol")
                         - 2 * F.coalesce("n_internal", F.lit(0)))
                        .cast("long"))
            .crossJoin(F.broadcast(m_row))
            .withColumn("__den",
                        F.least(F.col("vol"),
                                2 * F.col("m_edges") - F.col("vol")))
            .select("community", "n_members", "vol", "cut",
                    F.when(F.col("__den") > 0,
                           F.expr("cut * 1000000 div __den"))
                    .cast("long").alias("conductance_ppm")))


def incremental_components(labels: DataFrame, delta_edges: DataFrame,
                           id_col: str = "doc_id",
                           src: str = "src_doc_id",
                           dst: str = "tgt_doc_id") -> DataFrame:
    """Incremental connected-components maintenance (E200) — the
    delta path a 10^10-edge store needs: a crawl wave appends a few
    million edges, and re-running E9 over the FULL edge list to
    refresh component labels is the textbook mistake.  Components
    are a congruence: a new edge (u, v) can only MERGE the
    components of u and v, so the delta reduces to a component-GRAPH
    problem — map delta endpoints through the existing labels, run
    CC on the resulting (cu, cv) edges (a graph no larger than the
    number of components the delta touches — delta-sized, never
    corpus-sized), and remap.  Labels stay min-id canonical because
    the component meta-CC is itself min-id and labels were min-id
    before (min is associative across the merge).

    Endpoints absent from ``labels`` (brand-new pages arriving with
    the delta) enter as their own singleton components first.

    Physical shape: two uniform-key label joins (delta ⋈ labels),
    the E9 star loop on the DELTA-sized component graph, and one
    remap join of the (usually tiny) changed-component dim back onto
    labels — broadcast when small, hash otherwise.  Result ≡
    full recompute over old ∪ delta edges (the contract oracle and
    tests pin exactly that).

    → (id_col, component), min-id canonical, every old or new id
    labeled.
    """
    de = (delta_edges.select(F.col(src).cast("long").alias("u"),
                             F.col(dst).cast("long").alias("v"))
          .filter(F.col("u") != F.col("v")).distinct())
    lab = labels.select(F.col(id_col).cast("long").alias("id"),
                        F.col("component").cast("long").alias("c"))
    # new ids arriving with the delta: singleton components
    dv = (de.select(F.col("u").alias("id"))
          .unionByName(de.select(F.col("v").alias("id"))).distinct())
    newbies = (dv.join(lab.select("id"), "id", "left_anti")
               .select("id", F.col("id").alias("c")))
    lab_all = lab.unionByName(newbies).transform(_cut)
    cu = lab_all.select(F.col("id").alias("u"), F.col("c").alias("cu"))
    cv = lab_all.select(F.col("id").alias("v"), F.col("c").alias("cv"))
    comp_edges = (de.join(cu, "u").join(cv, "v")
                  .filter(F.col("cu") != F.col("cv"))
                  .select(F.col("cu").alias("src"),
                          F.col("cv").alias("dst")))
    comp_verts = (comp_edges.select(F.col("src").alias("id"))
                  .unionByName(comp_edges.select(F.col("dst")
                                                 .alias("id")))
                  .distinct())
    meta = connected_components(comp_verts, comp_edges,
                                id_col="id", src="src", dst="dst")
    remap = (meta.filter(F.col("id") != F.col("component"))
             .select(F.col("id").alias("c"),
                     F.col("component").alias("c_new")))
    return (lab_all.join(remap, "c", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("c_new", F.col("c")).cast("long")
                    .alias("component")))


def attack_tolerance(vertices: DataFrame, edges: DataFrame,
                     k_remove: int = 8, id_col: str = "doc_id",
                     src: str = "src_doc_id",
                     dst: str = "tgt_doc_id") -> DataFrame:
    """Hub-removal robustness audit (E206, Albert/Jeong/Barabási
    2000 "attack tolerance"): scale-free graphs shrug off random
    failures but shatter when the top hubs go — the audit a crawl
    operator runs to know whether connectivity (and therefore
    discovery reach) hangs on a handful of hosts.  Two scenarios:
    the full undirected graph, and the graph with the ``k_remove``
    highest-total-degree vertices deleted (ties: smaller id first —
    deterministic), each reduced to the component profile:

    → (scenario, n_nodes, n_edges, n_components, giant_size,
    giant_share_ppm)

    where giant_share is of the scenario's own node count.

    Physical shape: degree agg on the shared undirected view; the
    top-k dim via take_global (range-partitioned, never a global
    sort of the degree dim); each scenario is one E9 CC run + a
    component-size agg — the removed run on the induced subgraph via
    two broadcast anti-joins of the k-row removal dim.
    """
    from web_graph_spark.operators.frontier import take_global

    ce = _canon_edges(edges, src, dst).transform(_cut)
    ids = (vertices.select(F.col(id_col).cast("long").alias("id"))
           .distinct().transform(_cut))
    und = ce.select("u", "v").unionByName(
        ce.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("id")).agg(
        F.count(F.lit(1)).alias("d"))
    top = (take_global(deg.withColumn("__nd", -F.col("d")), k_remove,
                       ["__nd", "id"])
           .select("id").transform(_cut))

    def profile(name: str, vv: DataFrame, ee: DataFrame) -> DataFrame:
        cc = connected_components(vv, ee, id_col="id",
                                  src="u", dst="v")
        sizes = cc.groupBy("component").agg(
            F.count(F.lit(1)).alias("sz"))
        st = sizes.agg(F.count(F.lit(1)).cast("long")
                       .alias("n_components"),
                       F.max("sz").cast("long").alias("giant_size"))
        nn = vv.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        ne = ee.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        return (st.crossJoin(F.broadcast(nn))
                .crossJoin(F.broadcast(ne))
                .select(F.lit(name).alias("scenario"),
                        "n_nodes", "n_edges", "n_components",
                        "giant_size",
                        F.expr("giant_size * 1000000 div "
                               "greatest(n_nodes, 1)").cast("long")
                        .alias("giant_share_ppm")))

    vv2 = ids.join(F.broadcast(top), "id", "left_anti") \
        .transform(_cut)
    ee2 = (ce.join(F.broadcast(top.withColumnRenamed("id", "u")),
                   "u", "left_anti")
           .join(F.broadcast(top.withColumnRenamed("id", "v")),
                 "v", "left_anti").transform(_cut))
    return (profile("full", ids, ce)
            .unionByName(profile(f"minus_top{k_remove}", vv2, ee2)))


def double_sweep_diameter(edges: DataFrame, vertices: DataFrame,
                          src: str = "src_doc_id",
                          dst: str = "tgt_doc_id",
                          id_col: str = "doc_id",
                          max_depth: int = 64) -> DataFrame:
    """Double-sweep diameter lower bound (E218) — the iFUB building
    block and the standard cheap answer to "how deep is this web
    graph really": BFS from a deterministic start (the minimum
    vertex id), hop to the farthest vertex found (ties to the
    smallest id), BFS again from there; the second sweep's
    eccentricity is a diameter lower bound that is EXACT on trees
    and empirically tight on web graphs (Magnien-Latapy-Habib).
    Runs on the UNDIRECTED view (symmetrized edges), like the other
    structure audits (modularity, k-core).

    Two :func:`bfs_depths` runs — level-synchronous, one
    frontier⋈edges shuffle per level, flat lineage — plus ONE 1-row
    driver hop between them (the farthest vertex, a TakeOrdered
    map-side heap, never a global sort).  Vertices outside the
    start's component are absent from both sweeps (``n_reached``
    says how many the bound covers).

    → one row per second-sweep BFS level ``(depth, n_nodes)`` with
    the audit constants ``(start_id, far_id, ecc_start,
    diameter_lb, n_reached)`` alongside.

    Reference analog: none (the reference never measures its graph);
    engine extension (SURVEY §2.10 E218).
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src).cast("long").alias("s"),
                     F.col(dst).cast("long").alias("t"))
    und = e.unionByName(e.select(F.col("t").alias("s"),
                                 F.col("s").alias("t"))).distinct()
    start = int(vertices.agg(
        F.min(F.col(id_col).cast("long"))).collect()[0][0])
    seed1 = spark.createDataFrame([(start,)], f"{id_col} long")
    s1 = bfs_depths(und, seed1, src="s", dst="t", id_col=id_col,
                    max_depth=max_depth)
    far = (s1.orderBy(F.desc("depth"), id_col).limit(1).collect())[0]
    far_id, ecc_start = int(far[id_col]), int(far["depth"])
    seed2 = spark.createDataFrame([(far_id,)], f"{id_col} long")
    s2 = bfs_depths(und, seed2, src="s", dst="t", id_col=id_col,
                    max_depth=max_depth).transform(_cut)
    summary = s2.agg(F.max("depth").cast("long").alias("diameter_lb"),
                     F.count(F.lit(1)).cast("long").alias("n_reached"))
    return (s2.groupBy("depth")
            .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
            .crossJoin(F.broadcast(summary))
            .select("depth", "n_nodes",
                    F.lit(start).cast("long").alias("start_id"),
                    F.lit(far_id).cast("long").alias("far_id"),
                    F.lit(ecc_start).cast("long").alias("ecc_start"),
                    "diameter_lb", "n_reached"))


def degree_mixing_curve(edges: DataFrame, src: str = "src_doc_id",
                        dst: str = "tgt_doc_id") -> DataFrame:
    """Degree-mixing structure audit (E219): the k_nn(k) curve (mean
    neighbor degree per degree class — the FULL shape behind E152's
    single assortativity coefficient) and the rich-club coefficient
    φ(k) (edge density among vertices of degree > k) — together the
    standard answer to "is this web graph hub-centralized, and do
    the hubs form a club?".  Undirected view, self-loops dropped;
    isolated vertices carry no incidences and are absent.

    Exact integers end-to-end: k_nn in floor ppm (neighbor-degree
    sums ride decimal(38,0) — 10^11 incidences × 10^7-degree hubs
    overflow BIGINT), φ(k) = 2·E_k·10⁶ div (N_k·(N_k−1)) with E_k /
    N_k as SUFFIX sums over the degree axis (total − running cum),
    NULL below 2 club members.  The min-endpoint-degree histogram
    makes E_k one bounded aggregation — never a per-k rescan of the
    edge list.

    Scale shape: degree = one groupBy over the symmetrized edges;
    incidences join degree twice on uniform vertex keys; every
    curve/window step runs on the DEGREE-CLASS dim (bounded by max
    degree, thousands of rows at 10^10 vertices) — the one
    unpartitioned cumulative window is over that bounded dim, not
    the corpus.

    → ``(deg, n_nodes, knn_ppm, n_richer, rich_club_ppm)``.

    Reference analog: none; engine extension (SURVEY §2.10 E219).
    """
    e = (edges.select(F.col(src).cast("long").alias("s"),
                      F.col(dst).cast("long").alias("t"))
         .filter(F.col("s") != F.col("t")))
    und = e.unionByName(e.select(F.col("t").alias("s"),
                                 F.col("s").alias("t"))).distinct()
    deg = und.groupBy(F.col("s").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("deg"))
    inc = (und
           .join(deg.select(F.col("v").alias("s"),
                            F.col("deg").alias("deg_u")), "s")
           .join(deg.select(F.col("v").alias("t"),
                            F.col("deg").alias("deg_v")), "t"))
    knn = (inc.groupBy("deg_u")
           .agg(F.sum(F.col("deg_v").cast("decimal(38,0)"))
                .alias("sd"),
                F.count(F.lit(1)).cast("long").alias("cnt"))
           .select(F.col("deg_u").alias("deg"),
                   F.expr("CAST(sd * 1000000 div cnt AS BIGINT)")
                   .alias("knn_ppm")))
    hist = deg.groupBy("deg").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"))
    em = (und.filter(F.col("s") < F.col("t"))
          .join(deg.select(F.col("v").alias("s"),
                           F.col("deg").alias("du")), "s")
          .join(deg.select(F.col("v").alias("t"),
                           F.col("deg").alias("dv")), "t")
          .select(F.least("du", "dv").alias("deg"))
          .groupBy("deg")
          .agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
    axis = (hist.join(em, "deg", "left")
            .select("deg", "n_nodes",
                    F.coalesce("n_edges", F.lit(0)).cast("long")
                    .alias("n_edges")))
    w_cum = (Window.orderBy("deg")
             .rowsBetween(Window.unboundedPreceding,
                          Window.currentRow))
    w_all = (Window.orderBy("deg")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    curve = (axis
             .withColumn("n_richer",
                         (F.sum("n_nodes").over(w_all)
                          - F.sum("n_nodes").over(w_cum))
                         .cast("long"))
             .withColumn("e_richer",
                         (F.sum("n_edges").over(w_all)
                          - F.sum("n_edges").over(w_cum))
                         .cast("long")))
    return (curve.join(knn, "deg")
            .select("deg", "n_nodes", "knn_ppm", "n_richer",
                    F.expr("CASE WHEN n_richer >= 2 THEN "
                           "2 * CAST(e_richer AS DECIMAL(38,0)) * 1000000 div "
                           "(CAST(n_richer AS DECIMAL(38,0)) * (n_richer - 1)) "
                           "END")
                    .cast("long").alias("rich_club_ppm")))


def motif_census(edges: DataFrame, src: str = "src_doc_id",
                 dst: str = "tgt_doc_id") -> DataFrame:
    """Global motif census (E225): wedges, triangles, 4-cycles, and
    the global clustering coefficient 3T/W in floor ppm — one row of
    structure constants distinguishing a hub-and-spoke web (many
    wedges, few closures) from a mesh (high closure) and surfacing
    the templated-navigation signature (4-cycles from grid/paginated
    link blocks far in excess of triangle closure).  Undirected
    simple view; chorded 4-cycles count (subgraph census semantics).

    Exact combinatorics from ONE wedge enumeration — the standard
    Σ C(deg_w, 2) cost triangles already pay, reused three ways:
    common-neighbor counts cn(u,v) per wedge-connected pair, then

    * ``W = Σ_v C(deg_v, 2)`` (degree fold, no join),
    * ``3T = Σ_{(u,v)∈E} cn(u,v)`` (pair table ⋈ edge set),
    * ``2·C4 = Σ_{u<v} C(cn(u,v), 2)`` (each cycle counted once per
      diagonal) — both divisions exact by construction.

    Counts ride decimal(38,0) (wedge sums pass BIGINT at 10^7-degree
    hubs).  Skew note: a 10^7-degree hub contributes C(10^7,2)
    wedge pairs — at that scale the census runs on the degree-capped
    graph like every triangle counter (cap upstream; the operator
    itself is one groupBy-join chain on uniform vertex keys).

    → 1 row ``(n_nodes, n_edges, n_wedges, n_triangles, n_4cycles,
    clustering_ppm)``.

    Reference analog: none; engine extension (SURVEY §2.10 E225).
    """
    e = (edges.select(F.col(src).cast("long").alias("s"),
                      F.col(dst).cast("long").alias("t"))
         .filter(F.col("s") != F.col("t")))
    und = e.unionByName(e.select(F.col("t").alias("s"),
                                 F.col("s").alias("t"))).distinct()
    und = und.transform(_cut)
    deg = und.groupBy(F.col("s").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("d"))
    base = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.expr("sum(d) div 2").cast("long").alias("n_edges"),
        F.sum(F.expr("cast(d * (d - 1) div 2 as decimal(38,0))"))
        .alias("w"))
    # common-neighbor counts for every wedge-connected pair u < v
    a = und.select(F.col("s").alias("w"), F.col("t").alias("u"))
    b = und.select(F.col("s").alias("w"), F.col("t").alias("v"))
    cn = (a.join(b, "w")
          .filter(F.col("u") < F.col("v"))
          .groupBy("u", "v")
          .agg(F.count(F.lit(1)).cast("long").alias("cn")))
    tri = (cn.join(und.select(F.col("s").alias("u"),
                              F.col("t").alias("v")), ["u", "v"],
                   "left_semi")
           .agg(F.sum(F.col("cn").cast("decimal(38,0)"))
                .alias("t3")))
    c4 = cn.agg(F.sum(F.expr(
        "cast(cn * (cn - 1) div 2 as decimal(38,0))")).alias("q2"))
    return (base.crossJoin(F.broadcast(tri))
            .crossJoin(F.broadcast(c4))
            .select("n_nodes", "n_edges",
                    F.col("w").cast("long").alias("n_wedges"),
                    F.expr("CAST(coalesce(t3, 0) div 3 AS BIGINT)")
                    .alias("n_triangles"),
                    F.expr("CAST(coalesce(q2, 0) div 2 AS BIGINT)")
                    .alias("n_4cycles"),
                    F.expr("CASE WHEN w > 0 THEN CAST(coalesce(t3, 0)"
                           " * 1000000 div w AS BIGINT) ELSE 0 END")
                    .alias("clustering_ppm")))


def host_simrank(hedges: DataFrame, rounds: int = 2,
                 c_num: int = 4, c_den: int = 5,
                 src: str = "src_host",
                 dst: str = "tgt_host") -> DataFrame:
    """SimRank over the host graph (E229, Jeh-Widom KDD'02): two
    hosts are similar when similar hosts link to them — the
    related-site discovery / mirror-candidate signal one level above
    E63's shared-content mirrors (SimRank needs no shared content at
    all, only shared citers).  s(a,a) = 1; s(a,b) =
    C/(|I(a)|·|I(b)|) · Σ_{u∈I(a), v∈I(b)} s(u,v), evaluated
    ``rounds`` times from the identity in EXACT integer ppm — C is
    the rational c_num/c_den (4/5), every update one floor division,
    so both engines produce identical tables.  Self-loops (a host
    citing itself) are dropped — they would make every host its own
    best citer and drown the cross-host signal.

    The identity diagonal never materializes: each round's sum
    splits into the diagonal part (common in-neighbors × 10⁶ — a
    citer self-join) and the off-diagonal part (previous sparse
    state joined through the in-edge relation twice); zero scores
    are dropped so the state stays sparse.

    Scale shape: a HOST-dim algorithm (3-4 orders below the URL
    corpus).  All-pairs state is SimRank's nature — at 10^8 hosts a
    deployment bounds it per community / to top-K citers, exactly
    like every published SimRank-at-scale system; within the host
    dim every step here is uniform-key joins + one agg, no driver
    math, state localCheckpointed per round.

    → canonical pairs ``(host_a < host_b, sim_ppm)``, sim > 0.

    Reference analog: none; engine extension (SURVEY §2.10 E229).
    """
    ie = (hedges.select(F.col(dst).alias("h"), F.col(src).alias("u"))
          .filter(F.col("h") != F.col("u")).distinct()
          .transform(_cut))
    ind = ie.groupBy("h").agg(F.count(F.lit(1)).cast("long")
                              .alias("n"))
    common = (ie.alias("x")
              .join(ie.alias("y"), F.col("x.u") == F.col("y.u"))
              .filter(F.col("x.h") != F.col("y.h"))
              .groupBy(F.col("x.h").alias("a"),
                       F.col("y.h").alias("b"))
              .agg((F.count(F.lit(1)).cast("decimal(38,0)")
                    * 1000000).alias("contrib"))
              .transform(_cut))
    state = None
    ia = ie.select(F.col("h").alias("a"), F.col("u").alias("ua"))
    ib = ie.select(F.col("h").alias("b"), F.col("u").alias("ub"))
    for _ in range(rounds):
        parts = common
        if state is not None:
            off = (state.select(F.col("a").alias("ua"),
                                F.col("b").alias("ub"),
                                F.col("s"))
                   .join(ia, "ua").join(ib, "ub")
                   .filter(F.col("a") != F.col("b"))
                   .groupBy("a", "b")
                   .agg(F.sum(F.col("s").cast("decimal(38,0)"))
                        .alias("contrib")))
            parts = parts.unionByName(off)
        tot = parts.groupBy("a", "b").agg(
            F.sum("contrib").alias("sig"))
        state = (tot
                 .join(ind.select(F.col("h").alias("a"),
                                  F.col("n").alias("na")), "a")
                 .join(ind.select(F.col("h").alias("b"),
                                  F.col("n").alias("nb")), "b")
                 .select("a", "b", F.expr(
                     f"CAST(({c_num} * sig) div "
                     f"({c_den} * na * nb) AS BIGINT)").alias("s"))
                 .filter(F.col("s") > 0)
                 .transform(_cut))
    return (state.filter(F.col("a") < F.col("b"))
            .select(F.col("a").alias("host_a"),
                    F.col("b").alias("host_b"),
                    F.col("s").alias("sim_ppm")))


def spectral_radius(edges: DataFrame, rounds: int = 4,
                    src: str = "src_host",
                    dst: str = "tgt_host") -> DataFrame:
    """Spectral radius of the undirected graph by exact-integer power
    iteration (E240) — λ_max of the adjacency matrix, the one number
    behind epidemic/cascade thresholds (a meme/worm spreads iff
    transmissibility > 1/λ_max, Wang et al. SRDS'03) and a
    connectivity-robustness summary beside E201's targeted-removal
    curve.  Per round: w = A·v (one edge-relation join + neighbor
    agg), renormalized to v' = w·10⁶ div max(w) (floor — keeps every
    component an integer ≤ 10⁶ so products never overflow
    decimal(38,0) at any graph size); the round's estimate is the
    Rayleigh quotient (vᵀAv)·10⁶ div (vᵀv).  Deterministic in any
    engine: same floors, same order-free sums.  v₀ = all-ones, so
    convergence is monotone-ish from the degree mix; emitting every
    round shows the settling (λ between max degree's sqrt and max
    degree by Perron-Frobenius — pinned in tests).

    → one row per round: ``(round, n_active, lambda_ppm)`` where
    n_active = vertices with non-zero score and lambda_ppm = the
    Rayleigh estimate ×10⁶.

    Scale shape: the pagerank shape exactly — per round one
    uniform-key join edge⋈v + one vertex agg + a 1-row max dim
    broadcast back; state localCheckpointed per round.  Self-loops
    kept (they are legitimate A entries); duplicate edges deduped.

    Reference analog: none — engine extension (SURVEY §2.10 E240).
    """
    e0 = (edges.select(F.col(src).alias("s"), F.col(dst).alias("t"))
          .distinct())
    und = (e0.select("s", "t")
           .unionByName(e0.select(F.col("t").alias("s"),
                                  F.col("s").alias("t")))
           .distinct()
           .transform(_cut))
    verts = (und.select(F.col("s").alias("v")).distinct()
             .transform(_cut))
    v = verts.select("v", F.lit(1_000_000).cast("long").alias("x"))
    out = None
    for r in range(1, rounds + 1):
        # w = A·v  (sum of neighbor scores; isolated vertices get 0)
        w = (und.join(v.select(F.col("v").alias("t"),
                               F.col("x").alias("xt")), "t")
             .groupBy(F.col("s").alias("v"))
             .agg(F.sum(F.col("xt").cast("decimal(38,0)")).alias("w"))
             .join(verts, "v", "right")
             .select("v", F.coalesce("w", F.lit(0).cast("decimal(38,0)"))
                     .alias("w"))
             .transform(_cut))
        # Rayleigh estimate BEFORE renormalizing: (vᵀw)·1e6 div (vᵀv)
        ray = (w.join(v, "v")
               .agg(F.sum(F.col("w") * F.col("x")).alias("num"),
                    F.sum(F.col("x").cast("decimal(38,0)")
                          * F.col("x")).alias("den"),
                    F.sum((F.col("w") > 0).cast("long")).cast("long")
                    .alias("n_active"))
               .select(F.lit(r).cast("long").alias("round"), "n_active",
                       F.expr("CASE WHEN den <> 0 THEN "
                              "CAST(num * 1000000 div den AS BIGINT) "
                              "END").alias("lambda_ppm")))
        out = ray if out is None else out.unionByName(ray)
        # renormalize: v' = w·1e6 div max(w)
        mx = w.agg(F.max("w").alias("mx"))
        v = (w.crossJoin(F.broadcast(mx))
             .select("v", F.expr("CASE WHEN mx > 0 THEN "
                                 "CAST(w * 1000000 div mx AS BIGINT) "
                                 "ELSE 0 END").alias("x"))
             .transform(_cut))
    return out
