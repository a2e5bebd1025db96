"""connected_components (large-star/small-star) and pagerank vs pure
Python references (union-find / dense power iteration)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _uf_components(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


def _ref_pagerank(ids, edges, n_iter=8, d=0.85):
    n = len(ids)
    out = {}
    for s, t in edges:
        out.setdefault(s, set()).add(t)
    rank = {i: 1.0 / n for i in ids}
    for _ in range(n_iter):
        dangling = sum(rank[i] for i in ids if i not in out)
        base = (1 - d) / n + d * dangling / n
        nxt = {i: 0.0 for i in ids}
        for s, ts in out.items():
            w = rank[s] / len(ts)
            for t in ts:
                nxt[t] += w
        rank = {i: base + d * nxt[i] for i in ids}
    return rank


CASES = [
    # chain + triangle + isolated vertex + self loop
    ([0, 1, 2, 3, 4, 5, 6, 7],
     [(0, 1), (1, 2), (3, 4), (4, 5), (5, 3), (7, 7)]),
    # two stars joined by a bridge
    ([10, 11, 12, 13, 20, 21, 22],
     [(10, 11), (10, 12), (10, 13), (20, 21), (20, 22), (13, 20)]),
]


@pytest.mark.spark
@pytest.mark.parametrize("ids,edges", CASES)
def test_cc_small_graphs(spark, ids, edges):
    from web_graph_spark.operators.graph_algos import connected_components

    v = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    e = spark.createDataFrame(edges or [(ids[0], ids[0])],
                              "src_doc_id long, tgt_doc_id long")
    got = {r.doc_id: r.component
           for r in connected_components(v, e).collect()}
    want = _uf_components(ids, [t for t in edges if t[0] != t[1]])
    assert got == want


@pytest.mark.spark
def test_cc_derived_web(spark):
    from web_graph_spark import webgen
    from web_graph_spark.operators.graph_algos import connected_components

    e = (webgen.links_full_df(spark, SF_SMOKE)
         .filter(F.col("k") % 4 != 0)
         .select("src_doc_id", "tgt_doc_id").distinct())
    v = webgen.pages_df(spark, SF_SMOKE).select("doc_id")
    got = {r.doc_id: r.component
           for r in connected_components(v, e).collect()}
    ids = [r.doc_id for r in v.collect()]
    pairs = [(r.src_doc_id, r.tgt_doc_id) for r in e.collect()]
    want = _uf_components(ids, pairs)
    assert got == want


@pytest.mark.spark
def test_pagerank_matches_reference(spark):
    from web_graph_spark import webgen
    from web_graph_spark.operators.graph_algos import pagerank

    e = (webgen.links_full_df(spark, SF_SMOKE)
         .filter(F.col("k") % 4 != 0)
         .select("src_doc_id", "tgt_doc_id").distinct())
    v = webgen.pages_df(spark, SF_SMOKE).select("doc_id")
    got = {r.doc_id: r.rank for r in pagerank(v, e, n_iter=6).collect()}
    ids = [r.doc_id for r in v.collect()]
    pairs = [(r.src_doc_id, r.tgt_doc_id)
             for r in e.collect() if r.src_doc_id != r.tgt_doc_id]
    want = _ref_pagerank(ids, pairs, n_iter=6)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for i in ids:
        assert got[i] == pytest.approx(want[i], rel=1e-9, abs=1e-12)


@pytest.mark.spark
def test_triangle_counts_hand_graph(spark):
    """K4 + a pendant + a disconnected edge, fed as DIRTY input
    (duplicate reversed edges, a self-loop): every K4 vertex sits in 3
    triangles; vertex 3 also carries the pendant so its coefficient
    halves; non-triangle vertices report 0 with their true degree."""
    from web_graph_spark.operators.graph_algos import triangle_counts

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),  # K4
         (3, 4),                                           # pendant
         (5, 6),                                           # far away
         (1, 0), (2, 2)],                                  # dupe + loop
        "src_doc_id long, tgt_doc_id long")
    got = {r["doc_id"]: r.asDict() for r in triangle_counts(edges).collect()}
    assert len(got) == 7
    for v in (0, 1, 2):
        assert got[v] == dict(doc_id=v, degree=3, n_triangles=3,
                              cc_bp=10000)
    assert got[3] == dict(doc_id=3, degree=4, n_triangles=3, cc_bp=5000)
    for v in (4, 5, 6):
        assert got[v] == dict(doc_id=v, degree=1, n_triangles=0, cc_bp=0)


@pytest.mark.spark
def test_bfs_depths_hand_graph(spark):
    """Chain 0→1→2→3, a cycle 2→0 (must not loop), a shortcut 0→3
    (min-depth wins), an unreachable island 8→9, and a second seed 5
    with its own branch 5→6.  Directed: 1→0 absent, so nothing gains
    depth via reverse edges."""
    from web_graph_spark.operators.graph_algos import bfs_depths

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (2, 0), (0, 3), (8, 9), (5, 6), (6, 2)],
        "src_doc_id long, tgt_doc_id long")
    seeds = spark.createDataFrame([(0,), (5,)], "doc_id long")
    got = {r["doc_id"]: r["depth"] for r in bfs_depths(edges, seeds).collect()}
    assert got == {0: 0, 5: 0, 1: 1, 3: 1, 6: 1, 2: 2}


@pytest.mark.spark
def test_bfs_depths_max_depth_guard(spark):
    """A 5-chain with max_depth=2 must raise, not silently truncate."""
    from web_graph_spark.operators.graph_algos import bfs_depths

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src_doc_id long, tgt_doc_id long")
    seeds = spark.createDataFrame([(0,)], "doc_id long")
    with pytest.raises(RuntimeError, match="max_depth"):
        bfs_depths(edges, seeds, max_depth=2)


def _ref_hits(ids, pairs, n_iter):
    """Dense pure-Python HITS with L1 normalization (float)."""
    pairs = sorted({(u, v) for u, v in pairs if u != v})
    hub = {i: 1.0 / len(ids) for i in ids}
    auth = {i: 0.0 for i in ids}
    for _ in range(n_iter):
        auth = {i: 0.0 for i in ids}
        for u, v in pairs:
            auth[v] += hub[u]
        s = sum(auth.values())
        if s > 0:
            auth = {i: x / s for i, x in auth.items()}
        hub = {i: 0.0 for i in ids}
        for u, v in pairs:
            hub[u] += auth[v]
        s = sum(hub.values())
        if s > 0:
            hub = {i: x / s for i, x in hub.items()}
    return hub, auth


@pytest.mark.spark
def test_hits_matches_reference(spark):
    from web_graph_spark import webgen
    from web_graph_spark.operators.graph_algos import hits

    e = (webgen.links_full_df(spark, SF_SMOKE)
         .filter(F.col("k") % 4 != 0)
         .select("src_doc_id", "tgt_doc_id").distinct())
    v = webgen.pages_df(spark, SF_SMOKE).select("doc_id")
    got = {r.doc_id: (r.hub, r.auth) for r in hits(v, e, n_iter=6).collect()}
    ids = [r.doc_id for r in v.collect()]
    pairs = [(r.src_doc_id, r.tgt_doc_id) for r in e.collect()]
    want_h, want_a = _ref_hits(ids, pairs, n_iter=6)
    assert abs(sum(h for h, _ in got.values()) - 1.0) < 1e-9
    assert abs(sum(a for _, a in got.values()) - 1.0) < 1e-9
    for i in ids:
        assert got[i][0] == pytest.approx(want_h[i], rel=1e-9, abs=1e-12)
        assert got[i][1] == pytest.approx(want_a[i], rel=1e-9, abs=1e-12)


@pytest.mark.spark
def test_bfs_depths_exact_max_depth_completes(spark):
    """Deepest level == max_depth must complete (the guard fires only
    when an unvisited frontier exists BEYOND the cap)."""
    from web_graph_spark.operators.graph_algos import bfs_depths

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src_doc_id long, tgt_doc_id long")
    seeds = spark.createDataFrame([(0,)], "doc_id long")
    got = {r["doc_id"]: r["depth"]
           for r in bfs_depths(edges, seeds, max_depth=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


@pytest.mark.spark
def test_label_propagation_hand_graph(spark):
    """Two triangles joined by one bridge edge: after sync mode-LPA
    with min-label tie-break, each triangle converges to its own
    minimum id (hand-simulated; the bridge's single vote never
    outweighs the two in-triangle votes).  Isolated vertex 9 keeps
    its own label."""
    from web_graph_spark.operators.graph_algos import label_propagation

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)],
        "src_doc_id long, tgt_doc_id long")
    verts = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 4, 5, 9]],
                                  "doc_id long")
    got = {r["doc_id"]: r["community"]
           for r in label_propagation(verts, edges, iters=4).collect()}
    # hand-sim round 1: 0←min(1,2)=1? mode over {1,2}: tie → 1... the
    # deterministic fixpoint for each triangle is its min id; verified
    # against the unrolled-SQL oracle in the contract gate as well.
    assert got[9] == 9
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]


@pytest.mark.spark
def test_label_propagation_deterministic(spark):
    """Same input twice ⇒ identical labelling (the tie-break is total,
    no RNG anywhere)."""
    from web_graph_spark.operators.graph_algos import label_propagation

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 20) for i in range(20)] +
        [(i, (i + 1) % 20) for i in range(20)],
        "src_doc_id long, tgt_doc_id long")
    verts = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    a = sorted(map(tuple, label_propagation(verts, edges, iters=4).collect()))
    b = sorted(map(tuple, label_propagation(verts, edges, iters=4).collect()))
    assert a == b


@pytest.mark.spark
def test_scc_bowtie_graph(spark):
    """Broder bowtie: IN-tendril 0 → core cycle {1,2,3} → OUT chain
    4,5; a separate 2-cycle {6,7}; isolated 8.  SCC must separate the
    core from both tendrils (undirected CC would merge 0-5)."""
    from web_graph_spark.operators.graph_algos import (
        strongly_connected_components)

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (6, 7), (7, 6)],
        "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(i,) for i in range(9)], "doc_id long")
    got = {r["doc_id"]: r["scc"]
           for r in strongly_connected_components(v, e).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6, 7: 6, 8: 8}


@pytest.mark.spark
def test_scc_chain_peels_to_singletons(spark):
    """Acyclic chain: every vertex is its own SCC — the refinement
    loop's worst peel case still terminates and is exact."""
    from web_graph_spark.operators.graph_algos import (
        strongly_connected_components)

    e = spark.createDataFrame([(i, i + 1) for i in range(6)],
                              "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    got = {r["doc_id"]: r["scc"]
           for r in strongly_connected_components(v, e).collect()}
    assert got == {i: i for i in range(7)}


@pytest.mark.spark
def test_bowtie_classify_regions(spark):
    """Full Broder taxonomy on a hand graph: IN-tendril 0 feeds core
    {1,2,3}, OUT chain 4,5; 10 hangs off IN-vertex 0 (weakly connected,
    neither reaches nor is reached by the core → TENDRIL); the
    separate 2-cycle {6,7} and isolated 8 are DISC."""
    from web_graph_spark.operators.graph_algos import bowtie_classify

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 1), (3, 4), (4, 5),
         (6, 7), (7, 6), (0, 10)],
        "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 4, 5, 6, 7, 8, 10]],
                              "doc_id long")
    got = {r["doc_id"]: r["region"]
           for r in bowtie_classify(v, e).collect()}
    assert got == {0: "IN", 1: "CORE", 2: "CORE", 3: "CORE",
                   4: "OUT", 5: "OUT", 6: "DISC", 7: "DISC",
                   8: "DISC", 10: "TENDRIL"}


@pytest.mark.spark
def test_kcore_hand_graph(spark):
    """K4 {0,1,2,3} survives the 3-core with core_deg=3 each; the
    pendant chain 3-4-5 peels away (4 and 5 never reach degree 3,
    and their removal does not disturb the clique)."""
    from web_graph_spark.operators.graph_algos import kcore

    v = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
         (3, 4), (4, 5)],
        "src_doc_id long, tgt_doc_id long")
    got = {r.doc_id: r.core_deg for r in kcore(v, e, k=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


@pytest.mark.spark
def test_kcore_extra_rounds_noop(spark):
    """Peeling is monotone: once converged, extra rounds change
    nothing — pins that the contract's fixed round count is safe on
    the derived web (rounds=6 vs rounds=8 identical)."""
    from web_graph_spark import webgen
    from web_graph_spark.operators.graph_algos import kcore

    e = (webgen.links_full_df(spark, SF_SMOKE)
         .filter(F.col("k") % 4 != 0)
         .select("src_doc_id", "tgt_doc_id").distinct())
    v = webgen.pages_df(spark, SF_SMOKE).select("doc_id")
    a = sorted((r.doc_id, r.core_deg)
               for r in kcore(v, e, k=3, rounds=6).collect())
    b = sorted((r.doc_id, r.core_deg)
               for r in kcore(v, e, k=3, rounds=8).collect())
    assert a == b and len(a) > 0


@pytest.mark.spark
def test_random_walks_hand_graph(spark):
    """random_walks ≡ a pure-Python simulator of the same hash rule
    on a hand graph (hub + chain + sink): step t of walk w goes to the
    dst-sorted neighbor at index hex16(md5(f"{w}:{t}")) mod degree;
    sink walks end early; every walk has steps 0..k with no gaps."""
    import hashlib

    from web_graph_spark.operators.graph_algos import random_walks

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (3, 1), (4, 5)]  # 5=sink
    adj = {}
    for s, t in edges:
        adj.setdefault(s, []).append(t)
    for s in adj:
        adj[s].sort()

    def hex16(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)

    expect = set()
    for seed in (1, 2, 3, 4, 5):
        for rep in (0, 1):
            w, v = f"{seed}:{rep}", seed
            expect.add((w, 0, v))
            for t in range(1, 5):
                if v not in adj:
                    break
                v = adj[v][hex16(f"{w}:{t}") % len(adj[v])]
                expect.add((w, t, v))

    e = spark.createDataFrame(edges, "src_doc_id long, tgt_doc_id long")
    seeds = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5)],
                                  "doc_id long")
    got = {(r.walk_id, r.step, r.vertex)
           for r in random_walks(e, seeds, length=4, n_walks=2).collect()}
    assert got == expect
    # sink termination is actually exercised on this graph
    assert any(v == 5 for (_, s, v) in expect if s < 4)


@pytest.mark.spark
def test_ra_link_predict_hand_graph(spark):
    """RA index on a hand graph: exact ppm weights, min_common
    pruning, the deg_cap center cut, and adjacency exclusion."""
    from web_graph_spark.operators.graph_algos import ra_link_predict

    # z=3 bridges {1,2} (deg 2); z=4 bridges {1,2,5} (deg 3)
    edges = spark.createDataFrame(
        [(1, 3), (2, 3), (1, 4), (2, 4), (5, 4)],
        "src_doc_id long, tgt_doc_id long")
    got = ra_link_predict(edges).collect()
    # the graph is undirected: (3,4) is also predicted, via common
    # neighbors {1,2} (deg 2 each -> 10^6/2 + 10^6/2), and outranks
    # (1,2) whose centers are deg 2 and deg 3
    assert [(r.a, r.b, r.n_common, r.ra_ppm) for r in got] == [
        (3, 4, 2, 1_000_000),
        (1, 2, 2, 1_000_000 // 2 + 1_000_000 // 3)]

    # capping out the deg-3 center leaves (1,2) with one common
    # neighbor -> pruned by min_common; (3,4)'s centers are deg 2
    capped = ra_link_predict(edges, deg_cap=2).collect()
    assert [(r.a, r.b) for r in capped] == [(3, 4)]

    # an existing 1-2 edge suppresses the prediction entirely
    with_edge = edges.union(spark.createDataFrame(
        [(1, 2)], "src_doc_id long, tgt_doc_id long"))
    assert ra_link_predict(with_edge).filter(
        "a = 1 AND b = 2").count() == 0


@pytest.mark.spark
def test_modularity_hand_graph(spark):
    """Two triangles joined by one bridge edge, labels = the known
    two-community split: m=7; each community has e_c=3 internal
    edges; degrees (2,2,3)+(3,2,2) → deg_sum=7 each.  q_num =
    4·7·3 − 49 = 35 per community → Q = 70/196 ≈ 0.357, the textbook
    value for this graph."""
    from web_graph_spark.operators.graph_algos import (
        modularity_by_community)

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)],
        "src_doc_id long, tgt_doc_id long")
    verts = spark.createDataFrame([(i,) for i in range(6)],
                                  "doc_id long")
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 3)],
        "doc_id long, community long")
    rows = {r["community"]: r for r in
            modularity_by_community(verts, edges, labels).collect()}
    for c in (0, 3):
        assert rows[c]["n_members"] == 3
        assert rows[c]["n_internal"] == 3
        assert rows[c]["deg_sum"] == 7
        assert rows[c]["m_edges"] == 7
        assert rows[c]["q_num"] == 4 * 7 * 3 - 49
    q = sum(r["q_num"] for r in rows.values()) / (4 * 7 * 7)
    assert abs(q - 70 / 196) < 1e-12


@pytest.mark.spark
def test_modularity_isolated_and_split_community(spark):
    """An isolated vertex forms a degree-0 community with q_num=0;
    a 'community' that is actually two disconnected halves scores
    0 internal edges and a negative q_num (worse than random)."""
    from web_graph_spark.operators.graph_algos import (
        modularity_by_community)

    edges = spark.createDataFrame(
        [(0, 1), (2, 3)], "src_doc_id long, tgt_doc_id long")
    verts = spark.createDataFrame([(i,) for i in range(5)],
                                  "doc_id long")
    labels = spark.createDataFrame(
        [(0, 0), (2, 0), (1, 1), (3, 1), (4, 4)],
        "doc_id long, community long")
    rows = {r["community"]: r for r in
            modularity_by_community(verts, edges, labels).collect()}
    assert rows[4]["q_num"] == 0 and rows[4]["deg_sum"] == 0
    # communities {0,2} and {1,3} each straddle the two edges:
    # 0 internal, deg_sum 2, m=2 → q_num = -4
    assert rows[0]["n_internal"] == 0 and rows[0]["q_num"] == -4
    assert rows[1]["n_internal"] == 0 and rows[1]["q_num"] == -4


@pytest.mark.spark
def test_personalized_pagerank_hand_graph(spark):
    """Seed {0}, edges 0→1, 0→2, 1→2, scale=1000, 2 rounds —
    hand-traced: tele=150; r1 = {0:150, 1:425, 2:425};
    r2: inc(1)=150 div 2=75 → 63; inc(2)=75+425=500 → 425."""
    from web_graph_spark.operators.graph_algos import personalized_pagerank

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "src_doc_id long, tgt_doc_id long")
    seeds = spark.createDataFrame([(0,)], "seed_seq long")
    got = {r["doc_id"]: r["ppr"]
           for r in personalized_pagerank(edges, seeds, rounds=2,
                                          scale=1000).collect()}
    assert got == {0: 150, 1: 63, 2: 425}


@pytest.mark.spark
def test_personalized_pagerank_mass_and_seeds(spark):
    """Total mass never exceeds scale (evaporation only), every seed
    keeps at least the teleport floor, and an empty seed set is a
    loud error."""
    from web_graph_spark.operators.graph_algos import personalized_pagerank

    edges = spark.createDataFrame(
        [(i, (i * 3 + 1) % 7) for i in range(7)],
        "src_doc_id long, tgt_doc_id long")
    seeds = spark.createDataFrame([(0,), (3,)], "seed_seq long")
    rows = personalized_pagerank(edges, seeds, rounds=4,
                                 scale=10 ** 6).collect()
    got = {r["doc_id"]: r["ppr"] for r in rows}
    assert sum(got.values()) <= 10 ** 6
    tele = (15 * 10 ** 6 // 100) // 2
    assert got[0] >= tele and got[3] >= tele
    import pyspark.sql.utils  # noqa: F401
    empty = spark.createDataFrame([], "seed_seq long")
    with pytest.raises(ValueError):
        personalized_pagerank(edges, empty, rounds=1)


@pytest.mark.spark
def test_opic_hand_graph(spark):
    """Vertices {0,1,2,3}; edges 0→1, 0→3, 1→2, 2→0; 3 dangling;
    scale=1200 (c0=300 each), 2 rounds — hand-traced:
    r1: D=300→share 75; inc=(300,150,300,150); c1=(375,225,375,225),
    h1=300 each.  r2: D=225→share 56; inc=(375,187,225,187);
    c2=(431,243,281,243), h2=(675,525,675,525);
    importance=(1106,768,956,768)."""
    from web_graph_spark.operators.graph_algos import opic_importance

    edges = spark.createDataFrame(
        [(0, 1), (0, 3), (1, 2), (2, 0)],
        "src_doc_id long, tgt_doc_id long")
    verts = spark.createDataFrame([(i,) for i in range(4)],
                                  "doc_id long")
    got = {r["doc_id"]: (r["cash"], r["hist"], r["importance"])
           for r in opic_importance(edges, verts, rounds=2,
                                    scale=1200).collect()}
    assert got == {0: (431, 675, 1106), 1: (243, 525, 768),
                   2: (281, 675, 956), 3: (243, 525, 768)}


@pytest.mark.spark
def test_opic_conservation_and_evaporation(spark):
    """Cash conservation up to documented evaporation (Σcash ≤ scale,
    never grows), importance = hist + cash everywhere, a target
    outside the vertex set silently evaporates its received cash
    (state id set never grows), and an empty vertex set is a loud
    error."""
    from web_graph_spark.operators.graph_algos import opic_importance

    edges = spark.createDataFrame(
        [(i, (i * 5 + 2) % 9) for i in range(9)],
        "src_doc_id long, tgt_doc_id long")
    verts = spark.createDataFrame([(i,) for i in range(9)],
                                  "doc_id long")
    rows = opic_importance(edges, verts, rounds=4,
                           scale=10 ** 6).collect()
    assert sum(r["cash"] for r in rows) <= 10 ** 6
    assert all(r["importance"] == r["hist"] + r["cash"] for r in rows)

    leaky = spark.createDataFrame([(0, 1), (1, 5)],
                                  "src_doc_id long, tgt_doc_id long")
    small = spark.createDataFrame([(0,), (1,)], "doc_id long")
    out = opic_importance(leaky, small, rounds=3, scale=1000).collect()
    assert {r["doc_id"] for r in out} == {0, 1}
    assert sum(r["cash"] for r in out) <= 1000

    empty = spark.createDataFrame([], "doc_id long")
    with pytest.raises(ValueError):
        opic_importance(edges, empty, rounds=1)


@pytest.mark.spark
def test_reciprocity_hand_graph(spark):
    from web_graph_spark.operators.graph_algos import reciprocity

    # hostA: 1->2 (recip), 2->1 (recip), 1->3 (not), 1->1 (self loop,
    # excluded), duplicate 1->2 rows collapse; hostB: 4->1 (not).
    edges = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1), (1, 3), (1, 1), (4, 1)],
        "src_doc_id long, tgt_doc_id long")
    groups = spark.createDataFrame(
        [(1, "hostA"), (2, "hostA"), (3, "hostA"), (4, "hostB")],
        "src_doc_id long, host string")
    got = {r["host"]: (r["n_edges"], r["n_recip"], r["recip_bp"])
           for r in reciprocity(edges, groups).collect()}
    assert got == {"hostA": (3, 2, 6666), "hostB": (1, 0, 0)}


@pytest.mark.spark
def test_hyperball_matches_exact_ball_rebuild(spark):
    """On an explicit small graph, every node's HyperBall output
    equals a python rebuild of HLL registers over its EXACT bounded
    out-reachability ball (HLL(S) = register-wise max over members) —
    pins seeding, propagation direction, hop bound, and the fold."""
    import hashlib

    from web_graph_spark.functions.stats import HLL_M, HLL_WBITS, _HLL_NUM
    from web_graph_spark.operators.graph_algos import hyperball

    # 0→1→2→3→4 path plus 0→5, 5→2 shortcut and a 6↔7 cycle
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 2), (6, 7),
             (7, 6)]
    verts = list(range(8))
    e = spark.createDataFrame(edges, "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(x,) for x in verts], "doc_id long")

    def exact_ball(start, hops):
        ball, frontier = {start}, {start}
        for _ in range(hops):
            frontier = {t for s, t in edges if s in frontier}
            ball |= frontier
        return ball

    def rebuild(ball):
        regs: dict[int, int] = {}
        for u in ball:
            h = hashlib.md5(str(u).encode()).hexdigest()
            a = [int(h[s:s + 4], 16) for s in (0, 4, 8)]
            w = a[1] * 65536 + a[2]
            rho = HLL_WBITS + 1 - (w.bit_length() if w else 0)
            j = a[0] % HLL_M
            regs[j] = max(regs.get(j, 0), rho)
        s2 = (sum(1 << (HLL_WBITS + 1 - m) for m in regs.values())
              + (HLL_M - len(regs)) * (1 << (HLL_WBITS + 1)))
        return len(regs), s2, _HLL_NUM // (1000 * s2)

    got = {r.doc_id: (r.n_regs, r.s2, r.n_ball)
           for r in hyperball(e, v, n_hops=2).collect()}
    assert got == {x: rebuild(exact_ball(x, 2)) for x in verts}


@pytest.mark.spark
def test_hyperball_saturation_and_induced_subgraph(spark):
    """Early exit: on a diameter-2 graph, n_hops=50 equals the full
    transitive closure (register mass saturates, the loop stops).
    Membership semantics: a node OUTSIDE the vertex set is never a
    ball member and never reported, but it DOES relay — a path
    through it still connects vertices, one hop per physical edge."""
    import hashlib

    from web_graph_spark.functions.stats import HLL_M, HLL_WBITS, _HLL_NUM
    from web_graph_spark.operators.graph_algos import hyperball

    # 9 is not a vertex; 0→9→3 is the ONLY path from 0 to 3
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 9), (9, 2), (9, 3)],
        "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(0,), (1,), (2,), (3,)], "doc_id long")

    def rebuild(ball):
        regs: dict[int, int] = {}
        for u in ball:
            h = hashlib.md5(str(u).encode()).hexdigest()
            a = [int(h[s:s + 4], 16) for s in (0, 4, 8)]
            w = a[1] * 65536 + a[2]
            rho = HLL_WBITS + 1 - (w.bit_length() if w else 0)
            j = a[0] % HLL_M
            regs[j] = max(regs.get(j, 0), rho)
        s2 = (sum(1 << (HLL_WBITS + 1 - m) for m in regs.values())
              + (HLL_M - len(regs)) * (1 << (HLL_WBITS + 1)))
        return len(regs), s2, _HLL_NUM // (1000 * s2)

    got = {r.doc_id: (r.n_regs, r.s2, r.n_ball)
           for r in hyperball(e, v, n_hops=50).collect()}
    # 9 is reported for no one and a member of no ball, yet 3 is in
    # 0's ball (reachable only through 9)
    assert got == {0: rebuild({0, 1, 2, 3}), 1: rebuild({1, 2}),
                   2: rebuild({2}), 3: rebuild({3})}


@pytest.mark.spark
def test_harmonic_hyperball_matches_delta_rebuild(spark):
    """Scores equal a python rebuild from exact per-t balls: estimate
    each n_t via the register recipe, then 6·Δ₁+3·Δ₂+2·Δ₃.  An
    isolated node scores 0; a diameter-1 star center collects its
    whole delta at t=1 (×6 weight); early-exit padding (graph
    saturates at t=2 < n_hops) contributes exactly 0."""
    import hashlib

    from web_graph_spark.functions.stats import HLL_M, HLL_WBITS, _HLL_NUM
    from web_graph_spark.operators.graph_algos import harmonic_hyperball

    # star 0→{1,2,3}, path 1→4, 4→5 is beyond the star's 3 hops?  no:
    # 0→1(1) →4(2) →5(3); isolated node 6
    edges = [(0, 1), (0, 2), (0, 3), (1, 4), (4, 5)]
    verts = list(range(7))
    e = spark.createDataFrame(edges, "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(x,) for x in verts], "doc_id long")

    def est(ball):
        regs: dict[int, int] = {}
        for u in ball:
            h = hashlib.md5(str(u).encode()).hexdigest()
            a = [int(h[s:s + 4], 16) for s in (0, 4, 8)]
            w = a[1] * 65536 + a[2]
            rho = HLL_WBITS + 1 - (w.bit_length() if w else 0)
            j = a[0] % HLL_M
            regs[j] = max(regs.get(j, 0), rho)
        s2 = (sum(1 << (HLL_WBITS + 1 - m) for m in regs.values())
              + (HLL_M - len(regs)) * (1 << (HLL_WBITS + 1)))
        return _HLL_NUM // (1000 * s2)

    def ball(start, hops):
        b, fr = {start}, {start}
        for _ in range(hops):
            fr = {t for s, t in edges if s in fr}
            b |= fr
        return b

    def score(x):
        n = [est(ball(x, t)) for t in range(4)]
        return (n[3], 6 * (n[1] - n[0]) + 3 * (n[2] - n[1])
                + 2 * (n[3] - n[2]))

    got = {r.doc_id: (r.n_ball, r.h_lcm)
           for r in harmonic_hyperball(e, v, n_hops=3).collect()}
    assert got == {x: score(x) for x in verts}
    # isolated node: every delta 0
    assert got[6][1] == 0


@pytest.mark.spark
def test_neighborhood_function_effective_diameter(spark):
    """Self-consistency pins: fracs are monotone, the horizon frac is
    exactly 10000, the flag sits on exactly the FIRST t whose
    reported frac crosses 9000 (at toy ball sizes the raw-estimator
    inflation can put that at t=0 — the flag must follow the reported
    curve, whatever it is), and early-exit padding (clique saturates
    at t=1) repeats the totals exactly."""
    from web_graph_spark.operators.graph_algos import neighborhood_function

    def check(rows):
        fracs = [rows[t].frac_bp for t in range(4)]
        assert fracs == sorted(fracs)
        assert fracs[3] == 10000
        want_eff = min(t for t in range(4) if fracs[t] >= 9000)
        assert [t for t in range(4) if rows[t].is_effective] == [want_eff]

    cyc = spark.createDataFrame([(i, (i + 1) % 4) for i in range(4)],
                                "src_doc_id long, tgt_doc_id long")
    v4 = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    rows = {r.t: r for r in neighborhood_function(cyc, v4,
                                                  n_hops=3).collect()}
    check(rows)
    # the 4-cycle keeps growing through t=3: all totals distinct
    assert len({rows[t].n_pairs for t in range(4)}) == 4

    k4 = spark.createDataFrame(
        [(i, j) for i in range(4) for j in range(4) if i != j],
        "src_doc_id long, tgt_doc_id long")
    rows = {r.t: r for r in neighborhood_function(k4, v4,
                                                  n_hops=3).collect()}
    check(rows)
    # clique: ball(1) = everything; early exit pads t=2,3 exactly
    assert rows[1].n_pairs == rows[2].n_pairs == rows[3].n_pairs


@pytest.mark.spark
def test_ktruss_hand_graph_and_convergence(spark):
    """K4 + an attached triangle + a pendant, fed dirty (dupes,
    reversed edges, a self-loop): the 4-truss is exactly K4's 6 edges
    each with support 2 (the triangle's third edges peel once their
    shared-with-K4 support collapses... they never had 2); the
    3-truss keeps K4 plus the triangle (support ≥ 1); the pendant
    edge never survives.  Cascade pin: peeling K4's triangle-support
    is simultaneous, not sequential.  Convergence: rounds=2 and
    rounds=6 agree on this graph (extra rounds are no-ops)."""
    from web_graph_spark.operators.graph_algos import ktruss

    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),  # K4
             (3, 4), (4, 5), (3, 5),                           # triangle
             (5, 6),                                           # pendant
             (1, 0), (2, 2)]                                   # dirt
    e = spark.createDataFrame(edges, "src_doc_id long, tgt_doc_id long")

    t4 = {(r.u, r.v): r.support for r in ktruss(e, k=4, rounds=6).collect()}
    assert t4 == {(0, 1): 2, (0, 2): 2, (0, 3): 2,
                  (1, 2): 2, (1, 3): 2, (2, 3): 2}

    t3 = {(r.u, r.v): r.support for r in ktruss(e, k=3, rounds=6).collect()}
    assert set(t3) == set(t4) | {(3, 4), (4, 5), (3, 5)}
    assert t3[(3, 4)] == t3[(4, 5)] == t3[(3, 5)] == 1
    assert (5, 6) not in t3

    fast = {(r.u, r.v): r.support
            for r in ktruss(e, k=4, rounds=2).collect()}
    assert fast == t4


@pytest.mark.spark
def test_sssp_weighted_semantics(spark):
    """The cheap MANY-hop path beats the expensive short one (what
    bfs_depths can't express); parallel edges collapse to min weight;
    multi-seed takes the global min; unreachable nodes are absent;
    a round cap below the cheap path's hop count falls back to the
    best path within the cap."""
    from web_graph_spark.operators.graph_algos import sssp

    edges = [
        (0, 9, 10),                       # direct but expensive
        (0, 1, 1), (1, 2, 1), (2, 3, 1), (3, 9, 1),   # 4 hops, cost 4
        (0, 1, 7),                        # parallel edge, worse
        (5, 9, 2),                        # second seed's route
        (7, 8, 1),                        # unreachable island
    ]
    e = spark.createDataFrame(edges, "src_doc_id long, tgt_doc_id long, w long")
    seeds = spark.createDataFrame([(0,), (5,)], "doc_id long")
    got = {r.doc_id: r.dist for r in sssp(e, seeds, rounds=8).collect()}
    assert got == {0: 0, 5: 0, 1: 1, 2: 2, 3: 3, 9: 2}
    # 9 via seed 5 costs 2 (beats the 4-hop cost-4 and the direct 10)

    solo = spark.createDataFrame([(0,)], "doc_id long")
    got = {r.doc_id: r.dist for r in sssp(e, solo, rounds=8).collect()}
    assert got[9] == 4                    # the many-hop cheap path
    capped = {r.doc_id: r.dist
              for r in sssp(e, solo, rounds=2).collect()}
    assert capped[9] == 10                # only the direct edge fits


@pytest.mark.spark
def test_sssp_matches_python_bellman_ford(spark):
    """rounds=8 on the derived web equals a pure-python synchronous
    Bellman-Ford run for the same 8 relaxations — the truncated-
    horizon semantics (exact over ≤8-edge paths) replicated exactly,
    on a graph where cheap long paths genuinely keep improving past
    the cap (so the pin exercises the truncation, not just the
    fixpoint)."""
    from web_graph_spark import webgen
    from web_graph_spark.operators.graph_algos import sssp

    l = webgen.links_full_df(spark, SF_SMOKE).filter(F.col("k") % 4 != 0)
    e = l.select("src_doc_id", "tgt_doc_id",
                 ((F.col("k") % 7) + 1).alias("w"))
    seeds = (webgen.pages_df(spark, SF_SMOKE)
             .filter(F.col("doc_id") % 97 == 0).select("doc_id"))
    got = {r.doc_id: r.dist for r in sssp(e, seeds, rounds=8).collect()}

    ew = {}
    for r in e.collect():
        if r.src_doc_id != r.tgt_doc_id:
            key = (r.src_doc_id, r.tgt_doc_id)
            ew[key] = min(ew.get(key, 1 << 60), r.w)
    dist = {r.doc_id: 0 for r in seeds.collect()}
    for _ in range(8):
        nxt = dict(dist)
        for (s, t), w in ew.items():
            if s in dist and dist[s] + w < nxt.get(t, 1 << 60):
                nxt[t] = dist[s] + w
        dist = nxt
    assert got == dist and got


@pytest.mark.spark
def test_stress_centrality_hand_traced(spark):
    from web_graph_spark.operators.graph_algos import stress_centrality

    def run(edges, seeds, horizon=6):
        e = spark.createDataFrame(edges,
                                  "src_doc_id long, tgt_doc_id long")
        s = spark.createDataFrame([(x,) for x in seeds], "doc_id long")
        return {r.doc_id: (r.n_sources, r.stress)
                for r in stress_centrality(e, s,
                                           horizon=horizon).collect()}

    # path s(0)->1->2->3: interior vertices carry the through-paths
    got = run([(0, 1), (1, 2), (2, 3)], [0])
    assert got == {1: (1, 2), 2: (1, 1), 3: (1, 0)}

    # branching: 0->1, 1->2, 1->3, 2->4, 3->4 — four paths cross 1,
    # none cross the confluence 4 (endpoints are not interior)
    got = run([(0, 1), (1, 2), (1, 3), (2, 4), (3, 4)], [0])
    assert got[1] == (1, 4) and got[4] == (1, 0)
    assert got[2] == (1, 1) and got[3] == (1, 1)

    # horizon truncation: radius 2 cannot see 0->..->3 paths
    got = run([(0, 1), (1, 2), (2, 3)], [0], horizon=2)
    assert got == {1: (1, 1), 2: (1, 0)}

    # two seeds: stress adds per source, n_sources counts reach
    got = run([(0, 2), (1, 2), (2, 3)], [0, 1])
    assert got[2] == (2, 2) and got[3] == (2, 0)

    # only SHORTEST paths count: a longer detour contributes nothing
    got = run([(0, 1), (1, 3), (0, 2), (2, 4), (4, 3)], [0])
    assert got[1] == (1, 1)     # 0-1-3
    assert got[2] == (1, 1)     # 0-2-4 (4 is reached shortest via 2)
    assert got[4] == (1, 0)     # 0-..-4-3 is not shortest to 3


@pytest.mark.spark
def test_widest_paths_hand_traced(spark):
    from web_graph_spark.operators.graph_algos import widest_paths

    def run(edges, seeds, rounds=8):
        e = spark.createDataFrame(
            edges, "src_doc_id long, tgt_doc_id long, w long")
        s = spark.createDataFrame([(x,) for x in seeds], "doc_id long")
        return {r.doc_id: r.cap
                for r in widest_paths(e, s, rounds=rounds).collect()}

    # classic: wide detour beats the narrow direct edge
    got = run([(0, 1, 2), (0, 2, 9), (2, 1, 7)], [0])
    assert got == {1: 7, 2: 9}

    # bottleneck is the MIN along the path, maximized across paths
    got = run([(0, 1, 5), (1, 2, 3), (0, 3, 4), (3, 2, 4)], [0])
    assert got[2] == 4 and got[1] == 5 and got[3] == 4

    # parallel edges keep the best capacity
    got = run([(0, 1, 2), (0, 1, 8)], [0])
    assert got == {1: 8}

    # round truncation: a 3-edge route is invisible at rounds=2
    got = run([(0, 1, 9), (1, 2, 9), (2, 3, 9), (0, 3, 1)], [0],
              rounds=2)
    assert got[3] == 1
    got = run([(0, 1, 9), (1, 2, 9), (2, 3, 9), (0, 3, 1)], [0],
              rounds=3)
    assert got[3] == 9

    # seeds never appear in the output, even when re-reached
    got = run([(0, 1, 5), (1, 0, 5)], [0])
    assert got == {1: 5}


@pytest.mark.spark
def test_degree_assortativity_sign_pins(spark):
    from web_graph_spark.operators.graph_algos import degree_assortativity

    def run(edges):
        e = spark.createDataFrame(edges,
                                  "src_doc_id long, tgt_doc_id long")
        return degree_assortativity(e).collect()[0]

    # star graph: hub wires only to leaves -> perfectly disassortative
    star = [(0, i) for i in range(1, 6)]
    r = run(star)
    assert r.n_edges == 5 and r.cov_sign == -1 and r.r2_ppm == 1_000_000

    # two disjoint cliques: every endpoint pair has equal degree ->
    # zero variance... use a clique + pendant chain mix instead:
    # path graph P4: ends (deg1) attach to middles (deg2) and the
    # middle edge is 2-2 -> negative but not perfect
    r = run([(1, 2), (2, 3), (3, 4)])
    assert r.cov_sign == -1 and 0 < r.r2_ppm < 1_000_000

    # symmetrization makes Sx = Sy: a regular graph (cycle) has zero
    # degree variance -> covariance 0
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    r = run(cyc)
    assert r.cov_sign == 0 and r.r2_ppm == 0


@pytest.mark.spark
def test_luby_mis_structural_invariants(spark):
    """Independence (no edge inside the set), maximality (every
    non-member has a member neighbor), full decision within the
    fixed rounds on the derived web graph."""
    from web_graph_spark import webgen
    from web_graph_spark.operators.graph_algos import luby_mis

    e = (webgen.links_full_df(spark, SF_SMOKE)
         .filter(F.col("k") % 4 != 0)
         .select("src_doc_id", "tgt_doc_id").distinct())
    v = webgen.pages_df(spark, SF_SMOKE).select("doc_id")
    mis = {r.doc_id for r in luby_mis(v, e, rounds=6).collect()}
    edges = {(r.src_doc_id, r.tgt_doc_id) for r in e.collect()
             if r.src_doc_id != r.tgt_doc_id}
    nbrs = {}
    for u, w in edges:
        nbrs.setdefault(u, set()).add(w)
        nbrs.setdefault(w, set()).add(u)
    # independence
    for u, w in edges:
        assert not (u in mis and w in mis)
    # maximality over ALL vertices = the run fully decided
    for r in v.collect():
        vid = r.doc_id
        assert vid in mis or (nbrs.get(vid) and nbrs[vid] & mis)


@pytest.mark.spark
def test_luby_mis_hand_graphs(spark):
    from web_graph_spark.operators.graph_algos import luby_mis

    def run(edges, vids):
        v = spark.createDataFrame([(i,) for i in vids], "doc_id long")
        e = spark.createDataFrame(edges,
                                  "src_doc_id long, tgt_doc_id long")
        return {r.doc_id: r.round for r in luby_mis(v, e).collect()}

    # star K1,4: MIS is {center} or all leaves, nothing else
    out = run([(0, i) for i in (1, 2, 3, 4)], range(5))
    assert set(out) in ({0}, {1, 2, 3, 4})
    # isolated vertices admit vacuously in round 0
    out = run([(0, 1)], range(4))
    assert out[2] == 0 and out[3] == 0
    # triangle: exactly one vertex wins
    out = run([(0, 1), (1, 2), (0, 2)], range(3))
    assert len(out) == 1


@pytest.mark.spark
def test_condensation_tiers_hand_dags(spark):
    """Chain of SCCs tiers 0-1-2; longest path (not shortest) wins on
    a diamond with a shortcut; members counted per component."""
    from web_graph_spark.operators.graph_algos import condensation_tiers

    def run(edges, vids):
        v = spark.createDataFrame([(i,) for i in vids], "doc_id long")
        e = spark.createDataFrame(edges,
                                  "src_doc_id long, tgt_doc_id long")
        return {r.scc: (r.tier, r.n_members)
                for r in condensation_tiers(v, e).collect()}

    # cycle {0,1} -> 2 -> cycle {3,4}
    out = run([(0, 1), (1, 0), (1, 2), (2, 3), (3, 4), (4, 3)],
              range(5))
    assert out == {0: (0, 2), 2: (1, 1), 3: (2, 2)}

    # diamond + shortcut: 0->1->2->3 and 0->3; tier(3) = 3 (longest)
    out = run([(0, 1), (1, 2), (2, 3), (0, 3)], range(4))
    assert out == {0: (0, 1), 1: (1, 1), 2: (2, 1), 3: (3, 1)}

    # isolated vertices are their own source components at tier 0
    out = run([(0, 1)], range(4))
    assert out[2] == (0, 1) and out[3] == (0, 1)


def test_crosslingual_matrix_shares(spark):
    """Hand matrix: per-source-language shares sum to ~1e6, the
    diagonal is flagged non-cross, multi-edges count as instances."""
    from web_graph_spark.operators.graph_algos import (
        crosslingual_matrix)

    langs = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "fr")], "doc_id long, lang string")
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1), (1, 3)],  # 1->3 twice
        "src long, tgt long")
    out = {(r.src_lang, r.tgt_lang): r for r in
           crosslingual_matrix(edges, langs).collect()}

    assert out[("en", "en")].n_links == 1
    assert not out[("en", "en")].is_cross
    assert out[("en", "fr")].n_links == 3  # 1->3 x2 + 2->3
    assert out[("en", "fr")].share_ppm == 10**6 * 3 // 4
    assert out[("fr", "en")].share_ppm == 10**6
    assert out[("fr", "en")].is_cross


@pytest.mark.spark
def test_salsa_hand_graph(spark):
    """Edges {1→3, 2→3, 2→4, 5→6}: bipartite components
    {1h,2h,3a,4a} (3 edges) and {5h,6a} (1 edge); H=A=3.
    Closed form → a(3)=(2/3)(2/3)=4/9, a(4)=(2/3)(1/3)=2/9,
    a(6)=(1/3)(1/1)=1/3; h(1)=(2/3)(1/3)=2/9, h(2)=(2/3)(2/3)=4/9,
    h(5)=1/3 — exact floor-ppb values, Σ per side = scale−1
    (floor evaporation)."""
    from web_graph_spark.operators.graph_algos import salsa_scores

    e = spark.createDataFrame([(1, 3), (2, 3), (2, 4), (5, 6)],
                              "src_doc_id long, tgt_doc_id long")
    rows = salsa_scores(e).collect()
    got = {(r["doc_id"], r["side"]): r["score_ppb"] for r in rows}
    assert got == {(3, "auth"): 444444444, (4, "auth"): 222222222,
                   (6, "auth"): 333333333, (1, "hub"): 222222222,
                   (2, "hub"): 444444444, (5, "hub"): 333333333}
    for side in ("hub", "auth"):
        assert sum(v for (_, s), v in got.items() if s == side) \
            == 10 ** 9 - 1
    degs = {(r["doc_id"], r["side"]): (r["deg"], r["comp_nodes"],
                                       r["comp_edges"]) for r in rows}
    assert degs[(3, "auth")] == (2, 2, 3)
    assert degs[(5, "hub")] == (1, 1, 1)


@pytest.mark.spark
def test_salsa_two_personae_and_self_loop(spark):
    """A page with both in- and out-links gets one row per side
    (SALSA keeps the personae distinct); a self-loop contributes a
    hub AND an auth persona for the same id; duplicate edge rows
    collapse (distinct) so multi-edges never double-count degree."""
    from web_graph_spark.operators.graph_algos import salsa_scores

    e = spark.createDataFrame([(1, 2), (2, 3), (4, 4), (1, 2)],
                              "src_doc_id long, tgt_doc_id long")
    rows = salsa_scores(e).collect()
    sides = {}
    for r in rows:
        sides.setdefault(r["doc_id"], set()).add(r["side"])
    assert sides[2] == {"hub", "auth"}
    assert sides[4] == {"hub", "auth"}
    assert sides[1] == {"hub"} and sides[3] == {"auth"}
    assert all(r["deg"] == 1 for r in rows)


@pytest.mark.spark
def test_densest_hand_graph(spark):
    """5-clique + sparse periphery: round 0 is the full graph
    (ρ = 13/15), round 1's survivors of the d·|S| > 3·|E| bar are
    exactly the clique (deg 4 > 2.6; every periphery vertex has
    deg ≤ 1), density 2.0 wins, round 2 peels to empty.  Pins the
    best-round witness columns and the in-set degrees."""
    from web_graph_spark.operators.graph_algos import densest_subgraph

    clique = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    e = spark.createDataFrame(
        clique + [(6, 7), (8, 9), (10, 11)],
        "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(i,) for i in range(1, 16)],
                              "doc_id long")
    rows = densest_subgraph(v, e, rounds=8).collect()
    assert sorted(r.doc_id for r in rows) == [1, 2, 3, 4, 5]
    for r in rows:
        assert (r.deg_in, r.best_round, r.set_size, r.set_edges,
                r.density_ppm) == (4, 1, 5, 10, 2_000_000)


@pytest.mark.spark
def test_densest_tie_keeps_earliest_round(spark):
    """A lone clique: round 1 drops everything at once (bar
    d > 3(k−1)/2 > k−1), so round 0's full set is the only non-empty
    candidate — best_round must be 0, not a later empty round."""
    from web_graph_spark.operators.graph_algos import densest_subgraph

    e = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    rows = densest_subgraph(v, e, rounds=4).collect()
    assert sorted(r.doc_id for r in rows) == [0, 1, 2, 3]
    assert {(r.best_round, r.set_size, r.set_edges) for r in rows} \
        == {(0, 4, 6)}


@pytest.mark.spark
def test_densest_extra_rounds_noop(spark):
    """Once the survivor chain has emptied, extra rounds cannot mint
    a new best set — rounds=4 and rounds=8 agree on the derived web
    (and the result is non-trivial: a proper subset or the full
    graph, with a consistent witness)."""
    from web_graph_spark import webgen
    from web_graph_spark.operators.graph_algos import densest_subgraph

    e = (webgen.links_full_df(spark, SF_SMOKE)
         .filter(F.col("k") % 4 != 0)
         .select("src_doc_id", "tgt_doc_id").distinct())
    v = webgen.pages_df(spark, SF_SMOKE).select("doc_id")
    a = sorted(map(tuple, densest_subgraph(v, e, rounds=4).collect()))
    b = sorted(map(tuple, densest_subgraph(v, e, rounds=8).collect()))
    assert a == b and len(a) > 0


def _ref_int_ppr(edges, seeds, rounds=4, scale=10 ** 12):
    """Pure-Python replica of the integer PPR recurrence (graph_algos
    personalized_pagerank docstring) — the spec both spam_mass runs
    share."""
    out = {}
    for s, t in set(edges):
        out.setdefault(s, set()).add(t)
    tele = (15 * scale // 100) // len(seeds)
    r = {s: scale // len(seeds) for s in seeds}
    for _ in range(rounds):
        inc = {}
        for u, ts in out.items():
            if u in r:
                m = r[u] // len(ts)
                for v in ts:
                    inc[v] = inc.get(v, 0) + m
        nr = {v: 85 * iv // 100 for v, iv in inc.items()}
        for s in seeds:
            nr[s] = nr.get(s, 0) + tele
        r = nr
    return {k: v for k, v in r.items() if v > 0}


@pytest.mark.spark
def test_spam_mass_hand_graph(spark):
    """Trusted triangle vs an unreachable-from-trust spam farm: exact
    equality with the pure-Python double recurrence, clamp semantics,
    and flag polarity."""
    from web_graph_spark.operators.graph_algos import spam_mass

    ids = [0, 1, 2, 3, 4, 5, 6]
    edges = [(0, 1), (1, 2), (2, 0),        # trusted triangle
             (4, 5), (4, 6), (5, 6), (6, 5)]  # untrusted feeder + farm
    e = spark.createDataFrame(edges, "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    t = spark.createDataFrame([(0,)], "seed_seq long")
    got = {r["doc_id"]: r for r in spam_mass(e, t, v, rounds=4).collect()}

    pr = _ref_int_ppr(edges, seeds=ids)
    tr = _ref_int_ppr(edges, seeds=[0])
    assert set(got) == set(pr)
    for d, p in pr.items():
        tc = min(tr.get(d, 0), p)
        ppm = (p - tc) * 1_000_000 // p
        row = got[d]
        assert (row["pr"], row["tr"], row["spam_mass_ppm"]) == (p, tc, ppm)
        assert row["spam_flag"] == (ppm >= 500_000)
    # polarity: farm pages carry full spam mass, trusted triangle none
    for d in (5, 6):
        assert got[d]["spam_mass_ppm"] == 1_000_000 and got[d]["spam_flag"]
    for d in (0, 1, 2):
        assert got[d]["spam_mass_ppm"] < 500_000
        assert not got[d]["spam_flag"]
    # isolated page 3: only uniform teleport reaches it → all mass
    # untrusted (flagged) — the documented behavior, not an accident
    assert got[3]["spam_mass_ppm"] == 1_000_000


@pytest.mark.spark
def test_spam_mass_clamps_trust_above_pr(spark):
    """Near the seeds TrustRank exceeds uniform PageRank (teleport
    concentration); the output clamps tr to pr and maps those pages
    to spam mass exactly 0."""
    from web_graph_spark.operators.graph_algos import spam_mass

    e = spark.createDataFrame([(1, 0), (2, 0)],
                              "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(i,) for i in (0, 1, 2)], "doc_id long")
    t = spark.createDataFrame([(0,)], "seed_seq long")
    got = {r["doc_id"]: r for r in spam_mass(e, t, v, rounds=4).collect()}
    pr = _ref_int_ppr([(1, 0), (2, 0)], seeds=[0, 1, 2])
    tr = _ref_int_ppr([(1, 0), (2, 0)], seeds=[0])
    assert tr[0] > pr[0]  # the clamp case actually triggers
    assert got[0]["tr"] == got[0]["pr"]
    assert got[0]["spam_mass_ppm"] == 0 and not got[0]["spam_flag"]


@pytest.mark.spark
def test_spam_mass_scale_guard(spark):
    """A scale too small for |V| floors the uniform teleport to 0 —
    refused loudly instead of silently computing all-spam."""
    from web_graph_spark.operators.graph_algos import spam_mass

    e = spark.createDataFrame([(0, 1)], "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    t = spark.createDataFrame([(0,)], "seed_seq long")
    with pytest.raises(ValueError, match="teleport"):
        spam_mass(e, t, v, rounds=2, scale=100)


@pytest.mark.spark
def test_conductance_hand_graph(spark):
    """Two triangles joined by one bridge: textbook cut/vol values,
    plus the whole-graph and isolated-vertex NULL denominators."""
    from web_graph_spark.operators.graph_algos import (
        conductance_by_community)

    # triangles {0,1,2} and {3,4,5}, bridge 2-3, isolated 9
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    e = spark.createDataFrame(edges, "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(i,) for i in (0, 1, 2, 3, 4, 5, 9)],
                              "doc_id long")
    lbl = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 10), (3, 20), (4, 20), (5, 20), (9, 30)],
        "doc_id long, community long")
    got = {r["community"]: r
           for r in conductance_by_community(v, e, lbl).collect()}
    # m = 7 undirected edges, 2m = 14.  Community 10: vol = 2+2+3 = 7,
    # internal = 3, cut = 1; min(7, 14-7) = 7 → φ = 1/7
    assert (got[10]["vol"], got[10]["cut"]) == (7, 1)
    assert got[10]["conductance_ppm"] == 1_000_000 // 7
    assert (got[20]["vol"], got[20]["cut"]) == (7, 1)
    # isolated community: vol 0 → undefined, not 0
    assert got[30]["vol"] == 0 and got[30]["conductance_ppm"] is None
    assert got[30]["cut"] == 0

    # whole graph as one community: cut 0, min(vol, 2m-vol) = 0 → NULL
    lbl_all = spark.createDataFrame(
        [(i, 1) for i in (0, 1, 2, 3, 4, 5, 9)],
        "doc_id long, community long")
    one = conductance_by_community(v, e, lbl_all).collect()[0]
    assert one["cut"] == 0 and one["conductance_ppm"] is None


@pytest.mark.spark
def test_conductance_random_split_is_leaky(spark):
    """A community cut through the middle of a clique has conductance
    near 10⁶ — the polarity the acceptance suite relies on."""
    from web_graph_spark.operators.graph_algos import (
        conductance_by_community)

    ids = list(range(6))
    edges = [(a, b) for a in ids for b in ids if a < b]  # K6
    e = spark.createDataFrame(edges, "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    lbl = spark.createDataFrame([(i, i % 2) for i in ids],
                                "doc_id long, community long")
    got = {r["community"]: r
           for r in conductance_by_community(v, e, lbl).collect()}
    # each side: vol = 15, internal = 3, cut = 9 → φ = 9/15 = 0.6
    for c in (0, 1):
        assert (got[c]["vol"], got[c]["cut"]) == (15, 9)
        assert got[c]["conductance_ppm"] == 600_000


@pytest.mark.spark
def test_incremental_components_equals_full(spark):
    """Incremental maintenance ≡ full recompute on an LCG graph split
    80/20, including transitive multi-component merges and new ids
    arriving with the delta."""
    from web_graph_spark.operators.graph_algos import (
        connected_components, incremental_components)

    x, edges = 7, []
    for _ in range(120):
        x = (x * 1103515245 + 12345) % (1 << 31)
        a, b = x % 40, (x >> 8) % 40
        if a != b:
            edges.append((a, b))
    base = [e for e in edges if (e[0] + e[1]) % 5 != 0]
    delta = [e for e in edges if (e[0] + e[1]) % 5 == 0]
    # new ids only the delta knows about (singleton + merged-in)
    delta += [(100, 101), (101, 0)]
    ids = sorted({i for e in base for i in e})
    v = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    be = spark.createDataFrame(base, "src_doc_id long, tgt_doc_id long")
    de = spark.createDataFrame(delta, "src_doc_id long, tgt_doc_id long")
    labels = connected_components(v, be)
    got = {r["doc_id"]: r["component"]
           for r in incremental_components(labels, de).collect()}

    all_ids = sorted(set(ids) | {i for e in delta for i in e})
    want = _uf_components(all_ids, base + delta)
    assert got == want
    # the delta-only chain merged into 0's component
    assert got[100] == got[101] == got[0] == want[0]


@pytest.mark.spark
def test_incremental_components_noop_delta(spark):
    """A delta entirely inside existing components changes nothing."""
    from web_graph_spark.operators.graph_algos import (
        connected_components, incremental_components)

    v = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    be = spark.createDataFrame([(0, 1), (2, 3)],
                               "src_doc_id long, tgt_doc_id long")
    labels = connected_components(v, be)
    before = {r["doc_id"]: r["component"] for r in labels.collect()}
    de = spark.createDataFrame([(1, 0), (3, 2)],
                               "src_doc_id long, tgt_doc_id long")
    after = {r["doc_id"]: r["component"]
             for r in incremental_components(labels, de).collect()}
    assert after == before


@pytest.mark.spark
def test_attack_tolerance_star_shatters(spark):
    """A hub-and-spoke graph keeps one giant component until the hub
    is removed, then shatters into singletons — the scale-free attack
    signature, exactly counted."""
    from web_graph_spark.operators.graph_algos import attack_tolerance

    # hub 0 connected to 1..9, plus a separate pair 20-21
    edges = [(0, i) for i in range(1, 10)] + [(20, 21)]
    e = spark.createDataFrame(edges, "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame(
        [(i,) for i in list(range(10)) + [20, 21]], "doc_id long")
    got = {r["scenario"]: r
           for r in attack_tolerance(v, e, k_remove=1).collect()}
    f = got["full"]
    assert (f["n_nodes"], f["n_edges"]) == (12, 10)
    assert (f["n_components"], f["giant_size"]) == (2, 10)
    assert f["giant_share_ppm"] == 10 * 1_000_000 // 12
    r = got["minus_top1"]
    # hub removed: 9 singleton spokes + the pair = 10 components
    assert (r["n_nodes"], r["n_edges"]) == (11, 1)
    assert (r["n_components"], r["giant_size"]) == (10, 2)
    assert r["giant_share_ppm"] == 2 * 1_000_000 // 11


@pytest.mark.spark
def test_attack_tolerance_tie_break(spark):
    """Equal-degree candidates are removed smallest-id-first."""
    from web_graph_spark.operators.graph_algos import attack_tolerance

    # two disjoint triangles — all degrees 2; removing 1 takes id 0
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
    e = spark.createDataFrame(edges, "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(i,) for i in (0, 1, 2, 10, 11, 12)],
                              "doc_id long")
    r = {x["scenario"]: x
         for x in attack_tolerance(v, e, k_remove=1).collect()}
    m = r["minus_top1"]
    # removing vertex 0 leaves edge 1-2 + intact triangle
    assert (m["n_nodes"], m["n_edges"]) == (5, 4)
    assert (m["n_components"], m["giant_size"]) == (2, 3)


@pytest.mark.spark
def test_reach_curve_consistency(spark):
    """Curve rows reconcile with the per-page depths, are cumulative-
    monotone, and the terminal share reflects unreachable pages."""
    import __spark_entry__ as entry
    from tests.conftest import SF_SMOKE

    curve = entry.q_crawl_reach_curve(spark, SF_SMOKE).collect()
    depths = entry.q_graph_bfs_depths(spark, SF_SMOKE).collect()
    from collections import Counter

    want = Counter(r["depth"] for r in depths)
    got = {r["depth"]: r for r in curve}
    assert set(got) == set(want)
    cum = 0
    n_pages = (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
               .count())
    for d in sorted(got):
        cum += want[d]
        r = got[d]
        assert r["n_reached"] == want[d]
        assert r["cum_reached"] == cum
        assert r["reach_ppm"] == cum * 1_000_000 // n_pages
    shares = [got[d]["reach_ppm"] for d in sorted(got)]
    assert shares == sorted(shares)
    assert shares[-1] <= 1_000_000


@pytest.mark.spark
def test_double_sweep_exact_on_path(spark):
    """On a path 0-1-2-3-4 (directed input, undirected sweep) the
    double sweep finds the true diameter: start 0, farthest 4,
    second-sweep bound 4, one node per level."""
    from web_graph_spark.operators.graph_algos import (
        double_sweep_diameter)

    e = spark.createDataFrame([(i, i + 1) for i in range(4)],
                              "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(i,) for i in range(5)],
                              "doc_id long")
    rows = double_sweep_diameter(e, v).collect()
    r0 = rows[0]
    assert (r0.start_id, r0.far_id, r0.ecc_start) == (0, 4, 4)
    assert r0.diameter_lb == 4 and r0.n_reached == 5
    assert {r.depth: r.n_nodes for r in rows} == {
        0: 1, 1: 1, 2: 1, 3: 1, 4: 1}


@pytest.mark.spark
def test_double_sweep_cycle_and_disconnected(spark):
    """On C5 the bound is the true diameter 2 (farthest tie breaks
    to the lowest id); an extra disconnected pair is invisible to
    both sweeps — n_reached stays 5."""
    from web_graph_spark.operators.graph_algos import (
        double_sweep_diameter)

    cyc = [(i, (i + 1) % 5) for i in range(5)] + [(10, 11)]
    e = spark.createDataFrame(cyc, "src_doc_id long, tgt_doc_id long")
    v = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 4, 10, 11]],
                              "doc_id long")
    rows = double_sweep_diameter(e, v).collect()
    r0 = rows[0]
    assert (r0.start_id, r0.far_id) == (0, 2)
    assert r0.ecc_start == 2 and r0.diameter_lb == 2
    assert r0.n_reached == 5


@pytest.mark.spark
def test_degree_mixing_two_hub_club(spark):
    """Two connected hubs with 3 leaves each: leaves' k_nn is the hub
    degree (4e6 ppm), hubs' k_nn averages 3 leaves + 1 hub; the
    degree->1 rich club is the two hubs, whose one mutual edge makes
    the club complete (1e6 ppm); the top class has no richer club
    (NULL)."""
    from web_graph_spark.operators.graph_algos import (
        degree_mixing_curve)

    edges = [(0, 1)] + [(0, 10 + i) for i in range(3)] \
        + [(1, 20 + i) for i in range(3)]
    e = spark.createDataFrame(edges,
                              "src_doc_id long, tgt_doc_id long")
    out = {r.deg: r for r in degree_mixing_curve(e).collect()}
    assert set(out) == {1, 4}
    leaf = out[1]
    assert leaf.n_nodes == 6 and leaf.knn_ppm == 4_000_000
    assert leaf.n_richer == 2 and leaf.rich_club_ppm == 1_000_000
    hub = out[4]
    # hub neighbors: 3 leaves (deg 1) + the other hub (deg 4)
    assert hub.n_nodes == 2
    assert hub.knn_ppm == (3 * 1 + 4) * 1_000_000 // 4
    assert hub.n_richer == 0 and hub.rich_club_ppm is None


@pytest.mark.spark
def test_degree_mixing_drops_self_loops_and_direction(spark):
    """Self-loops are dropped and reverse duplicates collapse: a
    bidirected pair plus a self-loop is one undirected edge — both
    vertices degree 1, k_nn 1e6, no richer club."""
    from web_graph_spark.operators.graph_algos import (
        degree_mixing_curve)

    e = spark.createDataFrame([(0, 1), (1, 0), (0, 0)],
                              "src_doc_id long, tgt_doc_id long")
    rows = degree_mixing_curve(e).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.deg, r.n_nodes, r.knn_ppm) == (1, 2, 1_000_000)
    assert r.n_richer == 0 and r.rich_club_ppm is None


@pytest.mark.spark
def test_motif_census_textbook_graphs(spark):
    """K3: 3 wedges, 1 triangle, 0 4-cycles, clustering 1e6.  C4:
    4 wedges, 0 triangles, 1 4-cycle.  K4: 12 wedges, 4 triangles,
    3 (chorded) 4-cycles, clustering 1e6.  Star K1,3: 3 wedges and
    nothing closes."""
    from web_graph_spark.operators.graph_algos import motif_census

    def census(edges):
        e = spark.createDataFrame(
            edges, "src_doc_id long, tgt_doc_id long")
        return motif_census(e).collect()[0]

    k3 = census([(0, 1), (1, 2), (2, 0)])
    assert (k3.n_nodes, k3.n_edges, k3.n_wedges) == (3, 3, 3)
    assert (k3.n_triangles, k3.n_4cycles) == (1, 0)
    assert k3.clustering_ppm == 1_000_000

    c4 = census([(0, 1), (1, 2), (2, 3), (3, 0)])
    assert (c4.n_wedges, c4.n_triangles, c4.n_4cycles) == (4, 0, 1)
    assert c4.clustering_ppm == 0

    k4 = census([(a, b) for a in range(4) for b in range(a + 1, 4)])
    assert (k4.n_nodes, k4.n_edges, k4.n_wedges) == (4, 6, 12)
    assert (k4.n_triangles, k4.n_4cycles) == (4, 3)
    assert k4.clustering_ppm == 1_000_000

    star = census([(0, 1), (0, 2), (0, 3)])
    assert (star.n_wedges, star.n_triangles, star.n_4cycles) == (3, 0, 0)
    assert star.clustering_ppm == 0


@pytest.mark.spark
def test_host_simrank_textbook_values(spark):
    """Jeh-Widom by hand at C=4/5: a common citer gives exactly
    800000 ppm in round 1 and stays there; a purely second-order
    pair (cited by hosts that are themselves similar) is 0 after
    round 1 and exactly C*800000 = 640000 after round 2; self-loops
    contribute nothing."""
    from web_graph_spark.operators.graph_algos import host_simrank

    edges = [("c", "a"), ("c", "b"),          # common citer
             ("k", "x"), ("k", "y"),          # x,y similar via k
             ("x", "p"), ("y", "q"),          # second-order p,q
             ("p", "p")]                       # self-loop, dropped
    he = spark.createDataFrame(edges,
                               "src_host string, tgt_host string")
    r1 = {(r.host_a, r.host_b): r.sim_ppm
          for r in host_simrank(he, rounds=1).collect()}
    assert r1[("a", "b")] == 800_000
    assert r1[("x", "y")] == 800_000
    assert ("p", "q") not in r1
    r2 = {(r.host_a, r.host_b): r.sim_ppm
          for r in host_simrank(he, rounds=2).collect()}
    assert r2[("a", "b")] == 800_000
    assert r2[("p", "q")] == 640_000


@pytest.mark.spark
def test_spectral_radius_regular_graphs_exact(spark):
    """On a k-regular graph the all-ones start vector IS the Perron
    eigenvector, so every round's Rayleigh quotient is exactly
    k · 1e6: K4 (3-regular) → 3e6, triangle → 2e6."""
    from web_graph_spark.operators.graph_algos import spectral_radius

    def g(pairs):
        return spark.createDataFrame(pairs, "src_host string, tgt_host string")

    k4 = g([(a, b) for a in "abcd" for b in "abcd" if a < b])
    rows = spectral_radius(k4, rounds=3).collect()
    assert [r["lambda_ppm"] for r in rows] == [3_000_000] * 3
    assert all(r["n_active"] == 4 for r in rows)
    tri = g([("a", "b"), ("b", "c"), ("c", "a")])
    rows = spectral_radius(tri, rounds=2).collect()
    assert [r["lambda_ppm"] for r in rows] == [2_000_000] * 2


@pytest.mark.spark
def test_spectral_radius_star_oscillates_deterministically(spark):
    """K_{1,4} is bipartite: power iteration period-2 oscillates and
    the Rayleigh estimate pins at exactly 1.6e6 every round (the
    documented bipartite caveat — deterministic, not divergent).
    True λ = 2; the estimate stays inside the Perron bounds
    [avg_deg, max_deg] = [1.6, 4]."""
    from web_graph_spark.operators.graph_algos import spectral_radius

    star = spark.createDataFrame(
        [("c", leaf) for leaf in ("l1", "l2", "l3", "l4")],
        "src_host string, tgt_host string")
    rows = spectral_radius(star, rounds=3).collect()
    assert [r["lambda_ppm"] for r in rows] == [1_600_000] * 3


@pytest.mark.spark
def test_spectral_radius_perron_bounds_and_monotone(spark):
    """On the webgen host graph: estimates are non-decreasing over
    rounds and bounded by max degree · 1e6 (Perron-Frobenius); the
    direction-symmetrized edge set keeps every host active."""
    import __spark_entry__ as e

    rows = sorted(e.queries()["graph_spectral"](spark, SF_SMOKE)
                  .collect(), key=lambda r: r["round"])
    lams = [r["lambda_ppm"] for r in rows]
    assert lams == sorted(lams)
    # max degree of the undirected host graph bounds lambda
    from pyspark.sql import functions as F
    from web_graph_spark import webgen
    ed = (webgen.links_full_df(spark, SF_SMOKE)
          .filter(F.col("k") % 4 != 0)
          .select("src_doc_id", "tgt_doc_id").distinct())
    p = webgen.pages_df(spark, SF_SMOKE).select("doc_id", "host")
    he = (ed.join(p.select(F.col("doc_id").alias("src_doc_id"),
                           F.col("host").alias("src_host")), "src_doc_id")
          .join(p.select(F.col("doc_id").alias("tgt_doc_id"),
                         F.col("host").alias("tgt_host")), "tgt_doc_id")
          .select("src_host", "tgt_host"))
    und = (he.unionByName(he.select(
        F.col("tgt_host").alias("src_host"),
        F.col("src_host").alias("tgt_host"))).distinct())
    max_deg = (und.groupBy("src_host").count()
               .agg(F.max("count")).collect()[0][0])
    assert all(0 < lam <= max_deg * 1_000_000 for lam in lams)
