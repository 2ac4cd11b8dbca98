"""Graph analytics (the reference's Pregel catalog, natively):
pagerank / sssp / label propagation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_importer_spark.operators.analytics import (
    effective_closeness,
    hits,
    label_propagation,
    linerank,
    pagerank,
    slpa,
    sssp,
    strongly_connected_components,
)


def test_pagerank_mass_conservation_and_symmetry(spark):
    # 4-cycle: symmetric => all ranks equal 1.0; total mass == n
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    ranks = pagerank(edges, max_iter=30).collect()
    assert len(ranks) == 4
    for r in ranks:
        assert r["rank"] == pytest.approx(1.0, abs=1e-6)


def test_pagerank_sink_handling(spark):
    # 0 -> 1 (1 is dangling): mass redistributed, sum stays n
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    ranks = {r["id"]: r["rank"] for r in pagerank(edges, max_iter=40).collect()}
    assert sum(ranks.values()) == pytest.approx(2.0, abs=1e-4)
    assert ranks[1] > ranks[0]


def test_sssp_weighted(spark):
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0), (2, 3, 1.0)],
        "src long, dst long, w double",
    )
    d = {r["id"]: r["dist"] for r in sssp(edges, 0, weight_col="w").collect()}
    assert d == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}


def test_sssp_unweighted_unreachable_absent(spark):
    edges = spark.createDataFrame([(0, 1), (5, 6)], "src long, dst long")
    d = {r["id"]: r["dist"] for r in sssp(edges, 0).collect()}
    assert d == {0: 0.0, 1: 1.0}  # 5,6 unreachable -> absent


def test_label_propagation_two_cliques(spark):
    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = spark.createDataFrame(
        clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)],
        "src long, dst long",
    )
    labels = {r["id"]: r["label"] for r in label_propagation(edges, max_iter=10).collect()}
    assert len({labels[i] for i in (0, 1, 2)}) == 1
    assert len({labels[i] for i in (11, 12, 13)}) == 1
    assert labels[0] != labels[11]


def test_scc_cycles_and_singletons(spark):
    # two 3-cycles joined one-way + a feeder vertex: SCCs = the cycles
    # (id = min member) and the feeder as a singleton
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 10), (10, 11), (11, 12), (12, 10), (99, 1)],
        "src long, dst long",
    )
    got = {r["id"]: r["scc"] for r in strongly_connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 99: 99}


def test_scc_directed_path_settles_via_trimming(spark):
    """The pathological chain shape: a 50-node directed path is all
    singleton SCCs.  Without the trim step this needs O(n) coloring
    ROUNDS (raising at the default max_iter); trimming peels both ends
    each superstep, so it must complete within the default budget."""
    n = 50
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {r["id"]: r["scc"] for r in strongly_connected_components(edges).collect()}
    assert got == {i: i for i in range(n)}


def test_scc_partition_invariance(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 40) for i in range(40)], "src long, dst long"
    )
    a = sorted(map(tuple, strongly_connected_components(edges).collect()))
    b = sorted(
        map(tuple, strongly_connected_components(edges.repartition(13)).collect())
    )
    assert a == b and len(a) == 40


def test_linerank_mass_and_centrality(spark):
    # path 0->1->2->3 plus a hub edge into 1: edge mass sums to ~1 per
    # superstep, and the high-traffic middle vertex outranks the leaves
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (9, 1)], "src long, dst long"
    )
    rows = {r["id"]: r["linerank"] for r in linerank(edges, max_iter=20).collect()}
    # each edge rank counted at both endpoints -> vertex total ~= 2.0
    assert sum(rows.values()) == pytest.approx(2.0, abs=1e-6)
    assert rows[1] > rows[0] and rows[1] > rows[9]  # incident to 3 edges
    assert rows[2] > rows[3]  # interior beats the sink leaf


def test_linerank_partition_invariance(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 40) for i in range(40)], "src long, dst long"
    )
    a = sorted((r["id"], round(r["linerank"], 9)) for r in linerank(edges).collect())
    b = sorted(
        (r["id"], round(r["linerank"], 9))
        for r in linerank(edges.repartition(13)).collect()
    )
    assert a == b and len(a) == 40


def test_effective_closeness_orders_center_over_leaf(spark):
    # path graph 0-1-2-3-4: the center (2) has the smallest distance sum,
    # the FM estimate must preserve that ordering.  On a 5-node graph the
    # per-vertex estimates differ by fractions of the ~1.3/sqrt(r) FM
    # band, so this ordering check needs a high register count (128) to
    # be statistically stable — accuracy at tiny n is bought with
    # registers, which is exactly the FM trade-off.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    rows = {
        r["id"]: r["closeness"]
        for r in effective_closeness(edges, registers=128, max_iter=8).collect()
    }
    assert len(rows) == 5
    assert rows[2] == max(rows.values())  # center is most central
    assert all(v > 0 for v in rows.values())


def test_effective_closeness_isolated_zero(spark):
    # a vertex with no edges after symmetrization never appears; a
    # 2-node component gets closeness 1/(dist sum) = 1/est-ish > 0
    edges = spark.createDataFrame([(7, 8)], "src long, dst long")
    rows = effective_closeness(edges, max_iter=3).collect()
    assert {r["id"] for r in rows} == {7, 8}


def test_slpa_overlapping_membership(spark):
    # two 6-cliques sharing {4,5}: the shared vertices should retain
    # labels from BOTH communities above the 1/3 threshold more often
    # than pure members; every vertex keeps at least one label
    def clique(lo):
        return [(lo + a, lo + b) for a in range(6) for b in range(6) if a < b]

    edges = spark.createDataFrame(clique(0) + clique(4), "src long, dst long")
    rows = slpa(edges, max_iter=5).collect()
    by_id: dict[int, set] = {}
    for r in rows:
        by_id.setdefault(r["id"], set()).add(r["label"])
    assert set(by_id) == set(range(10))  # nobody dropped
    # labels stay within the vertex universe and memberships are communities
    assert all(lbl in range(10) for s in by_id.values() for lbl in s)


def test_slpa_deterministic(spark):
    def clique(lo):
        return [(lo + a, lo + b) for a in range(6) for b in range(6) if a < b]

    edges = spark.createDataFrame(clique(0) + clique(4), "src long, dst long")
    a = sorted(map(tuple, slpa(edges, max_iter=4).collect()))
    b = sorted(map(tuple, slpa(edges.repartition(7), max_iter=4).collect()))
    assert a == b


def test_hits_star_normalization_and_ordering(spark):
    # star: orders (hubs) -> customers (authorities); customer authority
    # is monotone in in-degree, hubs of same-degree customers are equal
    edges = spark.createDataFrame(
        [(100, 1), (101, 1), (102, 1), (103, 2), (104, 3)], "src long, dst long"
    )
    rows = {r["id"]: r for r in hits(edges, max_iter=10).collect()}
    assert sum(r["hub"] for r in rows.values()) == pytest.approx(1.0)
    assert sum(r["authority"] for r in rows.values()) == pytest.approx(1.0)
    assert rows[1]["authority"] > rows[2]["authority"] == rows[3]["authority"]
    assert rows[100]["hub"] == pytest.approx(rows[101]["hub"])
    assert rows[100]["hub"] > rows[103]["hub"]  # points at the big authority


def test_triangle_count_k4_plus_pendant(spark):
    from graph_importer_spark.operators.analytics import triangle_count

    # K4 (every vertex in 3 of the 4 triangles) + pendant vertex 9 (0)
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = spark.createDataFrame(k4 + [(3, 9)], "src long, dst long")
    got = {r["id"]: r["triangles"] for r in triangle_count(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 9: 0}


def test_triangle_count_direction_and_dup_invariant(spark):
    from graph_importer_spark.operators.analytics import triangle_count

    # same triangle given with mixed orientations and duplicates
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 0), (0, 2)], "src long, dst long"
    )
    got = {r["id"]: r["triangles"] for r in triangle_count(edges).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_triangle_count_partition_invariance(spark):
    from graph_importer_spark.operators.analytics import triangle_count

    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    edges = spark.createDataFrame(k5 + [(4, 20), (20, 21)], "src long, dst long")
    a = sorted(map(tuple, triangle_count(edges).collect()))
    b = sorted(map(tuple, triangle_count(edges.repartition(13)).collect()))
    assert a == b
    assert dict(a)[0] == 6  # C(4,2) triangles of K5 touch each vertex


def test_kcore_peels_tail_keeps_cliques(spark):
    from graph_importer_spark.operators.analytics import kcore

    def clique(lo, n):
        return [(lo + a, lo + b) for a in range(n) for b in range(n) if a < b]

    # 6-clique + 4-clique + bridge + 3-vertex tail chain off the 4-clique
    edges = spark.createDataFrame(
        clique(0, 6) + clique(10, 4) + [(5, 10), (13, 20), (20, 21), (21, 22)],
        "src long, dst long",
    )
    got = {r["id"]: r["deg"] for r in kcore(edges, k=3).collect()}
    assert got == {0: 5, 1: 5, 2: 5, 3: 5, 4: 5, 5: 6, 10: 4, 11: 3, 12: 3, 13: 3}


def test_kcore_empty_when_k_too_large(spark):
    from graph_importer_spark.operators.analytics import kcore

    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    assert kcore(edges, k=3).count() == 0  # triangle is a 2-core only


def test_k_hop_min_hops_and_radius(spark):
    from graph_importer_spark.operators.analytics import k_hop

    # path 1->2->3->4->5 plus shortcut 1->3 and a cycle 4->1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 3), (4, 1)], ["src", "dst"]
    )
    srcs = spark.createDataFrame([(1,)], ["id"])
    got = {r["id"]: r["hops"] for r in k_hop(edges, srcs, k=2).collect()}
    # min hops: 3 reachable in 1 via the shortcut; 5 is 3 hops -> absent
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}
    full = {r["id"]: r["hops"] for r in k_hop(edges, srcs, k=10).collect()}
    assert full[5] == 3  # cycle 4->1 must not loop forever or relabel 1
    assert full[1] == 0
    assert k_hop(edges, srcs, k=0).count() == 1


def test_random_walks_deterministic_and_neighbor_closed(spark):
    from graph_importer_spark.operators.analytics import random_walks

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4), (4, 1), (5, 5)], ["src", "dst"]
    )
    w = random_walks(edges, length=3, seed=7)
    rows = {(r["walk_id"], r["step"]): r["node"] for r in w.collect()}
    adj = {1: {2, 3}, 2: {4}, 3: {4}, 4: {1}, 5: {5}}
    # step 0 is the source; every step follows a real edge
    for (wid, step), node in rows.items():
        if step == 0:
            assert node == wid
        else:
            assert node in adj[rows[(wid, step - 1)]]
    # one walk per source, full length (no dead ends in this graph)
    assert {wid for wid, _ in rows} == {1, 2, 3, 4, 5}
    assert all((wid, s) in rows for wid in adj for s in range(4))
    # partition-invariant determinism
    again = {
        (r["walk_id"], r["step"]): r["node"]
        for r in random_walks(edges.repartition(5), 3, seed=7).collect()
    }
    assert rows == again
    # dead ends stop early
    dead = spark.createDataFrame([(1, 2)], ["src", "dst"])
    d = random_walks(dead, length=3, seed=7)
    assert {(r["walk_id"], r["walk_no"], r["step"], r["node"]) for r in d.collect()} == {
        (1, 0, 0, 1), (1, 0, 1, 2)
    }
    # n_walks starts that many walks per source, each edge-closed
    multi = random_walks(edges, length=3, seed=7, n_walks=3)
    m = {(r["walk_id"], r["walk_no"], r["step"]): r["node"] for r in multi.collect()}
    assert {(wid, wn) for wid, wn, _ in m} == {
        (wid, wn) for wid in adj for wn in range(3)
    }
    for (wid, wn, step), node in m.items():
        if step == 0:
            assert node == wid
        else:
            assert node in adj[m[(wid, wn, step - 1)]]


def _ppr_replica(edges, seeds, iters, damping=0.85):
    """Driver-side replica of the personalized_pagerank recurrence."""
    verts = sorted({v for e in edges for v in e})
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    res = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in verts}
    rank = dict(res)
    for _ in range(iters):
        dang = sum(rank[v] for v in verts if v not in out)
        contrib = {v: 0.0 for v in verts}
        for s, ds in out.items():
            for d in ds:
                contrib[d] += rank[s] / len(ds)
        rank = {
            v: (1 - damping) * res[v] + damping * (contrib[v] + dang * res[v])
            for v in verts
        }
    return rank


def test_personalized_pagerank_matches_replica(spark):
    from graph_importer_spark.operators.analytics import personalized_pagerank

    edges = [(1, 2), (2, 1), (2, 3), (3, 4), (5, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["rank"] for r in
           personalized_pagerank(df, [1, 5], tol=0.0, max_iter=12).collect()}
    want = _ppr_replica(edges, {1, 5}, 12)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_personalized_pagerank_dangling_restarts_to_seeds(spark):
    from graph_importer_spark.operators.analytics import personalized_pagerank

    # 1 -> 2, 2 dangling: its mass restarts onto the seed; the
    # disconnected component 4 -> 3 gets nothing
    edges = spark.createDataFrame([(1, 2), (4, 3)], "src long, dst long")
    got = {r["id"]: r["rank"] for r in
           personalized_pagerank(edges, [1], tol=0.0, max_iter=10).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[3] == 0.0 and got[4] == 0.0
    assert got[1] > got[2] > 0

    import pytest as _pytest
    with _pytest.raises(ValueError):
        personalized_pagerank(edges, [])


def test_ktruss_k4_plus_appendages(spark):
    from graph_importer_spark.operators.analytics import ktruss

    # K4 on {1,2,3,4}; a triangle {4,5,6} hanging off vertex 4; a
    # pendant edge 6-7
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [(4, 5), (4, 6), (5, 6), (6, 7)], "src long, dst long"
    )
    # 4-truss: every edge must sit in >= 2 triangles -> exactly K4
    got4 = {(r["a"], r["b"]): r["support"] for r in ktruss(edges, 4).collect()}
    assert set(got4) == set(k4)
    assert all(s == 2 for s in got4.values())
    # 3-truss: one triangle per edge suffices -> K4 plus the side triangle
    got3 = {(r["a"], r["b"]) for r in ktruss(edges, 3).collect()}
    assert got3 == set(k4) | {(4, 5), (4, 6), (5, 6)}
    # k=5 empties the graph (no edge is in 3 triangles)
    assert ktruss(edges, 5).count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ktruss(edges, 1)


def test_degree_assortativity_known_graphs(spark):
    from graph_importer_spark.operators.analytics import degree_assortativity

    # star: the hub (deg 4) only touches leaves (deg 1) -> r = -1
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    r = degree_assortativity(star).collect()[0]
    assert r["n_edges"] == 4 and r["assortativity"] == -1.0
    # two disjoint edges: all degrees equal -> correlation undefined
    # (0/0) -> NULL, surfaced rather than faked
    flat = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    assert degree_assortativity(flat).collect()[0]["assortativity"] is None
