"""Synthetic graph generators: reference parity + determinism under
re-partitioning (SURVEY §2.6 F1-F5, §7 hard part 3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_importer_spark.operators.generators import (
    append_edge_attr,
    clique_edges,
    cliques_graph_edges,
    k_partite_edges,
    prepare_vertices,
    tournament_edges,
)


def test_clique_complete(spark):
    n = 20
    e = clique_edges(spark, n).collect()
    assert len(e) == n * (n - 1) // 2
    assert all(r["src"] < r["dst"] for r in e)


def test_clique_prob_missing_deterministic(spark):
    a = sorted(map(tuple, clique_edges(spark, 30, 0.3, seed=5).collect()))
    b = sorted(map(tuple, clique_edges(spark, 30, 0.3, seed=5).repartition(13).collect()))
    assert a == b
    full = 30 * 29 // 2
    assert 0 < len(a) < full


def test_tournament_every_pair_once(spark):
    n = 15
    e = tournament_edges(spark, n).collect()
    assert len(e) == n * (n - 1) // 2
    seen = {tuple(sorted((r["src"], r["dst"]))) for r in e}
    assert len(seen) == n * (n - 1) // 2
    # both orientations occur (coin is not constant)
    assert any(r["src"] > r["dst"] for r in e)
    assert any(r["src"] < r["dst"] for r in e)


def test_k_partite_no_intra_edges(spark):
    verts, edges = k_partite_edges(spark, 3, 2, 4, seed=9)
    part_of = {r["id"]: r["part"] for r in verts.collect()}
    e = edges.collect()
    assert all(part_of[r["src"]] != part_of[r["dst"]] for r in e)
    # complete multipartite: |E| = sum over part pairs of |a|*|b|
    from collections import Counter

    sizes = Counter(part_of.values())
    want = sum(
        sizes[p1] * sizes[p2]
        for p1 in sizes
        for p2 in sizes
        if p1 < p2
    )
    assert len(e) == want


def test_cliques_graph_structure(spark):
    verts, edges = cliques_graph_edges(
        spark, num_cliques=3, min_size=3, max_size=5, prob_missing_one=0.0, prob_missing_all=1.0
    )
    part_of = {r["id"]: r["part"] for r in verts.collect()}
    e = edges.collect()
    # prob_missing_all=1.0 => no inter-clique edges; intra cliques complete
    assert all(part_of[r["src"]] == part_of[r["dst"]] for r in e)
    from collections import Counter

    sizes = Counter(part_of.values())
    assert len(e) == sum(s * (s - 1) // 2 for s in sizes.values())


def test_prepare_vertices_branches(spark):
    # plain: just _key
    plain = prepare_vertices(spark, 5)
    assert plain.columns == ["_key"]
    assert {r["_key"] for r in plain.collect()} == {"0", "1", "2", "3", "4"}
    # smart + part + random attr: all four reference branches collapse
    full = prepare_vertices(spark, 10, smart=True, num_parts=3, attr=("w", 2.0, 4.0))
    rows = {r["_key"]: r for r in full.collect()}
    assert full.columns == ["_key", "part", "smartProp", "w"]
    assert rows["7"]["part"] == "1" and rows["7"]["smartProp"] == "7"
    assert all(2.0 <= float(r["w"]) < 4.0 for r in rows.values())
    # smart attribute IS the part attribute -> no duplicate column
    sp = prepare_vertices(spark, 4, smart=True, smart_attribute="part", num_parts=2)
    assert sp.columns == ["_key", "part"]


def test_append_edge_attr_deterministic(spark):
    e = tournament_edges(spark, 10, seed=1)
    a = sorted(map(tuple, append_edge_attr(e, "weight", 0.0, 1.0).collect()))
    b = sorted(map(tuple, append_edge_attr(e.repartition(7), "weight", 0.0, 1.0).collect()))
    assert a == b
    assert all(0.0 <= float(w) < 1.0 for _, _, w in a)


def test_cliques_graph_inter_edges(spark):
    verts, edges = cliques_graph_edges(spark, 2, 3, 3, 0.0, 0.0)
    part_of = {r["id"]: r["part"] for r in verts.collect()}
    inter = [r for r in edges.collect() if part_of[r["src"]] != part_of[r["dst"]]]
    assert len(inter) == 9  # 3 x 3 complete bipartite
