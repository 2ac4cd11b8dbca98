"""Graph analytics (the reference's Pregel catalog, natively):
pagerank / sssp / label propagation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_importer_spark.operators.analytics import (
    hits,
    label_propagation,
    pagerank,
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


def test_scc_partition_invariance(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 40) for i in range(40)], "src long, dst long"
    )
    a = sorted(map(tuple, strongly_connected_components(edges).collect()))
    b = sorted(
        map(tuple, strongly_connected_components(edges.repartition(13)).collect())
    )
    assert a == b and len(a) == 40


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
