"""K-means training, HyperLogLog, ANF neighborhood function, bipartite
projection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_importer_spark.operators.analytics import (
    bipartite_project,
    effective_diameter,
    neighborhood_function,
)
from graph_importer_spark.operators.similarity import (
    ivf_assign,
    kmeans_centroid_dims,
    kmeans_train,
    with_norm,
)
from graph_importer_spark.operators.sketches import hll_build, hll_estimate


# -- k-means ------------------------------------------------------------------

def test_kmeans_converges_to_cluster_means(spark):
    # two tight angular clusters: near (1, 0, 0) and near (0, 1, 0)
    rows = []
    for i in range(10):
        rows.append((i, [1.0, 0.01 * i, 0.0]))
        rows.append((100 + i, [0.01 * i, 1.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_train(emb, "vec_id", "embedding", k=2, iters=3)
    got = cents.collect()
    assert len(got) == 2
    # every point must sit in the cluster of its own kind
    normed = with_norm(emb, "vec_id", "embedding", "neighbor_id", "cv", "cn")
    assign = {r.neighbor_id: r.list_id for r in ivf_assign(normed, cents).collect()}
    low = {assign[i] for i in range(10)}
    high = {assign[100 + i] for i in range(10)}
    assert len(low) == 1 and len(high) == 1 and low != high
    # trained centroid = per-dim mean of its members (rounded to 6)
    dims = {(r.centroid_id, r.pos): r.val for r in
            kmeans_centroid_dims(cents).collect()}
    cid = low.pop()
    assert dims[(cid, 0)] == 1.0
    assert dims[(cid, 1)] == round(sum(0.01 * i for i in range(10)) / 10, 6)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k = 3 over 2 distinct points: one centroid keeps its init vector
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_train(emb, "vec_id", "embedding", k=3, iters=2)
    assert cents.count() == 3
    for r in cents.collect():
        assert r.pv is not None and len(r.pv) == 2


# -- HyperLogLog --------------------------------------------------------------

def test_hll_tracks_cardinality(spark):
    df = spark.range(5000).select(
        F.lit("g").alias("g"), (F.col("id") * 7919 + 13).alias("k")
    )
    built = hll_build(df, ["g"], "k", p=6)
    assert built.count() <= 64
    est = hll_estimate(built, ["g"], p=6).collect()[0].approx_distinct
    assert abs(est - 5000) / 5000 < 0.35  # ~1.04/sqrt(64) = 13% + slack


def test_hll_duplicates_do_not_inflate(spark):
    a = spark.range(300).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    dup = a.unionByName(a).unionByName(a)
    e1 = hll_estimate(hll_build(a, ["g"], "k"), ["g"]).collect()[0][1]
    e3 = hll_estimate(hll_build(dup, ["g"], "k"), ["g"]).collect()[0][1]
    assert e1 == e3


def test_hll_mergeable_by_remax(spark):
    df = spark.range(2000).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    whole = hll_estimate(hll_build(df, ["g"], "k"), ["g"]).collect()[0][1]
    h1 = hll_build(df.filter(F.col("k") < 1000), ["g"], "k")
    h2 = hll_build(df.filter(F.col("k") >= 1000), ["g"], "k")
    merged = (
        h1.unionByName(h2)
        .groupBy("g", "bucket")
        .agg(F.max("register").alias("register"))
    )
    assert hll_estimate(merged, ["g"]).collect()[0][1] == whole


# -- ANF ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def path4(spark):
    return spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )


def test_anf_monotone_and_grows(spark, path4):
    rows = {r.hop: r.approx_pairs for r in
            neighborhood_function(path4, max_hops=3, registers=16).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    assert rows[0] <= rows[1] <= rows[2] <= rows[3]
    assert rows[3] > rows[0]  # reachability actually accumulated


def test_effective_diameter_star(spark):
    # star 0 -> 1..6: every reachable pair is within 1 hop
    e = spark.createDataFrame([(0, i) for i in range(1, 7)], "src long, dst long")
    nf = neighborhood_function(e, max_hops=3, registers=16)
    assert effective_diameter(nf) == 1


# -- bipartite projection -----------------------------------------------------

def test_bipartite_project_weights(spark):
    # users 1,2 share items a,b; users 2,3 share item c
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (2, "c"), (3, "c")]
    e = spark.createDataFrame(rows, "src long, dst string")
    got = {(r.a, r.b): r.weight for r in bipartite_project(e).collect()}
    assert got == {(1, 2): 2, (2, 3): 1}


def test_bipartite_right_degree_cap(spark):
    rows = [(u, "hub") for u in range(5)] + [(1, "x"), (2, "x")]
    e = spark.createDataFrame(rows, "src long, dst string")
    got = {(r.a, r.b): r.weight
           for r in bipartite_project(e, max_right_degree=3).collect()}
    assert got == {(1, 2): 1}  # hub dropped, only 'x' pairs survive


def test_bipartite_min_weight(spark):
    rows = [(1, "a"), (2, "a"), (1, "b"), (2, "b"), (3, "a")]
    e = spark.createDataFrame(rows, "src long, dst string")
    got = {(r.a, r.b): r.weight
           for r in bipartite_project(e, min_weight=2).collect()}
    assert got == {(1, 2): 2}
