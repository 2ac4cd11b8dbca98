"""Round-4 session-14 operators: URL path-template mining, diversity
sampling, inverse-predicate detection, rich-club coefficient."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_importer_spark.operators.analytics import rich_club
from graph_importer_spark.operators.dedup import diverse_sample
from graph_importer_spark.operators.urls import url_templates
from graph_importer_spark.triples import inverse_predicates


# ---------- url_templates ----------


def test_url_templates_generalizes_digits_and_hex(spark):
    rows = [
        (f"https://shop.example.com/item/{i}?ref=x",) for i in range(5)
    ] + [
        ("https://shop.example.com/session/deadbeefcafe1234/cart",),
        ("https://shop.example.com/session/0123456789abcdef/cart",),
        ("https://other.example.com/about",),
    ]
    d = spark.createDataFrame(rows, "url string")
    out = {(r.host, r.template): r for r in url_templates(d, "url").collect()}
    assert ("shop.example.com", "/item/{n}") in out
    assert out[("shop.example.com", "/item/{n}")].n_urls == 5
    assert ("shop.example.com", "/session/{h}/cart") in out
    # single-URL families fall under min_count
    assert not any(h == "other.example.com" for h, _ in out)


def test_url_templates_sample_sorted(spark):
    d = spark.createDataFrame(
        [(f"https://a.com/p/{i}",) for i in (3, 1, 2)], "url string"
    )
    r = url_templates(d, "url", min_count=2, k=2).collect()[0]
    assert r.sample == "/p/1,/p/2"


# ---------- diverse_sample ----------


def test_diverse_sample_collapses_identical_docs(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
    rows += [(10 + i, f"completely different text number {i} with words") for i in range(3)]
    d = spark.createDataFrame(rows, "id long, text string")
    out = diverse_sample(d, "id", "text").collect()
    buckets = {r.bucket: r for r in out}
    # the 5 identical docs share one bucket, keeper = min id
    big = [r for r in out if r.n_docs == 5]
    assert len(big) == 1 and big[0].keeper == 0
    assert sum(r.n_docs for r in out) == 8


def test_diverse_sample_partition_invariant(spark):
    rows = [(i, f"text {i % 4} stable content") for i in range(40)]
    d = spark.createDataFrame(rows, "id long, text string")
    a = sorted(map(tuple, diverse_sample(d, "id", "text").collect()))
    b = sorted(map(tuple, diverse_sample(d.repartition(7), "id", "text").collect()))
    assert a == b


# ---------- inverse_predicates ----------


def test_inverse_predicates_detects_pair(spark):
    rows = []
    for i in range(20):
        rows.append((f"p{i}", "parent_of", f"c{i}"))
        rows.append((f"c{i}", "child_of", f"p{i}"))
    rows.append(("x", "likes", "y"))  # no inverse
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = {(r.p, r.q): r for r in inverse_predicates(t, min_support=5).collect()}
    assert out[("parent_of", "child_of")].ratio == 1.0
    assert out[("child_of", "parent_of")].ratio == 1.0
    assert not any(p == "likes" for p, _ in out)


def test_inverse_predicates_symmetric_self(spark):
    rows = []
    for i in range(10):
        rows.append((f"a{i}", "married_to", f"b{i}"))
        rows.append((f"b{i}", "married_to", f"a{i}"))
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = inverse_predicates(t, min_support=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.p, r.q, r.ratio) == ("married_to", "married_to", 1.0)


# ---------- rich_club ----------


def test_rich_club_known_graph(spark):
    # star: hub 0 connected to 1..5, plus edge 1-2.
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(1, 2)], "src long, dst long"
    )
    out = {r.k: r for r in rich_club(edges, ks=[0, 1, 2]).collect()}
    # k=0: all 6 nodes, 6 edges -> phi = 12/30
    assert out[0].n_nodes == 6 and out[0].n_edges == 6
    assert out[0].phi == pytest.approx(12 / 30, abs=1e-6)
    # k=1: nodes with deg>1: 0 (5), 1 (2), 2 (2) -> edges among them: 0-1,0-2,1-2
    assert out[1].n_nodes == 3 and out[1].n_edges == 3
    assert out[1].phi == 1.0
    # k=2: only the hub -> phi NULL
    assert out[2].n_nodes == 1 and out[2].phi is None
