"""Round-4 session-11 operators: shingle-containment join, per-domain
boilerplate detection/stripping, MRR/Hits@k ranking eval, butterfly
counting, Weisfeiler-Lehman relabeling, blocking quality metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_importer_spark.operators.analytics import butterfly_count, wl_relabel
from graph_importer_spark.operators.blocking import (
    blocking_quality,
    meta_blocking_pairs,
)
from graph_importer_spark.operators.dedup import containment_pairs
from graph_importer_spark.operators.evalmetrics import mrr_hits
from graph_importer_spark.operators.textstats import (
    boilerplate_lines,
    strip_boilerplate,
)


# ---------- containment_pairs ----------


def test_containment_quote_detected(spark):
    long = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    quote = "gamma delta epsilon zeta eta"  # fully contained in long
    d = spark.createDataFrame(
        [(1, long), (2, quote), (3, "unrelated words here entirely now")],
        "id long, text string",
    )
    out = {(r.id_a, r.id_b): r.containment for r in
           containment_pairs(d, "id", "text", k=3, threshold=0.9).collect()}
    assert out[(2, 1)] == pytest.approx(1.0)  # quote contained in long
    assert (1, 2) not in out  # long not contained in quote
    assert not any(3 in p for p in out)


def test_containment_matches_brute(spark):
    rows = [
        (1, "a b c d e f g h"),
        (2, "c d e f g h i j"),
        (3, "a b c d e f g h i j k l"),
        (4, "x y z w q r s t"),
    ]
    d = spark.createDataFrame(rows, "id long, text string")
    t = 0.6
    got = {(r.id_a, r.id_b) for r in
           containment_pairs(d, "id", "text", k=3, threshold=t).collect()}
    # brute force in python
    def sh(s, k=3):
        w = s.split()
        return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}
    want = set()
    m = {r[0]: sh(r[1]) for r in rows}
    for a in m:
        for b in m:
            if a != b and len(m[a] & m[b]) / len(m[a]) >= t:
                want.add((a, b))
    assert got == want


# ---------- boilerplate ----------


def _pages(spark):
    rows = []
    for i in range(10):
        lines = ["NAV HOME ABOUT", f"content {i} unique words", "footer c"]
        if i % 2 == 0:
            lines.insert(1, "cookie banner")
        rows.append((i, "siteA", lines))
    rows.append((100, "siteB", ["NAV HOME ABOUT", "tiny site"]))
    return spark.createDataFrame(rows, "id long, domain string, lines array<string>")


def test_boilerplate_lines_detects_templates(spark):
    bp = boilerplate_lines(_pages(spark), "domain", "id", "lines", min_pages=5, frac=0.5)
    got = {(r.domain, r.line): r for r in bp.collect()}
    assert ("siteA", "NAV HOME ABOUT") in got
    assert got[("siteA", "NAV HOME ABOUT")].n_pages == 10
    assert ("siteA", "cookie banner") in got  # exactly 0.5
    assert ("siteA", "footer c") in got
    # unique content lines below frac; siteB below min_pages
    assert not any(dom == "siteB" for dom, _ in got)
    assert not any("content" in ln for _, ln in got)


def test_strip_boilerplate_preserves_order(spark):
    pages = _pages(spark)
    bp = boilerplate_lines(pages, "domain", "id", "lines", min_pages=5, frac=0.6)
    out = {r.id: r for r in strip_boilerplate(pages, "domain", "id", "lines", bp).collect()}
    r = out[1]  # odd id: no cookie banner
    assert r.n_before == 3 and r.n_after == 1
    assert r.lines == ["content 1 unique words"]
    r0 = out[0]
    assert r0.lines == ["cookie banner", "content 0 unique words"]
    assert out[100].n_after == 2  # siteB untouched


# ---------- mrr_hits ----------


def test_mrr_hits_known_ranks(spark):
    rows = [
        ("q1", "a", 0.9, 0), ("q1", "b", 0.8, 1), ("q1", "c", 0.7, 0),
        ("q2", "a", 0.9, 1), ("q2", "b", 0.8, 1),
        ("q3", "a", 0.5, 0), ("q3", "b", 0.4, 0),  # no positive -> dropped
    ]
    d = spark.createDataFrame(rows, "q string, cand string, score double, label int")
    out = {r.query: r for r in mrr_hits(d, "q", "cand", "score", "label").collect()}
    assert set(out) == {"q1", "q2"}
    assert out["q1"].first_rank == 2 and out["q1"].rr == 0.5
    assert out["q1"].hit_1 == 0 and out["q1"].hit_3 == 1
    assert out["q2"].first_rank == 1 and out["q2"].hit_1 == 1


def test_mrr_hits_deterministic_ties(spark):
    # equal scores: candidate id ascending breaks the tie
    rows = [("q", "z", 1.0, 1), ("q", "a", 1.0, 0)]
    d = spark.createDataFrame(rows, "q string, cand string, score double, label int")
    r = mrr_hits(d, "q", "cand", "score", "label").collect()[0]
    assert r.first_rank == 2


# ---------- butterfly_count ----------


def test_butterfly_square(spark):
    # u1-{v1,v2}, u2-{v1,v2}: exactly one butterfly
    e = spark.createDataFrame(
        [(1, "v1"), (1, "v2"), (2, "v1"), (2, "v2"), (3, "v3")],
        "u long, v string",
    )
    out = {r.id: r.butterflies for r in butterfly_count(e).collect()}
    assert out == {1: 1, 2: 1}


def test_butterfly_k23(spark):
    # complete bipartite K_{2,3}: C(3,2)=3 butterflies per left vertex
    e = spark.createDataFrame(
        [(u, v) for u in (1, 2) for v in ("a", "b", "c")], "u long, v string"
    )
    out = {r.id: r.butterflies for r in butterfly_count(e).collect()}
    assert out == {1: 3, 2: 3}


# ---------- wl_relabel ----------


def test_wl_separates_structure(spark):
    # path a-b-c  vs triangle d-e-f: all degree-2 in triangle, ends deg-1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (5, 6), (4, 6)], "src long, dst long"
    )
    out = {r.id: r.wl_label for r in wl_relabel(edges, rounds=2).collect()}
    # triangle vertices mutually indistinguishable
    assert out[4] == out[5] == out[6]
    # path ends equal each other, differ from middle and triangle
    assert out[1] == out[3]
    assert out[1] != out[2]
    assert out[2] != out[4]


def test_wl_partition_invariant(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(40)], "src long, dst long"
    )
    a = sorted(map(tuple, wl_relabel(edges).collect()))
    b = sorted(map(tuple, wl_relabel(edges.repartition(7)).collect()))
    assert a == b


# ---------- blocking_quality ----------


def test_blocking_quality_known_values(spark):
    cand = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], "a long, b long")
    gold = spark.createDataFrame([(2, 1), (3, 4), (7, 8), (9, 1)], "a long, b long")
    r = blocking_quality(cand, gold, n_records=10).collect()[0]
    assert r.n_cand == 3 and r.n_gold == 4 and r.n_true == 2
    assert r.pair_completeness == 0.5
    assert r.reduction_ratio == pytest.approx(1 - 3 / 45, abs=1e-6)


def test_blocking_quality_composes_with_meta_blocking(spark):
    rows = [
        (1, "acme corp boston"), (2, "acme corp boston"),
        (3, "zeta gmbh berlin"), (4, "zeta gmbh berlin"),
        (5, "other thing here"),
    ]
    d = spark.createDataFrame(rows, "id long, name string")
    cand = meta_blocking_pairs(d, "id", "name")
    gold = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long")
    r = blocking_quality(cand, gold, n_records=5).collect()[0]
    assert r.pair_completeness == 1.0  # identical names always survive
    assert r.reduction_ratio > 0.5
