"""Link prediction, sorted-neighborhood blocking, int8 quantization."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graph_importer_spark.operators.blocking import (
    global_rank,
    sorted_neighborhood_pairs,
)
from graph_importer_spark.operators.linkpred import link_prediction_scores
from graph_importer_spark.operators.quantize import quantize_int8


# -- link prediction --------------------------------------------------------

@pytest.fixture(scope="module")
def path_graph(spark):
    # 1-2-3-4 path plus 2-5, 3-5: known wedges
    rows = [(1, 2), (2, 3), (3, 4), (2, 5), (3, 5)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_linkpred_known_scores(spark, path_graph):
    got = {
        (r["a"], r["b"]): r
        for r in link_prediction_scores(path_graph).collect()
    }
    # (1,3): common neighbor 2 (deg 3); not adjacent
    assert (1, 3) in got
    r = got[(1, 3)]
    assert r["common"] == 1
    assert r["adamic_adar"] == round(1 / math.log(3), 6)
    # deg(1)=1, deg(3)=3 -> jaccard = 1/(1+3-1)
    assert r["jaccard"] == round(1 / 3, 6)
    # (2,4) via 3; (4,5) via 3; (1,5) via 2; (2,3) adjacent -> excluded
    assert (2, 3) not in got and (3, 5) not in got
    assert {(2, 4), (4, 5), (1, 5)} <= set(got)


def test_linkpred_min_common_and_cap(spark, path_graph):
    # 2 and 5 share only neighbor 3 after 2-5 edge exists... actually
    # (4,5) has common={3}; min_common=2 keeps only pairs with >= 2
    # shared neighbors: none in the path graph
    assert link_prediction_scores(path_graph, min_common=2).count() == 0
    # hub cap: capped results are a subset of exact
    exact = {
        (r["a"], r["b"]) for r in link_prediction_scores(path_graph).collect()
    }
    capped = {
        (r["a"], r["b"])
        for r in link_prediction_scores(path_graph, max_degree=2).collect()
    }
    assert capped <= exact
    # degree-3 middles (2 and 3) are dropped; only wedges through
    # degree<=2 middles survive (5: neighbors 2,3 -> pair (2,3) is
    # adjacent, dropped) -> nothing left
    assert capped == set()


def test_linkpred_symmetric_input(spark):
    # direction and duplication of input edges must not change scores
    e1 = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    e2 = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 2)], "src long, dst long"
    )
    r1 = sorted(map(tuple, link_prediction_scores(e1).collect()))
    r2 = sorted(map(tuple, link_prediction_scores(e2).collect()))
    assert r1 == r2 and len(r1) == 1  # (1,3) via 2


# -- sorted-neighborhood blocking --------------------------------------------

@pytest.fixture(scope="module")
def names(spark):
    rows = [
        (10, "apple"),
        (11, "apricot"),
        (12, "banana"),
        (13, "banana"),   # tie on key -> id breaks it
        (14, "cherry"),
        (15, "almond"),
    ]
    return spark.createDataFrame(rows, "rid long, name string")


def test_global_rank_matches_sort(spark, names):
    ranked = global_rank(
        names, "name", "rid", bucket=F.substring("name", 1, 1)
    ).collect()
    got = {r["rid"]: r["rank"] for r in ranked}
    order = sorted(
        [(r["name"], r["rid"]) for r in names.collect()]
    )
    want = {rid: i + 1 for i, (_, rid) in enumerate(order)}
    assert got == want


def test_snm_pairs_match_bruteforce(spark, names):
    w = 3
    pairs = sorted_neighborhood_pairs(
        names, "rid", "name", bucket=F.substring("name", 1, 1), window=w
    ).collect()
    got = {(r["a"], r["b"], r["dist"]) for r in pairs}
    order = [rid for _, rid in sorted((r["name"], r["rid"]) for r in names.collect())]
    want = {
        (order[i], order[i + d], d)
        for i in range(len(order))
        for d in range(1, w)
        if i + d < len(order)
    }
    assert got == want
    # pairs cross bucket boundaries (almond/apple in 'a', banana in 'b',
    # cherry in 'c'): adjacent-in-order pairs from different buckets exist
    assert (11, 12, 1) in got  # apricot -> banana crosses a->b


def test_snm_window_must_be_ge_2(spark, names):
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(
            names, "rid", "name", bucket=F.substring("name", 1, 1), window=1
        )


# -- int8 quantization --------------------------------------------------------

def test_quantize_roundtrip_bounds(spark):
    rows = [
        (0, [0.5, -1.0, 0.25, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),        # zero vector
        (2, [1e-6, -1e-6, 5e-7, 0.0]),    # tiny magnitudes
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    r0 = out[0]
    assert r0["scale"] == round(1.0 / 127, 6)
    assert all(-127 <= c <= 127 for c in r0["codes"])
    # max element quantizes to +-127 exactly -> its error ~ 0
    assert min(r0["codes"]) == -127
    # reconstruction error bounded by scale/2 (+ rounding slack)
    assert r0["max_abs_err"] <= 0.5 / 127 + 1e-9
    # zero vector: scale 0, all-zero codes, zero error
    r1 = out[1]
    assert r1["scale"] == 0.0 and set(r1["codes"]) == {0}
    assert r1["mse"] == 0.0 and r1["max_abs_err"] == 0.0
    # q_sum is the integer checksum
    assert r0["q_sum"] == sum(r0["codes"])


def test_quantize_half_up_rule(spark):
    # 0.5 boundary: x/scale = 63.5 must round UP (floor(x+0.5) rule)
    # scale = 1/127 -> x = 63.5/127 = 0.5
    df = spark.createDataFrame(
        [(0, [1.0, 0.5])], "vec_id long, embedding array<double>"
    )
    r = quantize_int8(df).collect()[0]
    assert r["codes"] == [127, 64]


# -- skip-gram pairs ----------------------------------------------------------

def test_skipgram_pairs_known_window(spark):
    from graph_importer_spark.operators.analytics import skipgram_pairs

    # one walk a-b-c-d, window 1: adjacent pairs only, both directions
    rows = [(0, 0, s, n) for s, n in enumerate(["a", "b", "c", "d"])]
    walks = spark.createDataFrame(
        rows, "walk_id long, walk_no int, step int, node string"
    )
    got = {(r["center"], r["context"]): r["n"]
           for r in skipgram_pairs(walks, window=1).collect()}
    want = {("a", "b"): 1, ("b", "a"): 1, ("b", "c"): 1,
            ("c", "b"): 1, ("c", "d"): 1, ("d", "c"): 1}
    assert got == want
    with pytest.raises(ValueError):
        skipgram_pairs(walks, window=0)


def test_skipgram_counts_accumulate_across_walks(spark):
    from graph_importer_spark.operators.analytics import skipgram_pairs

    rows = [(0, 0, 0, "x"), (0, 0, 1, "y"), (0, 1, 0, "x"), (0, 1, 1, "y")]
    walks = spark.createDataFrame(
        rows, "walk_id long, walk_no int, step int, node string"
    )
    got = {(r["center"], r["context"]): r["n"]
           for r in skipgram_pairs(walks, window=2).collect()}
    assert got == {("x", "y"): 2, ("y", "x"): 2}


# -- triple confidence --------------------------------------------------------

def test_triple_confidence_noisy_or(spark):
    from graph_importer_spark.triples import triple_confidence

    rows = [
        ("a", "p", "b", 0.5),
        ("a", "p", "b", 0.5),
        ("c", "p", "d", 0.9),
        ("e", "p", "f", 1.0),   # certain evidence: clamp, not ln(0)
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string, score double")
    got = {(r["subj"], r["obj"]): r for r in triple_confidence(df).collect()}
    r = got[("a", "b")]
    assert r["n_evidence"] == 2 and r["max_score"] == 0.5
    assert r["noisy_or"] == 0.75          # 1 - 0.5*0.5
    assert got[("c", "d")]["noisy_or"] == 0.9
    assert got[("e", "f")]["noisy_or"] == 1.0


# -- product quantization -----------------------------------------------------

def test_pq_codes_reconstruction(spark):
    from graph_importer_spark.operators.quantize import pq_codebook, pq_codes

    # 8 vectors of dim 4, 2 blocks x 2 dims, k=8: every vector is in the
    # codebook, so its own best code has d2 == 0
    rows = [(i, [float(i), float(i + 1), float(2 * i), 0.5 * i]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_codes(df, dim=4, m_blocks=2, k=8)
    assert out.count() == 16  # 8 vectors x 2 blocks
    assert out.filter("d2 != 0.0").count() == 0
    book = pq_codebook(df, dim=4, m_blocks=2, k=8)
    assert book.count() == 16
    assert {r["block"] for r in book.collect()} == {0, 1}
    with pytest.raises(ValueError):
        pq_codes(df, dim=4, m_blocks=3, k=2)


def test_pq_codes_nearest_assignment(spark):
    from graph_importer_spark.operators.quantize import pq_codes

    # k=1: everything maps to the single codebook entry; d2 is the
    # squared distance to it per block
    rows = [(0, [0.0, 0.0]), (1, [3.0, 4.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {(r["vec_id"], r["block"]): r for r in
           pq_codes(df, dim=2, m_blocks=1, k=1).collect()}
    # codebook = vector with smallest id-hash; whichever it is, the
    # other vector's d2 = 9 + 16 = 25 or 0
    d2s = sorted(r["d2"] for r in out.values())
    assert d2s == [0.0, 25.0]


# -- PPMI ----------------------------------------------------------------------

def test_ppmi_matrix_known_values(spark):
    from graph_importer_spark.operators.analytics import ppmi_matrix

    pairs = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1), ("b", "a", 1)],
        "center string, context string, n long",
    )
    got = {(r["center"], r["context"]): r["ppmi"]
           for r in ppmi_matrix(pairs).collect()}
    # N=5; rs: a=4, b=1; cs: a=1, b=3, c=1
    assert got[("a", "b")] == round(math.log(3 * 5 / (4 * 3)), 6)
    assert got[("a", "c")] == round(math.log(1 * 5 / (4 * 1)), 6)
    assert got[("b", "a")] == round(math.log(5.0), 6)
    # shifted PPMI clamps at zero
    shifted = {(r["center"], r["context"]): r["ppmi"]
               for r in ppmi_matrix(pairs, shift_k=5).collect()}
    assert shifted[("a", "b")] == 0.0
    assert shifted[("b", "a")] == round(math.log(5.0) - math.log(5.0), 6)
    with pytest.raises(ValueError):
        ppmi_matrix(pairs, shift_k=0)
