"""Round-4 session-17 operators: reciprocity, literal normalization,
two-step truth discovery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_importer_spark.operators.analytics import reciprocity
from graph_importer_spark.triples import normalize_literals, truth_discovery


def test_reciprocity_known_graph(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 3), (1, 2)], "src long, dst long"
    )
    r = reciprocity(e).collect()[0]
    # distinct, no self-loops: (1,2),(2,1),(1,3); reciprocal: the 1<->2 pair
    assert r.n_edges == 3 and r.n_reciprocal == 2
    assert r.reciprocity == pytest.approx(2 / 3, abs=1e-6)


def test_normalize_literals_rules(spark):
    rows = [
        ("s", "p", "12,345,678"),
        ("s", "p", "12k"),
        ("s", "p", "3M"),
        ("s", "p", "Jan 5, 1997"),
        ("s", "p", "Dec 31, 2001"),
        ("s", "p", "1.2k"),        # fractional -> untouched
        ("s", "p", "hello"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = {r.obj: (r.obj_norm, r.rule) for r in normalize_literals(t).collect()}
    assert out["12,345,678"] == ("12345678", "thousands")
    assert out["12k"] == ("12000", "suffix_k")
    assert out["3M"] == ("3000000", "suffix_m")
    assert out["Jan 5, 1997"] == ("1997-01-05", "date_mdy")
    assert out["Dec 31, 2001"] == ("2001-12-31", "date_mdy")
    assert out["1.2k"] == ("1.2k", "none")
    assert out["hello"] == ("hello", "none")


def test_truth_discovery_trust_breaks_tie(spark):
    # s1 and s2 agree on two easy facts; s3 dissents on both.
    # On the contested fact, s1 says X, s3 says Y: s1's earned trust
    # must make X the winner despite the 1-1 vote tie.
    rows = [
        ("s1", "e1", "color", "red"), ("s2", "e1", "color", "red"),
        ("s3", "e1", "color", "blue"),
        ("s1", "e2", "size", "big"), ("s2", "e2", "size", "big"),
        ("s3", "e2", "size", "small"),
        ("s1", "e3", "shape", "X"), ("s3", "e3", "shape", "Y"),
    ]
    c = spark.createDataFrame(rows, "source string, subj string, pred string, obj string")
    out = {(r.subj, r.obj): r for r in truth_discovery(c).collect()}
    assert out[("e1", "red")].is_winner and not out[("e1", "blue")].is_winner
    assert out[("e3", "X")].is_winner
    assert not out[("e3", "Y")].is_winner
    assert out[("e3", "X")].score > out[("e3", "Y")].score


def test_truth_discovery_partition_invariant(spark):
    rows = [
        (f"s{i % 5}", f"e{i % 7}", "p", f"v{(i * 3) % 4}") for i in range(60)
    ]
    c = spark.createDataFrame(rows, "source string, subj string, pred string, obj string")
    a = sorted(map(tuple, truth_discovery(c).collect()))
    b = sorted(map(tuple, truth_discovery(c.repartition(11)).collect()))
    assert a == b
    # exactly one winner per (subj, pred)
    from collections import Counter

    wins = Counter((t[0], t[1]) for t in a if t[5])
    qs = {(t[0], t[1]) for t in a}
    assert set(wins) == qs and all(v == 1 for v in wins.values())
