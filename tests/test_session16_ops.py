"""Round-4 session-16 operators: character entropy, numeric-literal
outlier audit."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graph_importer_spark.operators.textstats import char_entropy
from graph_importer_spark.triples import numeric_outliers


def test_char_entropy_known_values(spark):
    d = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], "id long, text string"
    )
    out = {r.id: r for r in char_entropy(d, "id", "text").collect()}
    assert out[1].entropy == 0.0 and out[1].n_distinct == 1
    assert out[2].entropy == pytest.approx(1.0, abs=1e-6)
    assert out[3].entropy == pytest.approx(2.0, abs=1e-6)
    assert out[3].n_chars == 4


def test_char_entropy_partition_invariant(spark):
    rows = [(i, f"text with some chars {i % 5}") for i in range(50)]
    d = spark.createDataFrame(rows, "id long, text string")
    a = sorted(map(tuple, char_entropy(d, "id", "text").collect()))
    b = sorted(map(tuple, char_entropy(d.repartition(9), "id", "text").collect()))
    assert a == b


def test_numeric_outliers_flags_planted(spark):
    rows = [("p", f"s{i}", 100.0 + (i % 7)) for i in range(100)]
    rows.append(("p", "huge", 10_000.0))
    rows.append(("q", "only", 5.0))       # n=1 predicate: never flagged
    rows.append(("p", "bad", None))       # non-numeric drops
    t = spark.createDataFrame(rows, "pred string, subj string, obj double")
    out = numeric_outliers(t, z_threshold=3.0).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.pred, r.subj) == ("p", "huge") and r.z > 3
    # z value sanity: mean ~= 201, std ~= 985 over the 101 p-facts
    vals = [100.0 + (i % 7) for i in range(100)] + [10_000.0]
    mean = sum(vals) / len(vals)
    var = sum(v * v for v in vals) / len(vals) - mean * mean
    assert r.z == pytest.approx((10_000.0 - mean) / math.sqrt(var), abs=1e-4)


def test_numeric_outliers_constant_predicate_no_flags(spark):
    t = spark.createDataFrame(
        [("p", f"s{i}", 7.0) for i in range(10)], "pred string, subj string, obj double"
    )
    assert numeric_outliers(t).count() == 0  # std = 0 guard
