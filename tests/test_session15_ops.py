"""Round-4 session-15 operators: event n-grams, KG snapshot diff,
per-group quantile normalization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_importer_spark.operators.textstats import quantile_normalize
from graph_importer_spark.operators.timeseries import event_ngrams
from graph_importer_spark.triples import snapshot_diff


def test_event_ngrams_counts_sequences(spark):
    rows = [
        ("u1", "view", 1, 1), ("u1", "cart", 2, 2), ("u1", "buy", 3, 3),
        ("u2", "view", 1, 4), ("u2", "cart", 2, 5),
        ("u3", "view", 1, 6), ("u3", "cart", 2, 7),
    ]
    d = spark.createDataFrame(rows, "u string, t string, ts long, id long")
    out = {r.gram: r.n_occurrences for r in
           event_ngrams(d, "u", "t", "ts", "id", n=2, top=10).collect()}
    assert out["view>cart"] == 3
    assert out["cart>buy"] == 1


def test_event_ngrams_deterministic_order_and_ties(spark):
    rows = [("u", "a", 1, 1), ("u", "b", 1, 0)]  # same ts: id breaks tie
    d = spark.createDataFrame(rows, "u string, t string, ts long, id long")
    out = event_ngrams(d, "u", "t", "ts", "id", n=2).collect()
    assert out[0].gram == "b>a"  # id 0 first
    with pytest.raises(ValueError):
        event_ngrams(d, "u", "t", "ts", "id", n=0)


def test_snapshot_diff_churn(spark):
    old = spark.createDataFrame(
        [("a", "p", "x"), ("b", "p", "y"), ("c", "q", "z")],
        "subj string, pred string, obj string",
    )
    new = spark.createDataFrame(
        [("a", "p", "x"), ("d", "p", "w"), ("e", "p", "v")],
        "subj string, pred string, obj string",
    )
    out = {r.pred: r for r in snapshot_diff(old, new).collect()}
    assert (out["p"].n_added, out["p"].n_removed, out["p"].n_unchanged) == (2, 1, 1)
    assert (out["q"].n_added, out["q"].n_removed, out["q"].n_unchanged) == (0, 1, 0)


def test_quantile_normalize_percent_rank(spark):
    rows = [("a", i, float(i)) for i in range(5)] + [("b", 10, 99.0)]
    d = spark.createDataFrame(rows, "g string, id long, score double")
    out = {(r.g, r.id): r.pct for r in quantile_normalize(d, "g", "score").collect()}
    assert out[("a", 0)] == 0.0 and out[("a", 4)] == 1.0
    assert out[("a", 2)] == 0.5
    assert out[("b", 10)] == 0.0  # single-row group
