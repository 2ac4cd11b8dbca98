"""Unit tests for the session-3 operators: BM25 retrieval, snapshot
diff, and leakage-free grouped splits."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graph_importer_spark.operators.diffing import dataset_diff, diff_summary
from graph_importer_spark.operators.retrieval import bm25_topk
from graph_importer_spark.operators.sampling import group_split, string_unit


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_scores_match_hand_computation(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark shuffle"),
            (2, "spark window merge window"),
            (3, "nothing relevant here at all"),
            (4, "merge"),
        ],
        ["doc_id", "text"],
    )
    out = bm25_topk(docs, "doc_id", "text", ["spark", "merge"], k=10).collect()
    got = {r["doc_id"]: (r["n_terms"], r["score"]) for r in out}
    # doc 3 matches no term -> absent
    assert set(got) == {1, 2, 4}

    # hand-compute: N=4, avgdl = (3+4+5+1)/4 = 3.25, k1=1.2, b=0.75
    n, avgdl, k1, b = 4, 3.25, 1.2, 0.75

    def idf(df):
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def tfn(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    # df(spark)=2, df(merge)=2
    exp1 = round(idf(2) * tfn(2, 3), 4)
    exp2 = round(idf(2) * tfn(1, 4) + idf(2) * tfn(1, 4), 4)
    exp4 = round(idf(2) * tfn(1, 1), 4)
    assert got[1] == (1, pytest.approx(exp1))
    assert got[2] == (2, pytest.approx(exp2))
    assert got[4] == (1, pytest.approx(exp4))
    # ordering: score desc, id asc
    assert [r["doc_id"] for r in out] == sorted(
        got, key=lambda d: (-got[d][1], d)
    )


def test_bm25_k_limits_and_case_folding(spark):
    docs = spark.createDataFrame(
        [(i, f"Word{i % 3} filler") for i in range(20)], ["doc_id", "text"]
    )
    out = bm25_topk(docs, "doc_id", "text", ["WORD0"], k=3).collect()
    assert len(out) == 3
    assert all(r["doc_id"] % 3 == 0 for r in out)


def test_bm25_rejects_empty_query(spark):
    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        bm25_topk(docs, "doc_id", "text", [])


# ---------------------------------------------------------------------------
# dataset_diff
# ---------------------------------------------------------------------------


def test_dataset_diff_statuses_and_changed_cols(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 21), (4, None, 40), (5, "e", 50)],
        ["k", "s", "v"],
    )
    rows = {
        r["k"]: (r["status"], r["changed_cols"])
        for r in dataset_diff(old, new, ["k"]).collect()
    }
    assert rows[1] == ("unchanged", [])
    assert rows[2] == ("changed", ["s", "v"])
    assert rows[3] == ("removed", [])
    # null == null must be unchanged (null-safe compare)
    assert rows[4] == ("unchanged", [])
    assert rows[5] == ("added", [])

    summary = {
        r["status"]: r["n"]
        for r in diff_summary(dataset_diff(old, new, ["k"])).collect()
    }
    assert summary == {"unchanged": 2, "changed": 1, "removed": 1, "added": 1}


def test_dataset_diff_null_transitions_are_changes(spark):
    old = spark.createDataFrame([(1, "a"), (2, None)], ["k", "s"])
    new = spark.createDataFrame([(1, None), (2, "b")], ["k", "s"])
    rows = {
        r["k"]: r["status"] for r in dataset_diff(old, new, ["k"]).collect()
    }
    assert rows == {1: "changed", 2: "changed"}


def test_dataset_diff_compare_cols_subset_and_extra_columns(spark):
    # columns present on only one side are ignored, not compared
    old = spark.createDataFrame([(1, "a", "x")], ["k", "s", "only_old"])
    new = spark.createDataFrame([(1, "a", 9)], ["k", "s", "only_new"])
    (r,) = dataset_diff(old, new, ["k"]).collect()
    assert (r["status"], r["changed_cols"]) == ("unchanged", [])


def test_dataset_diff_requires_keys(spark):
    df = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError):
        dataset_diff(df, df, [])


# ---------------------------------------------------------------------------
# group_split
# ---------------------------------------------------------------------------


def test_group_split_is_group_pure_and_exhaustive(spark):
    df = spark.createDataFrame(
        [(f"g{i % 37}", i) for i in range(500)], ["grp", "v"]
    )
    out = group_split(
        df, "grp", [("train", 0.8), ("valid", 0.1), ("test", 0.1)]
    )
    # every row labeled, labels only from the declared set
    labels = {r["split"] for r in out.select("split").distinct().collect()}
    assert labels <= {"train", "valid", "test"}
    assert out.filter(F.col("split").isNull()).count() == 0
    # group purity: each group maps to exactly one split
    assert (
        out.groupBy("grp")
        .agg(F.countDistinct("split").alias("n"))
        .filter(F.col("n") > 1)
        .count()
        == 0
    )


def test_group_split_matches_string_unit_boundaries(spark):
    df = spark.createDataFrame([(f"g{i}",) for i in range(64)], ["grp"])
    out = group_split(df, "grp", [("a", 0.5), ("b", 0.5)], seed=7)
    coins = df.select(
        "grp", string_unit(F.col("grp"), seed=7).alias("u")
    ).collect()
    expect = {r["grp"]: ("a" if r["u"] < 0.5 else "b") for r in coins}
    got = {r["grp"]: r["split"] for r in out.collect()}
    assert got == expect


def test_group_split_seed_changes_assignment_deterministically(spark):
    df = spark.createDataFrame([(f"g{i}",) for i in range(200)], ["grp"])
    a1 = {
        r["grp"]: r["split"]
        for r in group_split(df, "grp", [("x", 0.5), ("y", 0.5)], 1).collect()
    }
    a1b = {
        r["grp"]: r["split"]
        for r in group_split(df, "grp", [("x", 0.5), ("y", 0.5)], 1).collect()
    }
    a2 = {
        r["grp"]: r["split"]
        for r in group_split(df, "grp", [("x", 0.5), ("y", 0.5)], 2).collect()
    }
    assert a1 == a1b
    assert a1 != a2


def test_group_split_validates_fractions(spark):
    df = spark.createDataFrame([("g",)], ["grp"])
    with pytest.raises(ValueError):
        group_split(df, "grp", [("a", 0.5), ("b", 0.6)])
    with pytest.raises(ValueError):
        group_split(df, "grp", [])


# ---------------------------------------------------------------------------
# tfidf_keywords
# ---------------------------------------------------------------------------


def test_tfidf_keywords_ranks_distinctive_terms(spark):
    from graph_importer_spark.operators.retrieval import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "common alpha alpha beta"),
            (2, "common alpha gamma"),
            (3, "common gamma gamma delta"),
            (4, "common delta beta"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_keywords(docs, "doc_id", "text", k=2, min_df=1, max_df_frac=0.9)
    rows = {(r["doc_id"], r["rank"]): r["term"] for r in out.collect()}
    # 'common' (df=4 > 0.9*4) is excluded by the ceiling; within doc 1
    # 'alpha' (tf=2) outranks 'beta' (tf=1, same df)
    assert "common" not in set(rows.values())
    assert rows[(1, 1)] == "alpha"
    assert rows[(1, 2)] == "beta"
    # doc 3: gamma tf=2 beats delta
    assert rows[(3, 1)] == "gamma"


def test_tfidf_keywords_df_floor_and_k(spark):
    from graph_importer_spark.operators.retrieval import tfidf_keywords

    docs = spark.createDataFrame(
        [(1, "solo shared"), (2, "shared other words")], ["doc_id", "text"]
    )
    out = tfidf_keywords(docs, "doc_id", "text", k=5, min_df=2, max_df_frac=1.0)
    terms = {r["term"] for r in out.collect()}
    assert terms == {"shared"}  # df=1 terms dropped by the floor
    # k caps output
    docs2 = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h")], ["doc_id", "text"]
    )
    out2 = tfidf_keywords(docs2, "doc_id", "text", k=3, min_df=1, max_df_frac=1.0)
    assert out2.groupBy("doc_id").count().collect()[0]["count"] == 3


def test_tfidf_keywords_tie_break_is_term_asc(spark):
    from graph_importer_spark.operators.retrieval import tfidf_keywords

    docs = spark.createDataFrame(
        [(1, "zed ant"), (2, "zed ant")], ["doc_id", "text"]
    )
    out = tfidf_keywords(docs, "doc_id", "text", k=2, min_df=1, max_df_frac=1.0)
    rows = {(r["doc_id"], r["rank"]): r["term"] for r in out.collect()}
    assert rows[(1, 1)] == "ant" and rows[(1, 2)] == "zed"
