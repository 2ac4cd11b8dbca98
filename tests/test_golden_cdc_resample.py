"""Golden-record survivorship, CDC apply, resample + forward fill."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from graph_importer_spark.operators.linkage import golden_record
from graph_importer_spark.operators.scd2 import apply_cdc
from graph_importer_spark.operators.timeseries import resample_ffill


# -- golden record ------------------------------------------------------------

def test_golden_record_rules(spark):
    rows = [
        (1, "alice", 10.0, "web", 100),
        (1, "alicia", 30.0, "web", 200),
        (1, None, 20.0, "app", 300),
        (2, "bob", 5.0, None, 100),
    ]
    df = spark.createDataFrame(
        rows, "cluster long, name string, bal double, src string, ts long"
    )
    got = {
        r.cluster: r
        for r in golden_record(
            df,
            "cluster",
            {"name": "latest", "bal": "max", "src": "mode"},
            ts_col="ts",
        ).collect()
    }
    g1 = got[1]
    assert g1.n_members == 3
    assert g1.name == "alicia"  # latest NON-NULL (ts 300 row is null)
    assert g1.bal == 30.0
    assert g1.src == "web"  # 2 web vs 1 app
    g2 = got[2]
    assert g2.name == "bob" and g2.src is None  # all-null mode -> null


def test_golden_record_mode_tie_larger_string(spark):
    rows = [(1, "a"), (1, "b")]
    df = spark.createDataFrame(rows, "cluster long, src string")
    r = golden_record(df, "cluster", {"src": "mode"}).collect()[0]
    assert r.src == "b"


def test_golden_record_latest_requires_ts(spark):
    df = spark.createDataFrame([(1, "x")], "cluster long, name string")
    with pytest.raises(ValueError):
        golden_record(df, "cluster", {"name": "latest"})


# -- CDC apply ----------------------------------------------------------------

def test_apply_cdc_semantics(spark):
    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a1", "U", 1), (1, "a2", "U", 2),  # v2 wins
            (2, None, "D", 1),                     # delete
            (9, "new", "I", 1),                    # insert
        ],
        "k long, v string, op string, version int",
    )
    got = {r.k: r.v for r in apply_cdc(snap, changes, "k").collect()}
    assert got == {1: "a2", 3: "c", 9: "new"}


def test_apply_cdc_delete_then_reinsert(spark):
    snap = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, None, "D", 1), (1, "back", "I", 2)],
        "k long, v string, op string, version int",
    )
    got = {r.k: r.v for r in apply_cdc(snap, changes, "k").collect()}
    assert got == {1: "back"}


def test_apply_cdc_empty_changes(spark):
    snap = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame(
        [], "k long, v string, op string, version int"
    )
    got = {r.k: r.v for r in apply_cdc(snap, changes, "k").collect()}
    assert got == {1: "a"}


# -- resample + forward fill --------------------------------------------------

def _t(sec: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_resample_ffill_carries_values(spark):
    rows = [(1, _t(5), 10.0), (1, _t(125), 20.0)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    got = {r.grid_ts: r.value for r in
           resample_ffill(df, "k", "ts", "v", step_seconds=60).collect()}
    base = int(_t(0).timestamp())
    # ticks at 0s (before first obs -> null), 60s (carries 10), 120s (10)
    assert got[base] is None
    assert got[base + 60] == 10.0
    assert got[base + 120] == 10.0
    assert len(got) == 3


def test_resample_ffill_same_second_tiebreak(spark):
    # two observations in the same second: the larger tiebreak wins
    rows = [(1, _t(10), 1.0, 7), (1, _t(10), 2.0, 9)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double, eid long")
    got = resample_ffill(
        df, "k", "ts", "v", step_seconds=60, tiebreak_col="eid"
    ).collect()
    assert len(got) == 1 and got[0].value is None  # tick at 0s precedes obs
    rows2 = [(1, _t(10), 1.0, 7), (1, _t(10), 2.0, 9), (1, _t(70), 9.0, 1)]
    df2 = spark.createDataFrame(rows2, "k long, ts timestamp, v double, eid long")
    got2 = {r.grid_ts: r.value for r in resample_ffill(
        df2, "k", "ts", "v", step_seconds=60, tiebreak_col="eid").collect()}
    base = int(_t(0).timestamp())
    assert got2[base + 60] == 2.0  # eid 9 beat eid 7 within second 10


# -- edit-distance pairs --------------------------------------------------------

def _brute_pairs(names):
    import itertools

    def ed(a, b):
        # classic DP levenshtein
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    return {
        (i, j, ed(a, b))
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if ed(a, b) <= 1 and len(a) >= 2 and len(b) >= 2
    }


def test_edit_pairs_complete_vs_brute(spark):
    from graph_importer_spark.operators.dedup import edit_distance_pairs

    # substitutions, insertions, deletions, boundary edits, odd/even
    names = [
        "alpha", "alpho", "alpha1", "alph", "beta", "betta", "bet",
        "gamma", "gamm", "gamma", "xy", "xz", "x",
    ]
    df = spark.createDataFrame(list(enumerate(names)), "id long, s string")
    got = {(r.id1, r.id2, r.dist)
           for r in edit_distance_pairs(df, "id", "s").collect()}
    assert got == _brute_pairs(names)


def test_edit_pairs_k_guard(spark):
    from graph_importer_spark.operators.dedup import edit_distance_pairs

    df = spark.createDataFrame([(1, "ab")], "id long, s string")
    import pytest as _pt
    with _pt.raises(ValueError):
        edit_distance_pairs(df, "id", "s", k=2)
