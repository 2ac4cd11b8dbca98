"""As-of join (operators/joins.py) and deterministic sampling
(operators/sampling.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from graph_importer_spark.operators.joins import asof_join
from graph_importer_spark.operators.sampling import hash_sample, stratified_sample


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(100, 1, _ts(10)), (101, 1, _ts(30)), (102, 2, _ts(5)), (103, 3, _ts(20))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 1, _ts(8), 1.0), (2, 1, _ts(10), 2.0), (3, 1, _ts(29), 3.0),
         (4, 2, _ts(6), 4.0), (5, 3, _ts(20), 5.0), (6, 3, _ts(20), 6.0)],
        "click_id long, user_id long, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_inclusive_and_nulls(spark):
    left, right = _frames(spark)
    got = {
        r["event_id"]: (r["r_click_id"], r["r_ts"])
        for r in asof_join(left, right, on="user_id").collect()
    }
    assert got[100] == (2, _ts(10))  # inclusive: equal-ts click matches
    assert got[101] == (3, _ts(29))
    assert got[102] == (None, None)  # user 2's only click is later
    assert got[103] == (6, _ts(20))  # same-(user,ts) tie -> larger payload


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    got = {
        r["event_id"]: r["r_click_id"]
        for r in asof_join(left, right, on="user_id", strict=True).collect()
    }
    assert got[100] == 1  # equal-ts click no longer visible
    assert got[103] is None


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    got = {
        r["event_id"]: r["r_click_id"]
        for r in asof_join(
            left, right, on="user_id", tolerance=F.expr("INTERVAL 0.5 SECOND")
        ).collect()
    }
    assert got[100] == 2  # age 0 <= 0.5s: kept
    assert got[101] is None  # age 1s > 0.5s: nulled out


def test_asof_partition_invariance(spark):
    left, right = _frames(spark)
    a = sorted(map(tuple, asof_join(left, right, on="user_id").collect()))
    b = sorted(
        map(
            tuple,
            asof_join(left.repartition(7), right.repartition(5), on="user_id").collect(),
        )
    )
    assert a == b


def test_asof_bucketed_bit_identical_to_unbucketed(spark):
    """The hot-key escape hatch must not change semantics: same rows for
    plain, strict, and tolerance variants at several bucket widths,
    including widths smaller than gaps (forcing cross-bucket carries)."""
    left, right = _frames(spark)
    for w in (1, 3, 7, 3600):
        for kwargs in (
            {},
            {"strict": True},
            {"tolerance": F.expr("INTERVAL 0.5 SECOND")},
        ):
            a = sorted(map(tuple, asof_join(left, right, on="user_id", **kwargs).collect()))
            b = sorted(
                map(
                    tuple,
                    asof_join(
                        left, right, on="user_id", bucket_seconds=w, **kwargs
                    ).collect(),
                )
            )
            assert a == b, (w, kwargs)


def test_asof_bucketed_hot_key_splits_across_tasks(spark):
    """One key holds >50% of all rows spanning an hour: with
    bucket_seconds=60 its timeline must split across >1 window group
    (the plan's window partitions on (key, bucket), not key alone)."""
    hot_left = [(i, 1, _ts(0) + dt.timedelta(seconds=i)) for i in range(120)]
    cold_left = [(1000 + i, 2 + i, _ts(i)) for i in range(40)]
    left = spark.createDataFrame(
        hot_left + cold_left, "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(j, 1, _ts(0) + dt.timedelta(seconds=2 * j), float(j)) for j in range(60)]
        + [(500 + i, 2 + i, _ts(0), -1.0) for i in range(40)],
        "click_id long, user_id long, ts timestamp, v double",
    )
    bucketed = asof_join(left, right, on="user_id", bucket_seconds=60)
    plain = asof_join(left, right, on="user_id")
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))
    # the window's partition spec carries the bucket column
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "__asof_b" in plan
    # and the hot key's rows really occupy >1 (key, bucket) group
    n_groups = (
        left.filter(F.col("user_id") == 1)
        .select(F.floor(F.unix_timestamp("ts") / 60).alias("b"))
        .distinct()
        .count()
    )
    assert n_groups > 1


def test_join_name_collisions_raise(spark):
    left, right = _frames(spark)
    bad_left = left.withColumn("r_ts", F.lit(1))
    try:
        asof_join(bad_left, right, on="user_id")
        raise AssertionError("expected ValueError for output-name collision")
    except ValueError as e:
        assert "r_ts" in str(e)
    bad_right = right.withColumn("__asof_x", F.lit(1))
    try:
        asof_join(left, bad_right, on="user_id")
        raise AssertionError("expected ValueError for reserved-prefix collision")
    except ValueError as e:
        assert "__asof_" in str(e)
    from graph_importer_spark.operators.joins import interval_join

    bad_left2 = left.withColumn("__iv_b", F.lit(1))
    try:
        interval_join(bad_left2, right, on="user_id", lower_s=-10, upper_s=0)
        raise AssertionError("expected ValueError for interval reserved prefix")
    except ValueError as e:
        assert "__iv_" in str(e)


def test_hash_sample_partition_invariant_and_pushed_down(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.125).collect())
    b = sorted(
        r["doc_id"] for r in hash_sample(docs.repartition(9), "doc_id", 0.125).collect()
    )
    assert a == b and 0 < len(a) < docs.count()
    # the sampling predicate is a pure expression over a scanned column:
    # no shuffle appears in the plan
    plan = hash_sample(docs, "doc_id", 0.125)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_rates(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, grp string")
    got = stratified_sample(df, "grp", "id", {"a": 0.5, "b": 0.1}).groupBy("grp").count()
    counts = {r["grp"]: r["count"] for r in got.collect()}
    assert abs(counts["a"] / 2000 - 0.5) < 0.1
    assert abs(counts["b"] / 2000 - 0.1) < 0.05


def test_stratified_sample_default_drops(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, grp string")
    assert stratified_sample(df, "grp", "id", {"x": 1.0}).count() == 1


def test_asof_matches_pandas_merge_asof(spark):
    # differential test vs the pandas reference implementation on
    # random frames (unique (key, ts) per side -> no tie ambiguity)
    import random

    import pandas as pd

    rnd = random.Random(7)
    seen_l, seen_r = set(), set()
    lrows, rrows = [], []
    for i in range(300):
        k, s = rnd.randint(0, 9), rnd.randint(0, 500)
        if (k, s) not in seen_l:
            seen_l.add((k, s))
            lrows.append((i, k, _ts(0) + dt.timedelta(seconds=s)))
    for i in range(300):
        k, s = rnd.randint(0, 9), rnd.randint(0, 500)
        if (k, s) not in seen_r:
            seen_r.add((k, s))
            rrows.append((1000 + i, k, _ts(0) + dt.timedelta(seconds=s)))
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(rrows, "click_id long, user_id long, ts timestamp")
    got = {
        r["event_id"]: r["r_click_id"]
        for r in asof_join(left, right, on="user_id", right_payload=["click_id"]).collect()
    }
    lp = pd.DataFrame(lrows, columns=["event_id", "user_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["click_id", "user_id", "ts"]).sort_values("ts")
    ref = pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
    want = {
        int(row.event_id): (None if pd.isna(row.click_id) else int(row.click_id))
        for row in ref.itertuples()
    }
    assert got == want and len(got) == len(lrows)


def test_interval_join_matches_bruteforce(spark):
    import random

    from graph_importer_spark.operators.joins import interval_join

    rnd = random.Random(13)
    lrows = [
        (i, rnd.randint(0, 4), _ts(0) + dt.timedelta(seconds=rnd.randint(0, 900)))
        for i in range(120)
    ]
    rrows = [
        (500 + i, rnd.randint(0, 4), _ts(0) + dt.timedelta(seconds=rnd.randint(0, 900)))
        for i in range(120)
    ]
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(rrows, "click_id long, user_id long, ts timestamp")
    got = {
        (r["event_id"], r["r_click_id"])
        for r in interval_join(left, right, on="user_id", lower_s=-60, upper_s=30).collect()
    }
    want = {
        (e, c)
        for (e, ku, lt) in lrows
        for (c, kr, rt) in rrows
        if ku == kr and lt + dt.timedelta(seconds=-60) <= rt <= lt + dt.timedelta(seconds=30)
    }
    assert got == want and len(got) > 0


def test_interval_join_inclusive_bounds_and_plan(spark):
    from graph_importer_spark.operators.joins import interval_join

    left = spark.createDataFrame([(1, 7, _ts(30))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, 7, _ts(20)), (11, 7, _ts(30)), (12, 7, _ts(35)), (13, 7, _ts(36)), (14, 8, _ts(30))],
        "click_id long, user_id long, ts timestamp",
    )
    j = interval_join(left, right, on="user_id", lower_s=-10, upper_s=5)
    got = sorted(r["r_click_id"] for r in j.collect())
    assert got == [10, 11, 12]  # both endpoints inclusive; key 8 excluded
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan


def test_range_lookup_semantics_and_plan(spark):
    from graph_importer_spark.operators.joins import range_lookup
    from pyspark.sql import functions as F

    facts = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0, 5, 99, 100, 150, 2**20, 77])],
        "id long, v long",
    )
    ranges = spark.createDataFrame(
        [(0, 100, "low"), (100, 200, "mid")], "lo long, hi long, tier string"
    )
    out = range_lookup(facts, ranges, "v", bucket_bits=6)
    got = {r["id"]: r["tier"] for r in out.collect()}
    # half-open intervals: 99 -> low, 100 -> mid; out-of-range -> NULL
    assert got == {0: "low", 1: "low", 2: "low", 3: "mid", 4: "mid",
                   5: None, 6: "low"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_lookup_matches_naive_join(spark):
    from graph_importer_spark.operators.joins import range_lookup
    from pyspark.sql import functions as F

    facts = spark.createDataFrame(
        [(i, (i * 37) % 1000) for i in range(500)], "id long, v long"
    )
    ranges = spark.createDataFrame(
        [(i * 50, (i + 1) * 50, f"t{i}") for i in range(20) if i % 4 != 3],
        "lo long, hi long, tier string",
    )
    fast = {(r["id"], r["tier"]) for r in
            range_lookup(facts, ranges, "v", bucket_bits=4).collect()}
    naive = {
        (r["id"], r["tier"])
        for r in facts.join(
            ranges,
            (ranges.lo <= facts.v) & (facts.v < ranges.hi),
            "left",
        ).select("id", "tier").collect()
    }
    assert fast == naive


def test_domain_quota_sample_caps_and_is_partition_invariant(spark):
    from graph_importer_spark.operators.sampling import domain_quota_sample

    # skewed: domain "hot" has 400 rows, others 5 each
    rows = [("hot", i) for i in range(400)] + [
        (f"d{i % 8}", 1000 + i) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["domain", "id"]).withColumn(
        "payload", F.col("id") * 2
    )
    kept = domain_quota_sample(df, "domain", "id", quota=7)
    per = {r["domain"]: r["n"] for r in
           kept.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert per["hot"] == 7
    assert all(v == 5 for d, v in per.items() if d != "hot")
    # payload columns survive
    assert set(kept.columns) >= {"domain", "id", "payload", "_coin"}
    k = kept.filter(F.col("payload") != F.col("id") * 2).count()
    assert k == 0
    # membership is a pure function of (id, seed): repartitioning the
    # input must not change the kept set
    a = {tuple(r) for r in kept.select("domain", "id").collect()}
    b = {
        tuple(r)
        for r in domain_quota_sample(df.repartition(13), "domain", "id", 7)
        .select("domain", "id")
        .collect()
    }
    assert a == b


def test_weighted_sample_topk_global_routes_through_salted_topk(spark):
    """VERDICT r04 #2: the global (no-group) branch must not funnel the
    whole input through one task — it routes through skew.salted_topk,
    so the only SinglePartition exchange in the plan carries the <= k
    exploded candidates of the two-phase salted aggregation, never the
    raw input."""
    from graph_importer_spark.operators.sampling import weighted_sample_topk
    from graph_importer_spark.plans import physical_plan

    rows = [(i, float(1 + i % 9)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w double")
    out = weighted_sample_topk(df, "id", "w", k=25)
    plan = physical_plan(out)
    # the salted two-phase shape is present
    assert "_salt" in plan and "slice(array_sort" in plan
    # the single-partition exchange (final k-row rank) sits ABOVE the
    # candidate explode — its input is the <= buckets*k merge, not the
    # scan: everything below it must still contain the salted aggregate
    below = plan.split("Exchange SinglePartition", 1)[1]
    assert "partial_collect_list" in below and "_salt" in below
    got = {r.id for r in out.collect()}
    assert len(got) == 25
    # partition invariance (same sample at any parallelism)
    got2 = {
        r.id for r in weighted_sample_topk(df.repartition(11), "id", "w", 25)
        .collect()
    }
    assert got == got2
    # agreement with the grouped branch run over a constant group
    ref = weighted_sample_topk(
        df.withColumn("g", F.lit("all")), "id", "w", 25, group_cols=["g"]
    )
    assert {r.id for r in ref.collect()} == got
