"""Round-4 session-2 operators: Count-Min sketch, SCD2 history,
Z-order layout, web link graph."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from graph_importer_spark.operators import layout, scd2, sketches, urls


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def test_cms_never_undercounts_and_exact_when_wide(spark):
    rows = [(k,) for k in [1] * 50 + [2] * 20 + [3] * 5 + list(range(10, 40))]
    df = spark.createDataFrame(rows, "k long")
    cands = df.select("k").distinct()
    est = {
        r["k"]: r["est"]
        for r in sketches.cms_estimate(
            cands, "k", sketches.cms_build(df, "k", 3, 1024), 3, 1024
        ).collect()
    }
    true = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    for k, n in true.items():
        assert est[k] >= n  # CMS overcounts only
    # wide sketch, few keys: no collisions -> exact
    assert est[1] == 50 and est[2] == 20 and est[3] == 5


def test_cms_narrow_width_still_orders_heavy_hitters(spark):
    rows = [(k,) for k in [7] * 200 + [8] * 100 + list(range(100, 164))]
    df = spark.createDataFrame(rows, "k long")
    top = sketches.cms_topk(df, "k", df.select("k").distinct(), k=2, width=16).collect()
    assert [r["k"] for r in top] == [7, 8]
    assert top[0]["est"] >= 200 and top[1]["est"] >= 100


def test_cms_mergeable(spark):
    a = spark.createDataFrame([(k,) for k in [1] * 10 + [2] * 3], "k long")
    b = spark.createDataFrame([(k,) for k in [1] * 5 + [3] * 7], "k long")
    merged = (
        sketches.cms_build(a, "k")
        .union(sketches.cms_build(b, "k"))
        .groupBy("d", "pos")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = sketches.cms_build(a.union(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


# ---------------------------------------------------------------------------
# SCD2
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def changes(spark):
    t = lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)  # noqa: E731
    rows = [
        # key 1: A -> A (re-assert, collapses) -> B -> A again
        (1, "A", t(0), 100),
        (1, "A", t(10), 101),
        (1, "B", t(20), 102),
        (1, "A", t(30), 103),
        # key 2: single state
        (2, "X", t(5), 104),
        # key 3: change to NULL is a real change
        (3, "P", t(0), 105),
        (3, None, t(10), 106),
        (3, None, t(20), 107),
    ]
    return spark.createDataFrame(rows, "k long, attr string, ts timestamp, eid long")


def test_scd2_history_collapses_and_versions(spark, changes):
    h = scd2.scd2_history(changes, "k", ["attr"], "ts", "eid")
    rows = {(r["k"], r["version"]): r for r in h.collect()}
    # key 1: 3 intervals (A collapsed over two assertions, then B, then A)
    assert (1, 1) in rows and rows[(1, 1)]["attr"] == "A"
    assert rows[(1, 1)]["valid_to"] == rows[(1, 2)]["valid_from"]
    assert rows[(1, 2)]["attr"] == "B" and not rows[(1, 2)]["is_current"]
    assert rows[(1, 3)]["attr"] == "A" and rows[(1, 3)]["is_current"]
    assert rows[(1, 3)]["valid_to"] is None
    assert (1, 4) not in rows
    # key 2: one open interval
    assert rows[(2, 1)]["is_current"] and rows[(2, 1)]["valid_to"] is None
    # key 3: NULL transition kept, NULL re-assertion collapsed
    assert rows[(3, 1)]["attr"] == "P" and rows[(3, 2)]["attr"] is None
    assert (3, 3) not in rows


def test_scd2_latest_matches_history_current(spark, changes):
    latest = {
        r["k"]: r["attr"]
        for r in scd2.scd2_latest(changes, "k", ["attr"], "ts", "eid").collect()
    }
    cur = {
        r["k"]: r["attr"]
        for r in scd2.scd2_history(changes, "k", ["attr"], "ts", "eid")
        .filter("is_current")
        .collect()
    }
    assert latest == cur == {1: "A", 2: "X", 3: None}


def test_scd2_asof_slices_intervals(spark, changes):
    h = scd2.scd2_history(changes, "k", ["attr"], "ts", "eid")
    at = scd2.scd2_asof(h, "k", F.lit(dt.datetime(2024, 1, 1, 0, 0, 25)))
    got = {r["k"]: r["attr"] for r in at.collect()}
    assert got == {1: "B", 2: "X", 3: None}


def test_scd2_single_shuffle_plan(spark, changes):
    h = scd2.scd2_history(changes, "k", ["attr"], "ts", "eid")
    plan = h._jdf.queryExecution().executedPlan().toString()
    # both windows share one partitioning: exactly one exchange
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------


def test_zorder_interleave_known_values(spark):
    df = spark.createDataFrame([(x, y) for x in range(4) for y in range(4)], "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", layout.zorder_key(F.col("x"), F.col("y"), 2).alias("z")
        ).collect()
    }
    # Morton order: z = interleave(x lowest bit -> bit0, y lowest -> bit1)
    assert got[(0, 0)] == 0 and got[(1, 0)] == 1 and got[(0, 1)] == 2
    assert got[(1, 1)] == 3 and got[(2, 2)] == 12 and got[(3, 3)] == 15


def test_zorder_layout_improves_two_dim_skipping(spark):
    # a grid where row order is x-major: sorting by x gives perfect x
    # pruning and useless y pruning; the z-curve prunes on BOTH.
    n = 32
    df = spark.createDataFrame(
        [(i, i // n, i % n) for i in range(n * n)], "id long, x long, y long"
    )
    lo, hi = F.lit(0), F.lit(n - 1)
    z = layout.zorder_key(
        layout.quantize(F.col("x"), lo, hi, 5),
        layout.quantize(F.col("y"), lo, hi, 5),
        5,
    )
    dims = {"x": F.col("x"), "y": F.col("y")}
    by_x = layout.file_stats(df, F.col("x") * n + F.col("y"), dims, 16, F.col("id"))
    by_z = layout.file_stats(df, z, dims, 16, F.col("id"))
    skip = lambda stats, d: stats.filter(  # noqa: E731
        ~((F.col(f"{d}_min") <= 11) & (F.col(f"{d}_max") >= 8))
    ).count()
    # x-sort: perfect on x, zero on y; z-order: skips on both dims
    assert skip(by_x, "x") == 14 and skip(by_x, "y") == 0
    assert skip(by_z, "x") >= 8 and skip(by_z, "y") >= 8
    r = layout.skipping_ratio(by_z, "y", 8, 11).collect()[0]["skip_frac"]
    assert r >= 0.5


# ---------------------------------------------------------------------------
# Web link graph
# ---------------------------------------------------------------------------


def test_extract_links_absolute_only(spark):
    html = (
        '<html><body><a href="https://a.example/x"></a>'
        '<a href="/relative"></a><a href="mailto:z@q.com"></a>'
        '<a href="http://b.example/y"></a></body></html>'
    )
    df = spark.createDataFrame(
        [("https://src.example/p", bytearray(html, "utf8"))], "url string, html binary"
    )
    links = urls.extract_links(df).collect()
    assert sorted(r["link"] for r in links) == [
        "http://b.example/y",
        "https://a.example/x",
    ]
    every = urls.extract_links(df, absolute_only=False).count()
    assert every == 4


def test_host_link_graph_drops_self_loops(spark):
    rows = [
        ("https://a.example/1", "https://b.example/x"),
        ("https://a.example/2", "https://b.example/y"),
        ("https://a.example/3", "https://A.EXAMPLE/self"),  # self loop (case-folded)
        ("https://b.example/1", "https://a.example/z"),
    ]
    df = spark.createDataFrame(rows, "url string, link string")
    g = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in urls.host_link_graph(df).collect()
    }
    assert g == {("a.example", "b.example"): 2, ("b.example", "a.example"): 1}


def test_host_link_graph_feeds_pagerank(spark):
    # composition: extract links -> host graph -> pagerank over hosts.
    # hub.example is linked by every other host, so it must rank first.
    from graph_importer_spark.operators.analytics import pagerank

    pages = []
    for i in range(6):
        html = (
            f'<html><body><a href="https://hub.example/h"></a>'
            f'<a href="https://site{(i + 1) % 6}.example/x"></a></body></html>'
        )
        pages.append((f"https://site{i}.example/p", bytearray(html, "utf8")))
    df = spark.createDataFrame(pages, "url string, html binary")
    g = urls.host_link_graph(urls.extract_links(df))
    edges = g.select(
        F.xxhash64("src_host").alias("src"), F.xxhash64("dst_host").alias("dst")
    )
    hub = spark.createDataFrame([("hub.example",)], "h string").select(
        F.xxhash64("h").alias("id")
    ).collect()[0]["id"]
    ranks = {r["id"]: r["rank"] for r in pagerank(edges).collect()}
    assert max(ranks, key=ranks.get) == hub


# ---------------------------------------------------------------------------
# Histogram sketch + weighted sampling
# ---------------------------------------------------------------------------


def test_hist_quantiles_track_uniform(spark):
    from graph_importer_spark.operators import sketches

    df = spark.createDataFrame(
        [(i % 2, float(i % 100)) for i in range(2000)], "g int, v double"
    )
    h = sketches.hist_sketch(df, ["g"], "v", lo=0.0, hi=100.0, bins=50)
    q = {
        (r["g"], r["q"]): r["est"]
        for r in sketches.hist_quantiles(
            h, ["g"], [0.5, 0.9], lo=0.0, hi=100.0, bins=50
        ).collect()
    }
    # uniform 0..99, bin width 2: p50 ~ 50, p90 ~ 90, error <= one bin
    for g in (0, 1):
        assert abs(q[(g, 0.5)] - 50.0) <= 2.0
        assert abs(q[(g, 0.9)] - 90.0) <= 2.0


def test_hist_sketch_mergeable_and_clamped(spark):
    from graph_importer_spark.operators import sketches

    df = spark.createDataFrame(
        [(0, -5.0), (0, 3.0), (0, 999.0)], "g int, v double"
    )
    h = {r["bin"]: r["cnt"] for r in
         sketches.hist_sketch(df, ["g"], "v", 0.0, 10.0, 10).collect()}
    # -5 clamps to bin 0, 999 clamps to bin 9
    assert h[0] == 1 and h[3] == 1 and h[9] == 1


def test_weighted_sample_prefers_heavy_and_is_deterministic(spark):
    from graph_importer_spark.operators import sampling

    rows = [(i, 50.0 if i % 10 == 0 else 0.05) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w double")
    a = sampling.weighted_sample_topk(df, "id", "w", k=50)
    b = sampling.weighted_sample_topk(df.repartition(7), "id", "w", k=50)
    ids_a = sorted(r["id"] for r in a.collect())
    ids_b = sorted(r["id"] for r in b.collect())
    assert ids_a == ids_b  # partition-invariant
    heavy = sum(1 for i in ids_a if i % 10 == 0)
    # 100 heavy rows (weight 50) vs 900 light (weight 0.05): the sample
    # must be dominated by heavy rows
    assert heavy >= 40


def test_extract_anchors_pairs_href_with_text(spark):
    html = (
        '<html><a href="https://a.example/x">First Link</a>'
        '<a class="nav" href="https://b.example/y">Second</a>'
        '<a href="/relative">rel text</a>'
        '<a href="https://c.example/z"></a></html>'
    )
    df = spark.createDataFrame([("u1", html.encode())], ["url", "html"])
    rows = sorted(
        (r["link"], r["anchor"])
        for r in urls.extract_anchors(df).collect()
    )
    # relative dropped (absolute_only), empty-text dropped, href/text
    # pairing stays positional
    assert rows == [
        ("https://a.example/x", "First Link"),
        ("https://b.example/y", "Second"),
    ]
    with_rel = urls.extract_anchors(df, absolute_only=False).count()
    assert with_rel == 3  # relative kept, empty text still dropped


def test_anchor_alias_candidates_normalizes_and_scores(spark):
    rows = (
        [("u", "https://e1.wiki/p", "Entity One")] * 3
        + [("u", "https://e1.wiki/p", "  entity   ONE ")] * 1
        + [("u", "https://e1-alt.wiki/q", "Entity One")] * 1
        + [("u", "https://e2.wiki/p", "Entity Two")] * 1  # below min_count
    )
    df = spark.createDataFrame(rows, ["url", "link", "anchor"])
    got = {
        (r["alias"], r["dst"]): (r["n"], r["prob"])
        for r in urls.anchor_alias_candidates(df, min_count=2).collect()
    }
    # case/whitespace variants merge; prob = n / total over the alias
    assert got == {("entity one", "e1.wiki"): (4, 0.8)}
    loose = {
        (r["alias"], r["dst"]): r["prob"]
        for r in urls.anchor_alias_candidates(df, min_count=1).collect()
    }
    assert loose[("entity one", "e1-alt.wiki")] == 0.2
    assert loose[("entity two", "e2.wiki")] == 1.0
    # min_prob discards the minority sense
    strict = urls.anchor_alias_candidates(df, min_count=1, min_prob=0.5)
    assert {r["dst"] for r in strict.collect()} == {"e1.wiki", "e2.wiki"}


def test_anchor_alias_candidates_by_url(spark):
    df = spark.createDataFrame(
        [("u", "https://E1.wiki/p#frag", "X"), ("u", "https://e1.wiki/p", "X")],
        ["url", "link", "anchor"],
    )
    (r,) = urls.anchor_alias_candidates(df, min_count=2, by_host=False).collect()
    # canonical-URL dst: case-folded host, fragment stripped -> merged
    assert (r["alias"], r["dst"], r["n"]) == ("x", "https://e1.wiki/p", 2)


def test_extract_meta_fields_and_defaults(spark):
    html1 = (
        "<html><head><title>My Page</title>"
        '<meta name="description" content="a fine page">'
        '<link rel="canonical" href="https://x.example/canon">'
        '<meta name="robots" content="noindex,nofollow"></head></html>'
    )
    html2 = (
        "<html><head><title>Other</title>"
        '<meta content="reversed attrs" name="description"></head></html>'
    )
    html3 = "<html><body>no head metadata at all</body></html>"
    df = spark.createDataFrame(
        [("u1", html1.encode()), ("u2", html2.encode()), ("u3", html3.encode())],
        ["url", "html"],
    )
    rows = {r["url"]: r for r in urls.extract_meta(df).collect()}
    assert rows["u1"]["title"] == "My Page"
    assert rows["u1"]["meta_description"] == "a fine page"
    assert rows["u1"]["canonical_url"] == "https://x.example/canon"
    assert rows["u1"]["noindex"] is True
    # reversed attribute order still matches
    assert rows["u2"]["meta_description"] == "reversed attrs"
    assert rows["u2"]["noindex"] is False
    # absent fields come back as '' / False, never NULL
    assert rows["u3"]["title"] == ""
    assert rows["u3"]["meta_description"] == ""
    assert rows["u3"]["canonical_url"] == ""
    assert rows["u3"]["noindex"] is False
