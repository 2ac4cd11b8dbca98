"""Reference-semantics gate (SURVEY §5.3): import a graph in the
reference's own Graphalytics file format, run the analytics catalog on
the materialized vertex/edge tables (the exact keying the CLI uses),
and diff the results against independent pure-Python oracles
(union-find / power iteration / BFS).  This closes the loop the north
rule asks for: P/R of emitted results vs reference-semantics output on
a reference-format graph, here P = R = 1.0 (target >= 0.95)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_importer_spark.importer.graphalytics import import_graphalytics
from graph_importer_spark.materialize import GraphSpec
from graph_importer_spark.operators import analytics as A
from graph_importer_spark.tables import GraphCatalog

N = 24


def _edge_list() -> list[tuple[int, int]]:
    """Deterministic directed graph: congruential edge sprays + a
    directed 5-cycle (a non-trivial SCC) + dangling sinks."""
    seen, edges = set(), []
    for i in range(40):
        s, d = (i * 7 + 3) % N, (i * 11 + 5) % N
        if s != d and (s, d) not in seen:
            seen.add((s, d))
            edges.append((s, d))
    for s, d in [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]:  # 5-cycle
        if (s, d) not in seen:
            seen.add((s, d))
            edges.append((s, d))
    return edges


@pytest.fixture()
def ref_graph_dir(tmp_path):
    edges = _edge_list()
    d = tmp_path / "refg"
    d.mkdir()
    (d / "refg.v").write_text("".join(f"{v}\n" for v in range(N)))
    # every 3rd edge carries a weight: exercises the reference's
    # optional-weight parse path (graphalytics_importer.py:117-123)
    lines = [
        f"{s} {d2} {1 + i % 5}" if i % 3 == 0 else f"{s} {d2}"
        for i, (s, d2) in enumerate(edges)
    ]
    (d / "refg.e").write_text("# header comment\n" + "".join(x + "\n" for x in lines))
    (d / "refg.properties").write_text(
        f"graph.refg.meta.vertices = {N}\ngraph.refg.meta.edges = {len(edges)}\n"
    )
    return str(d)


def _python_wcc(edges):
    parent = list(range(N))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in range(N)}


def _python_pagerank(edges, damping=0.85, tol=1e-4, max_iter=20):
    """Mirrors analytics.pagerank semantics exactly: init 1.0, dangling
    mass redistributed uniformly, rank = (1-d) + d*(contrib + dang/n),
    break after update when max-delta < tol."""
    out_deg = {}
    for s, _ in edges:
        out_deg[s] = out_deg.get(s, 0) + 1
    rank = {v: 1.0 for v in range(N)}
    for _ in range(max_iter):
        dang = sum(rank[v] for v in range(N) if v not in out_deg)
        contrib = {v: 0.0 for v in range(N)}
        for s, d in edges:
            contrib[d] += rank[s] / out_deg[s]
        new = {
            v: (1 - damping) + damping * (contrib[v] + dang / N) for v in range(N)
        }
        delta = max(abs(new[v] - rank[v]) for v in range(N))
        rank = new
        if delta < tol:
            break
    return rank


def _python_bfs(edges, source=0):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist, frontier = {source: 0.0}, [source]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = dist[u] + 1.0
                    nxt.append(v)
        frontier = nxt
    return dist


def test_reference_format_import_then_analytics_match_oracles(
    spark, tmp_path, ref_graph_dir
):
    edges = _edge_list()
    cat = GraphCatalog(spark, str(tmp_path / "wh"))
    spec = GraphSpec(name="refg", overwrite=True)
    # import_graphalytics itself cross-checks counts vs .properties
    assert import_graphalytics(spark, cat, ref_graph_dir, spec)

    # the CLI's keying: analytics ids are xxhash64('<coll>/<_key>')
    e = cat.read("refg_edges").select(
        F.xxhash64("_from").alias("src"), F.xxhash64("_to").alias("dst")
    )
    key_of = {
        r["h"]: int(r["_key"].split(":")[-1])
        for r in cat.read("refg_vertices")
        .select(
            "_key",
            F.xxhash64(F.concat(F.lit("vertices/"), F.col("_key"))).alias("h"),
        )
        .collect()
    }

    # WCC vs union-find: exact partition match => pairwise P = R = 1.0
    got_cc = {
        key_of[r["id"]]: r["component"]
        for r in A.connected_components(e, max_iter=30).collect()
    }
    want_cc = _python_wcc(edges)
    pairs = lambda cc: {  # noqa: E731
        (a, b)
        for a in range(N)
        for b in range(a + 1, N)
        if cc.get(a) is not None and cc.get(a) == cc.get(b)
    }
    got_p, want_p = pairs(got_cc), pairs(want_cc)
    tp = len(got_p & want_p)
    precision = tp / len(got_p) if got_p else 1.0
    recall = tp / len(want_p) if want_p else 1.0
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0  # exact on this graph

    # PageRank vs power iteration with identical semantics
    got_pr = {
        key_of[r["id"]]: r["rank"] for r in A.pagerank(e, max_iter=20).collect()
    }
    want_pr = _python_pagerank(edges)
    assert set(got_pr) == set(range(N))
    for v in range(N):
        assert abs(got_pr[v] - want_pr[v]) <= 1e-6 * max(1.0, want_pr[v]), v

    # SSSP (unweighted hops) vs BFS from vertex 0 — the source is
    # resolved through the stored _key (smart '<id>:<id>' form), the
    # same resolution cli.py applies for --source
    src_hash = next(h for h, v in key_of.items() if v == 0)
    got_d = {
        key_of[r["id"]]: r["dist"]
        for r in A.sssp(e, source=src_hash, max_iter=40).collect()
    }
    assert got_d == _python_bfs(edges, 0)
