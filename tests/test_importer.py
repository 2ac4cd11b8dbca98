"""Importer parity vs reference parse semantics (SURVEY §2.1-2.2).

The pure-Python oracles here are direct transcriptions of the
reference's parse loops (graphalytics_importer.py:112-124,
edge_list.py:22-40) run on the same fixture lines."""

from __future__ import annotations

import os

import pytest

from graph_importer_spark.importer.edge_list import (
    endpoint_vertices,
    import_edge_list,
    insert_vertices_unique,
    parse_edge_list,
)
from graph_importer_spark.importer.graphalytics import (
    _lines,
    get_property_graphalytics,
    graphalytics_files,
    import_graphalytics,
    read_graphalytics_edges,
    read_graphalytics_vertices,
)
from graph_importer_spark.materialize import GraphSpec
from graph_importer_spark.tables import GraphCatalog

V_LINES = ["1", "2", "42", "7"]
E_LINES = [
    "# comment",
    "% other comment",
    "/ third comment style",
    "1 2",
    "2 42 3.5",
    "42 7 weight with spaces",  # split(' ', 2): remainder verbatim
    "7 1 0",
]


def _ref_parse(line: str):
    """Transcribed reference semantics (graphalytics_importer.py:117-123)."""
    if line[0] in ("#", "/", "%"):
        return None
    e = line.split(" ", 2)
    if len(e) == 2:
        return (e[0], e[1], None)
    return (e[0], e[1], e[2])


@pytest.fixture()
def gfiles(tmp_path):
    d = tmp_path / "mygraph"
    d.mkdir()
    (d / "mygraph.v").write_text("\n".join(V_LINES) + "\n")
    (d / "mygraph.e").write_text("\n".join(E_LINES) + "\n")
    (d / "mygraph.properties").write_text(
        "graph.mygraph.meta.vertices = 4\ngraph.mygraph.meta.edges = 4\n"
    )
    return str(d)


def test_file_resolution_and_properties(gfiles):
    vf, ef, pf = graphalytics_files(gfiles)
    assert vf.endswith("mygraph.v") and ef.endswith("mygraph.e")
    assert get_property_graphalytics(pf, "num_vertices") == 4
    assert get_property_graphalytics(pf, "num_edges") == 4
    with pytest.raises(RuntimeError):
        get_property_graphalytics(pf, "nope")


def test_vertex_parse(spark, gfiles):
    vf, _, _ = graphalytics_files(gfiles)
    rows = read_graphalytics_vertices(spark, vf).collect()
    got = {(r["smartProp"], r["_key"]) for r in rows}
    assert got == {(v, f"{v}:{v}") for v in V_LINES}


def test_edge_parse_matches_reference_semantics(spark, gfiles):
    _, ef, _ = graphalytics_files(gfiles)
    rows = read_graphalytics_edges(spark, ef, "vertices").collect()
    want = set()
    for line in E_LINES:
        p = _ref_parse(line)
        if p:
            want.add((f"vertices/{p[0]}:{p[0]}", f"vertices/{p[1]}:{p[1]}", p[2]))
    assert {(r["_from"], r["_to"], r["weight"]) for r in rows} == want
    # missing weight => SQL NULL; weight stored verbatim as string
    by_from = {r["_from"]: r["weight"] for r in rows}
    assert by_from["vertices/1:1"] is None
    assert by_from["vertices/42:42"] == "weight with spaces"
    assert by_from["vertices/7:7"] == "0"


def test_full_import_and_count_crosscheck(spark, gfiles, warehouse):
    cat = GraphCatalog(spark, warehouse)
    spec = GraphSpec(name="g", smart=True, overwrite=True)
    assert import_graphalytics(spark, cat, gfiles, spec) is True
    assert cat.read("g_vertices").count() == 4
    assert cat.read("g_edges").count() == 4
    # exists-and-not-overwrite => skip (reference resume contract)
    spec2 = GraphSpec(name="g", smart=True, overwrite=False)
    assert import_graphalytics(spark, cat, gfiles, spec2) is False


def test_count_mismatch_raises(spark, tmp_path, warehouse):
    d = tmp_path / "bad"
    d.mkdir()
    (d / "bad.v").write_text("1\n2\n")
    (d / "bad.e").write_text("1 2\n")
    (d / "bad.properties").write_text(".vertices = 99\n.edges = 1\n")
    cat = GraphCatalog(spark, warehouse)
    with pytest.raises(RuntimeError, match="count mismatch"):
        import_graphalytics(spark, cat, str(d), GraphSpec(name="b", overwrite=True))


def test_edge_list_import(spark, tmp_path, warehouse):
    f = tmp_path / "edges.txt"
    f.write_text("\n".join(E_LINES) + "\n")
    cat = GraphCatalog(spark, warehouse)
    spec = GraphSpec(name="el", smart=False, overwrite=True)
    assert import_edge_list(spark, cat, str(f), spec) is True
    edges = cat.read("el_edges").collect()
    # plain (non-smart) '<coll>/<id>' refs (edge_list.py:43)
    assert {r["_from"] for r in edges} == {"vertices/1", "vertices/2", "vertices/42", "vertices/7"}
    verts = cat.read("el_vertices").collect()
    assert {r["smartProp"] for r in verts} == {"1", "2", "42", "7"}


def test_insert_vertices_unique_idempotent(spark, warehouse):
    cat = GraphCatalog(spark, warehouse)
    df1 = spark.createDataFrame([("a",), ("b",)], "smartProp string")
    insert_vertices_unique(cat, "vcoll", df1)
    insert_vertices_unique(cat, "vcoll", df1)  # re-run: no dupes
    df2 = spark.createDataFrame([("b",), ("c",)], "smartProp string")
    insert_vertices_unique(cat, "vcoll", df2)
    got = sorted(r["smartProp"] for r in cat.read("vcoll").collect())
    assert got == ["a", "b", "c"]
