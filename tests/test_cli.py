"""CLI surface (reference entry-point parity: importer.py /
generator.py / start_Pregel.py lifecycles)."""

from __future__ import annotations

import os

from graph_importer_spark.cli import main
from graph_importer_spark.tables import GraphCatalog


def test_cli_generate_and_analytics(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    rc = main([
        "generate", "--warehouse", wh, "--graphtype", "clique",
        "--num_vertices", "12", "--graph_name", "g", "--overwrite",
    ])
    assert rc == 0
    cat = GraphCatalog(spark, wh)
    assert cat.read("g_edges").count() == 12 * 11 // 2
    assert cat.read("g_vertices").count() == 12

    # exists-and-no-overwrite => skip (reference resume contract)
    main(["generate", "--warehouse", wh, "--graphtype", "clique",
          "--num_vertices", "12", "--graph_name", "g"])
    assert "skipped" in capsys.readouterr().out

    rc = main([
        "analytics", "--warehouse", wh, "--graph_name", "g",
        "--algorithm", "wcc", "--max_gss", "10",
    ])
    assert rc == 0
    comp = cat.read("g_wcc")
    # one clique => one component
    assert comp.select("result").distinct().count() == 1


def test_cli_analytics_store_writes_result_onto_vertices(spark, tmp_path):
    """Reference store/resultField parity (start_Pregel.py:179-192):
    with --store the Pregel result must land as a field on the vertex
    documents themselves, not only in the side table."""
    wh = str(tmp_path / "whs")
    main([
        "generate", "--warehouse", wh, "--graphtype", "clique",
        "--num_vertices", "10", "--graph_name", "g", "--overwrite",
    ])
    rc = main([
        "analytics", "--warehouse", wh, "--graph_name", "g",
        "--algorithm", "pagerank", "--max_gss", "8",
        "--store", "--result_field", "pr",
    ])
    assert rc == 0
    cat = GraphCatalog(spark, wh)
    verts = cat.read("g_vertices")
    assert "pr" in verts.columns
    rows = verts.select("_key", "pr").collect()
    assert len(rows) == 10
    assert all(r["pr"] is not None and r["pr"] > 0 for r in rows)
    # overwrite semantics recorded as a tagged snapshot
    assert cat.has_tag("g_vertices", "store_pagerank")

    # multi-column results (hits) keep their own field names
    rc = main([
        "analytics", "--warehouse", wh, "--graph_name", "g",
        "--algorithm", "hits", "--max_gss", "5", "--store",
    ])
    assert rc == 0
    verts = cat.read("g_vertices")
    assert {"hub", "authority", "pr"} <= set(verts.columns)


def test_cli_sssp_smart_key_suffix_resolution(spark, tmp_path):
    """ADVICE regression: smart graphs with smart_attribute='part' store
    keys '<part>:<id>'; --source <id> must resolve via the ':<id>'
    suffix instead of failing with SystemExit."""
    wh = str(tmp_path / "whsm")
    main([
        "generate", "--warehouse", wh, "--graphtype", "cliques-graph",
        "--num_parts", "3", "--min_size", "3", "--max_size", "4",
        "--graph_name", "sg", "--overwrite",
    ])
    cat = GraphCatalog(spark, wh)
    # rewrite vertex keys into the smart '<part>:<id>' form the
    # materializer produces for smart_attribute='part'
    import pyspark.sql.functions as F

    v = cat.read("sg_vertices").select(
        F.concat_ws(":", "part", "_key").alias("_key"), "part"
    )
    e = cat.read("sg_edges").select(
        F.concat(
            F.lit("vertices/"),
            F.regexp_replace("_from", "^vertices/", ""),
        ).alias("_from"),
        "_to",
    )
    # keys changed, so re-key the edge endpoints the same way
    key_of = {
        r["_key"].split(":")[1]: r["_key"]
        for r in v.select("_key").collect()
    }
    e = cat.read("sg_edges").toPandas()
    e["_from"] = e["_from"].map(lambda s: "vertices/" + key_of[s.split("/")[1]])
    e["_to"] = e["_to"].map(lambda s: "vertices/" + key_of[s.split("/")[1]])
    cat.create_or_replace("sg_vertices", v)
    cat.create_or_replace("sg_edges", spark.createDataFrame(e))
    rc = main([
        "analytics", "--warehouse", wh, "--graph_name", "sg",
        "--algorithm", "sssp", "--source", "0", "--max_gss", "10",
    ])
    assert rc == 0
    assert cat.read("sg_sssp").count() >= 1


def test_cli_import_edge_list(spark, tmp_path):
    f = tmp_path / "e.txt"
    f.write_text("# c\n1 2\n2 3 0.5\n")
    wh = str(tmp_path / "wh2")
    rc = main([
        "import-edge-list", "--warehouse", wh, "--graph_name", "el",
        "--overwrite", str(f),
    ])
    assert rc == 0
    cat = GraphCatalog(spark, wh)
    assert cat.read("el_edges").count() == 2
    assert cat.read("el_vertices").count() == 3


def test_cli_pipeline_synthetic(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh3")
    rc = main([
        "pipeline", "--warehouse", wh, "--n_pages", "30",
        "--n_entities", "10", "--graph_name", "kg", "--overwrite",
    ])
    assert rc == 0
    assert "triples:" in capsys.readouterr().out
    cat = GraphCatalog(spark, wh)
    assert cat.exists("triples") and cat.exists("kg_vertices")


def test_cli_analytics_triangles_and_kcore(spark, tmp_path):
    wh = str(tmp_path / "wh_tri")
    rc = main([
        "generate", "--warehouse", wh, "--graphtype", "clique",
        "--num_vertices", "8", "--graph_name", "g", "--overwrite",
    ])
    assert rc == 0
    cat = GraphCatalog(spark, wh)

    rc = main([
        "analytics", "--warehouse", wh, "--graph_name", "g",
        "--algorithm", "trianglecount",
    ])
    assert rc == 0
    tri = {r["triangles"] for r in cat.read("g_trianglecount").collect()}
    assert tri == {21}  # K8: each vertex in C(7,2) triangles

    rc = main([
        "analytics", "--warehouse", wh, "--graph_name", "g",
        "--algorithm", "kcore", "--k", "7",
    ])
    assert rc == 0
    core = cat.read("g_kcore")
    assert core.count() == 8  # K8 is a 7-core
    rc = main([
        "analytics", "--warehouse", wh, "--graph_name", "g",
        "--algorithm", "kcore", "--k", "8",
    ])
    assert rc == 0
    assert cat.read("g_kcore").count() == 0
