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
