"""Local-backend GraphCatalog commit protocol: appends become visible
only at the atomic meta swap, so a crashed append can never duplicate
rows on replay (the property the streaming layer's exactly-once claim
rests on)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from graph_importer_spark.tables import GraphCatalog


def test_append_visible_only_after_meta_commit(spark, tmp_path):
    cat = GraphCatalog(spark, str(tmp_path / "wh"))
    base = spark.range(10).select(F.col("id"))
    cat.create_or_replace("t", base, tag="init")
    cat.append("t", spark.range(10, 15).select(F.col("id")), tag="b1")
    assert cat.read("t").count() == 15
    assert cat.has_tag("t", "b1")
    assert sum(n for _, n in cat.file_row_counts("t")) == 15

    # simulate the crash window: data files land on disk (renamed into
    # an append-* dir) but the meta swap never happened
    orphan = os.path.join(str(tmp_path / "wh"), "t", "append-deadbeef")
    spark.range(100, 200).select(F.col("id")).write.parquet(orphan)
    assert cat.read("t").count() == 15  # orphan invisible
    assert sum(n for _, n in cat.file_row_counts("t")) == 15

    # the replayed batch appends fresh and commits exactly once
    cat.append("t", spark.range(15, 20).select(F.col("id")), tag="b2")
    assert cat.read("t").count() == 20
    got = sorted(r["id"] for r in cat.read("t").collect())
    assert got == list(range(20))


def test_append_snapshots_accumulate_in_order(spark, tmp_path):
    cat = GraphCatalog(spark, str(tmp_path / "wh2"))
    cat.create_or_replace("t", spark.range(3), tag="s0")
    cat.append("t", spark.range(3), tag="s1")
    cat.append("t", spark.range(3))
    snaps = cat.snapshots("t")
    assert [s["op"] for s in snaps] == ["create_or_replace", "append", "append"]
    assert [s["tag"] for s in snaps] == ["s0", "s1", None]
    assert cat.read("t").count() == 9
