"""Edge-list importer (reference parity: edge_list.py:8-66).

Differences vs the graphalytics path, preserved exactly:
* single file, no .properties;
* _from/_to use the PLAIN id format '<coll>/<id>'
  (ConverterToVertex.idx_to_vertex — edge_list.py:43);
* vertices are derived from edge endpoints and inserted UNIQUELY on the
  smart attribute — the reference does a per-bulk set() predup
  (edge_list.py:36-38) then a server-side AQL anti-join
  (vertices_generator.py:123-146: FILTER v NOT IN existing => INSERT
  {smartProp: v}).  Spark restatement: ``distinct()`` (partial
  map-side, same effect as the per-bulk set but global) + LEFT ANTI
  join against the existing table + append.

The anti-join-insert is exposed standalone as ``insert_vertices_unique``
because it is the reference's only pushed-down computation (its one AQL
query) and the graft's generic dedup-insert primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_importer_spark.importer.graphalytics import _lines, parse_edges
from graph_importer_spark.materialize import GraphSpec, materialize_graph
from graph_importer_spark.tables import GraphCatalog


def parse_edge_list(lines: DataFrame, vertices_coll: str = "vertices") -> DataFrame:
    """Comment chars #, %, / ; weight any non-WS token verbatim or NULL
    (README.md:99-103, edge_list.py:26-34); plain '<coll>/<id>' refs."""
    return parse_edges(lines, vertices_coll, smart=False)


def endpoint_vertices(lines: DataFrame, smart_attribute: str = "smartProp") -> DataFrame:
    """Distinct endpoint ids as vertex docs {smartProp: id}
    (edge_list.py:36-38 + vertices_generator.py:140)."""
    no_comments = lines.filter(~F.col("line").rlike(r"^[#/%]"))
    parts = no_comments.select(F.split("line", " ", 3).alias("p"))
    ids = parts.select(F.col("p")[0].alias("id")).unionByName(
        parts.select(F.col("p")[1].alias("id"))
    )
    return ids.distinct().select(F.col("id").alias(smart_attribute))


def insert_vertices_unique(
    cat: GraphCatalog, table: str, new_vertices: DataFrame, smart_attribute: str = "smartProp"
) -> None:
    """LEFT ANTI join dedup-insert (J3): Spark analogue of the AQL
    'FILTER v NOT IN existing => INSERT' (vertices_generator.py:132-140).
    Idempotent under re-run."""
    if cat.exists(table):
        existing = cat.read(table).select(smart_attribute)
        fresh = new_vertices.join(existing, smart_attribute, "left_anti")
        cat.append(table, fresh.distinct())
    else:
        cat.create_or_replace(table, new_vertices.distinct())


def import_edge_list(
    spark: SparkSession,
    cat: GraphCatalog,
    filename: str,
    spec: GraphSpec | None = None,
) -> bool:
    """Full import under the exists/overwrite contract
    (edge_list.py:60-66). Returns False if skipped."""
    spec = spec or GraphSpec(name="importedGraph", smart=False)
    lines = _lines(spark, filename)
    edges = parse_edge_list(lines, spec.vertices_coll)
    verts = endpoint_vertices(lines, spec.smart_attribute).withColumn(
        "_key", F.col(spec.smart_attribute)
    )
    return materialize_graph(cat, spec, verts, edges)
