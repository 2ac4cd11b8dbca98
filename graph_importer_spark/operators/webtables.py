"""Web-table -> KG triple lifting.

The WebTables / DBpedia-tables extraction step (Cafarella et al.,
VLDB 2008; Lehmberg et al., WWW 2016): relational tables scraped from
web pages become (row-entity, column-header, cell) triples once the
SUBJECT COLUMN — the column naming each row's entity — is identified.
The standard heuristic (Lehmberg's "key column"): the LEFTMOST column
whose values are (near-)unique across rows.

Input is the long/cell form a scraper naturally emits:
(table_id, row_id, col_id, header, value) — one row per cell.  This
composes with the page pipeline: extract tables from HTML upstream
(mapInPandas), lift here, feed `triples.constraint_audit` /
`fact_fusion` downstream.

Reference contract mirrored: the emitted (subj, pred, obj) schema is
the pipeline's canonical triple shape (graph_importer_spark.triples;
reference edge docs graphalytics_importer.py:117-123).

Scale shape: subject-column election is one (table, col)-keyed
aggregate (count + count_distinct, partial-agg friendly) + one
table-keyed min; lifting is ONE (table, row)-keyed self-join of the
cell table (subject cells x non-subject cells).  Tables are
fine-grained keys — no skew beyond a pathological mega-table, which
AQE splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def elect_subject_columns(
    cells: DataFrame,
    uniq_threshold: float = 0.8,
    table_col: str = "table_id",
    row_col: str = "row_id",
    col_col: str = "col_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-table subject column: the leftmost (min col_id) column whose
    distinct-value ratio over non-null cells is >= ``uniq_threshold``.
    Tables with no qualifying column are dropped (no safe subject).
    -> (table_id, subj_col, uniq_ratio)."""
    stats = (
        cells.filter(F.col(value_col).isNotNull())
        .groupBy(table_col, col_col)
        .agg(
            F.count("*").alias("_n"),
            F.countDistinct(value_col).alias("_nd"),
        )
        .withColumn("uniq_ratio", F.col("_nd") / F.col("_n"))
        .filter(F.col("uniq_ratio") >= uniq_threshold)
    )
    best = stats.groupBy(table_col).agg(
        F.min(col_col).alias("subj_col")
    )
    return best.join(
        stats.select(
            table_col,
            F.col(col_col).alias("subj_col"),
            F.round("uniq_ratio", 6).alias("uniq_ratio"),
        ),
        [table_col, "subj_col"],
    )


def lift_tables(
    cells: DataFrame,
    uniq_threshold: float = 0.8,
    table_col: str = "table_id",
    row_col: str = "row_id",
    col_col: str = "col_id",
    header_col: str = "header",
    value_col: str = "value",
) -> DataFrame:
    """Lift every table with an electable subject column into triples:
    subj = the row's subject-column value, pred = the other column's
    header, obj = that column's cell value.  NULL subjects and NULL
    objects drop (no assertion to make).
    -> (table_id, subj, pred, obj)."""
    subj_cols = elect_subject_columns(
        cells, uniq_threshold, table_col, row_col, col_col, value_col
    ).select(table_col, "subj_col")
    subj_cells = (
        cells.join(subj_cols, table_col)
        .filter(F.col(col_col) == F.col("subj_col"))
        .filter(F.col(value_col).isNotNull())
        .select(table_col, row_col, F.col(value_col).alias("subj"))
    )
    obj_cells = (
        cells.join(subj_cols, table_col)
        .filter(F.col(col_col) != F.col("subj_col"))
        .filter(F.col(value_col).isNotNull())
        .select(
            table_col,
            row_col,
            F.col(header_col).alias("pred"),
            F.col(value_col).alias("obj"),
        )
    )
    return subj_cells.join(obj_cells, [table_col, row_col]).select(
        table_col, "subj", "pred", "obj"
    )
