"""Vertex id / key synthesis (reference parity: P3-P5 in SURVEY.md §2.2).

Reference: ConverterToVertex (vertices_generator.py:149-160)
  idx_to_smart_vertex(idx, smart) -> '<coll>/<smart>:<idx>'
                                     (smart defaults to idx)
  idx_to_vertex(idx)              -> '<coll>/<idx>'
and graphalytics vertex docs {smart: str(vid), _key: 'vid:vid'}
(graphalytics_importer.py:87).

Everything is concat of string casts — whole-stage-codegen territory.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def idx_to_smart_vertex(coll: str, idx: Column, smart: Column | None = None) -> Column:
    """'<coll>/<smart>:<idx>' — vertices_generator.py:153-157."""
    smart = idx if smart is None else smart
    return F.concat(
        F.lit(coll + "/"), smart.cast("string"), F.lit(":"), idx.cast("string")
    )


def idx_to_vertex(coll: str, idx: Column) -> Column:
    """'<coll>/<idx>' — vertices_generator.py:159-160."""
    return F.concat(F.lit(coll + "/"), idx.cast("string"))


def graphalytics_vertex_doc(vid: Column, smart_attribute: str):
    """vid -> (smart_attribute=str(vid), _key='vid:vid')
    — graphalytics_importer.py:87."""
    return [
        vid.cast("string").alias(smart_attribute),
        F.concat_ws(":", vid.cast("string"), vid.cast("string")).alias("_key"),
    ]
