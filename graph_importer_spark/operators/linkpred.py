"""Link prediction over an undirected graph: common-neighbor, Jaccard
and Adamic-Adar scores for non-adjacent vertex pairs.

KG-construction use: after canonicalization the entity co-occurrence
graph is sparse; link-prediction scores rank candidate missing edges
(KG completion / candidate triple generation) and feed the same
negative-sampling loop as ``contract.q_kg_negative_samples``.  The
reference has no such operator (its graphs go straight to server-side
Pregel, start_Pregel.py:28-57); this is part of the §2.11-style
training-data surface built on the same edge frames.

Scale shape (the wedge join is the whole cost):
* Adjacency is symmetrized once; wedges come from ONE self-equi-join
  keyed on the middle vertex ``mid`` — a shuffle on ``mid`` with
  map-side combine absorbed by the following (a, b) partial aggregate.
* Wedge count per middle vertex is deg(mid)^2 — power-law hubs make
  this explode (the classic O(d_max^2) blow-up).  ``max_degree`` drops
  hub middles BEFORE the join (one degree aggregate + semi-join), the
  standard cap: a hub contributes 1/ln(deg) ~ 0 Adamic-Adar mass
  anyway, so the approximation is tiny and documented, and the join
  cost becomes sum(min(deg, cap)^2).
* Already-adjacent pairs leave via a left-anti equi-join against the
  canonical edge set (link prediction scores NEW links only).
* Jaccard denominators use the TRUE degrees (uncapped) — degrees join
  back after the aggregate, touching only the surviving pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Distinct undirected edges as (a < b)."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def link_prediction_scores(
    edges: DataFrame,
    min_common: int = 1,
    max_degree: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """edges(src, dst) -> (a, b, common, jaccard, adamic_adar) for
    non-adjacent pairs a < b sharing >= ``min_common`` neighbors.

    ``max_degree`` (None = exact) excludes middle vertices with degree
    above the cap from wedge generation — the documented hub
    approximation that bounds the self-join at scale.  Scores are
    rounded to ``decimals`` for replayable comparison.
    """
    e = _canonical(edges)
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count("*").alias("deg"))

    mid = adj.join(deg, "u").select(
        F.col("u").alias("mid"), "v", F.col("deg").alias("mid_deg")
    )
    if max_degree is not None:
        mid = mid.filter(F.col("mid_deg") <= F.lit(max_degree))

    x, y = mid.alias("x"), mid.alias("y")
    wedges = x.join(y, "mid").filter(F.col("x.v") < F.col("y.v")).select(
        F.col("x.v").alias("a"),
        F.col("y.v").alias("b"),
        F.col("x.mid_deg").alias("mid_deg"),
    )
    scored = wedges.groupBy("a", "b").agg(
        F.count("*").alias("common"),
        F.sum(F.lit(1.0) / F.log(F.col("mid_deg").cast("double"))).alias("_aa"),
    )
    if min_common > 1:
        scored = scored.filter(F.col("common") >= F.lit(min_common))
    new_pairs = scored.join(e, ["a", "b"], "left_anti")

    da = deg.select(F.col("u").alias("a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("u").alias("b"), F.col("deg").alias("_db"))
    return (
        new_pairs.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common",
            F.round(
                F.col("common")
                / (F.col("_da") + F.col("_db") - F.col("common")).cast("double"),
                decimals,
            ).alias("jaccard"),
            F.round("_aa", decimals).alias("adamic_adar"),
        )
    )
