"""Fellegi-Sunter probabilistic record-linkage scoring.

The decision layer on top of blocking (operators/blocking.py makes the
candidate pairs; this scores them): for each comparison field f with
match probability m_f = P(agree | same entity) and u_f =
P(agree | different entities), a pair's log-likelihood-ratio weight is

    w = sum_f  [ agree_f ? ln(m_f / u_f) : ln((1-m_f) / (1-u_f)) ]

(Fellegi & Sunter, JASA 1969 — the model behind Splink/RecordLinkage).
Pairs with w >= upper are matches, w <= lower non-matches, in between
possible matches for clerical review.

Scale shape: the score is a pure codegen expression over the pair
table's own columns — zero shuffle, zero UDF, linear in |pairs| (which
blocking already bounded).  The (m, u) table is a constant baked into
the plan, the published EM-fitting step being a handful of scalar
aggregates over a sample when parameters are unknown.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fs_score(
    pairs: DataFrame,
    weights: dict[str, tuple[float, float]],
    lower: float = 0.0,
    upper: float = 3.0,
    decimals: int = 6,
) -> DataFrame:
    """pairs carrying one BOOLEAN agreement column per field named in
    ``weights`` ({field: (m, u)}) -> pairs + ``fs_weight`` +
    ``fs_decision`` ('match' / 'possible' / 'non_match').

    m and u must lie strictly inside (0, 1) — a field that always or
    never agrees carries no information and makes the log blow up.
    """
    total: Column = F.lit(0.0)
    for field, (m, u) in sorted(weights.items()):
        if not (0.0 < m < 1.0 and 0.0 < u < 1.0):
            raise ValueError(f"m/u for {field!r} must be in (0, 1)")
        import math

        total = total + F.when(
            F.col(field), F.lit(math.log(m / u))
        ).otherwise(F.lit(math.log((1.0 - m) / (1.0 - u))))
    w = F.round(total, decimals)
    decision = (
        F.when(w >= upper, F.lit("match"))
        .when(w <= lower, F.lit("non_match"))
        .otherwise(F.lit("possible"))
    )
    return pairs.withColumn("fs_weight", w).withColumn("fs_decision", decision)
