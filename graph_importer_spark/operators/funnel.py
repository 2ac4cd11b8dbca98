"""Ordered funnel analysis over an event stream.

The standard product-analytics primitive the reference's event tooling
has no analogue for: given an ordered list of step event-types
(e.g. view -> click -> purchase), find for each user the earliest time
each step was reached, where step i must occur STRICTLY AFTER step i-1
was reached (so a purchase before the first view does not count).

Shape: K is a small constant, so the funnel is K chained
(filter -> per-user min aggregate -> equi-join on user) passes — each
one hash aggregation with map-side partials on a uniform user key plus
one join that re-uses the user partitioning.  No windows, no
collect_list of a user's whole history (which a sort-based funnel would
need and which breaks on power-law users), no UDF.  The step filters
push down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """events -> one row per user that completed step 1, with columns
    ``step1_ts .. stepK_ts`` (NULL once the funnel is abandoned) and
    ``steps_reached``.

    Conversion counts per step are then one tiny aggregate over the
    result: ``out.agg(*[F.count(f"step{i}_ts") for i in ...])``.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("step1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(user_col, F.col(ts_col).alias("_t"))
            .join(cur.select(user_col, f"step{i - 1}_ts"), user_col)
            .filter(F.col("_t") > F.col(f"step{i - 1}_ts"))
            .groupBy(user_col)
            .agg(F.min("_t").alias(f"step{i}_ts"))
        )
        cur = cur.join(nxt, user_col, "left")
    reached = sum(
        F.when(F.col(f"step{i}_ts").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return cur.select(user_col, *[f"step{i}_ts" for i in range(1, len(steps) + 1)],
                      reached.alias("steps_reached"))


def funnel_conversion(funnel: DataFrame, n_steps: int) -> DataFrame:
    """Per-step conversion rollup of ``funnel_steps`` output: one row
    per step with the count of users who reached it and the conversion
    ratio vs step 1.  A constant-width stack of scalar aggregates — one
    job, |steps| output rows."""
    counts = funnel.agg(
        *[F.count(f"step{i}_ts").alias(f"c{i}") for i in range(1, n_steps + 1)]
    )
    pairs = F.array(*[
        F.struct(
            F.lit(i).alias("step"),
            F.col(f"c{i}").alias("n_users"),
            F.round(F.col(f"c{i}") / F.col("c1"), 6).alias("conversion"),
        )
        for i in range(1, n_steps + 1)
    ])
    return counts.select(F.explode(pairs).alias("s")).select("s.*")
