"""Column profiling — the data-quality summary a pipeline runs before
trusting a new 100 TB drop.

The reference's only input diagnostics are an edge-count estimate and
file-set listing (graphalytics.py provenance: helper.py:21-35,
graphalytics_importer.py:29-41); a Spark-native engine profiles every
column in two shuffles regardless of column count.

Shape: UNPIVOT (explode one row per (column, value) pair — map-only,
xN columns but no shuffle) -> groupBy(column, value) count (partial
aggregation absorbs Zipf-hot values map-side) -> groupBy(column)
roll-up.  This avoids both the multi-count-distinct Expand plan (which
multiplies the SCAN by the column count through one wide shuffle) and
N separate per-column jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, columns: list[str] | None = None, decimals: int = 6
) -> DataFrame:
    """-> one row per profiled column: (column, n_rows, n_null,
    null_frac, n_distinct, min_value, max_value, top_value, top_count).

    Values are compared/reported AS STRINGS (profiling view, not typed
    stats): min/max/top are over the string form, so pick columns whose
    string order is meaningful or treat those fields as fingerprints.
    Ties on top_count break toward the LARGER value string (arg_max on
    (count, value)) so the result is deterministic.
    """
    cols = columns or df.columns
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.column", "p.value")
    counted = pairs.groupBy("column", "value").agg(F.count("*").alias("cnt"))
    nn = F.col("value").isNotNull()
    return counted.groupBy("column").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(~nn, F.col("cnt")).otherwise(F.lit(0))).alias("n_null"),
        F.round(
            F.sum(F.when(~nn, F.col("cnt")).otherwise(F.lit(0)))
            / F.sum("cnt"),
            decimals,
        ).alias("null_frac"),
        F.count(F.when(nn, F.lit(1))).alias("n_distinct"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.max_by("value", F.when(nn, F.struct(F.col("cnt"), F.col("value")))).alias(
            "top_value"
        ),
        F.max(F.when(nn, F.col("cnt"))).alias("top_count"),
    )
