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


def column_match(
    a: DataFrame,
    b: DataFrame,
    a_cols: list[str],
    b_cols: list[str],
    decimals: int = 6,
) -> DataFrame:
    """Instance-based schema matching: Jaccard similarity of the
    distinct value sets of every (a-column, b-column) pair — the
    value-overlap half of classic schema matchers (COMA / Similarity
    Flooding instance baselines; Rahm & Bernstein VLDB J. 2001).
    The integration step a KG builder runs before mapping a scraped
    web table onto an existing ontology's attributes.

    Values compare as trimmed lowercase strings; NULLs drop.
    -> (a_col, b_col, n_a, n_b, n_common, jaccard).

    Scale shape: each side is ONE unpivot (explode of a literal
    column-name array -> (col, value)) + distinct; the overlap is a
    single (value)-keyed equi-join keyed on values, then a
    (a_col, b_col) aggregate.  Column counts ride on the same distinct
    tables.  Cost is data-linear; nothing is per-column-pair scanned.
    """

    def _unpivot(df: DataFrame, cols: list[str], side: str) -> DataFrame:
        pairs = F.array(
            *[
                F.struct(
                    F.lit(c).alias("col"),
                    F.trim(F.lower(F.col(c).cast("string"))).alias("val"),
                )
                for c in cols
            ]
        )
        return (
            df.select(F.explode(pairs).alias("p"))
            .select(F.col("p.col").alias(f"{side}_col"), F.col("p.val").alias("val"))
            .filter(F.col("val").isNotNull())
            .distinct()
        )

    ua, ub = _unpivot(a, a_cols, "a"), _unpivot(b, b_cols, "b")
    na = ua.groupBy("a_col").agg(F.count("*").alias("n_a"))
    nb = ub.groupBy("b_col").agg(F.count("*").alias("n_b"))
    common = (
        ua.join(ub, "val")
        .groupBy("a_col", "b_col")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(na, "a_col")
        .join(nb, "b_col")
        .select(
            "a_col",
            "b_col",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                decimals,
            ).alias("jaccard"),
        )
    )
