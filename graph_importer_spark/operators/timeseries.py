"""Per-key rolling-window statistics and z-score anomaly flags.

The event-stream profiling primitive (metrics QA on a training-data
firehose: flag value spikes per user/host/feed before they poison an
aggregate).  All window frames are ROWS BETWEEN bounds over a
(key, ts, id) ordering — Spark translates these to a single sort-based
window per key partition, one shuffle on the key.

Determinism note: variance uses the explicit sum-of-squares identity
var = (sumsq - sum^2/n) / (n-1) computed from two window SUMs instead
of ``stddev_samp`` — both engines then evaluate the identical
expression over the identical frame order, so results replay
bit-for-bit (up to the documented rounding) where a builtin stddev's
internal accumulation order may not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window: int = 5,
    z_threshold: float = 2.0,
    min_prev: int = 3,
    decimals: int = 6,
) -> DataFrame:
    """For each row: mean/std of the PREVIOUS ``window`` values for the
    same key (frame = window preceding .. 1 preceding — the current row
    never sees itself, so the flag is usable online), plus
    ``is_anomaly`` when |value - mean| > z_threshold * std and at least
    ``min_prev`` history rows exist.

    Scale: one shuffle on the key; frames are bounded (ROWS window), so
    per-row state is O(window) regardless of how hot a key is.  Skewed
    keys serialize within their partition — if one key dominates the
    corpus, pre-split it by a coarse time bucket first.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col).cast("double")
    n = F.count(value_col).over(w)
    s = F.sum(v).over(w)
    sq = F.sum(v * v).over(w)
    # explicit n guards: ANSI mode turns the empty/singleton-frame
    # divisions into errors rather than NULL/NaN
    mean = F.when(n >= 1, s / n)
    # the n guard must wrap the greatest() clamp too: Spark's greatest
    # IGNORES nulls (greatest(NULL, 0.0) = 0.0), which would turn the
    # no-history std into 0.0 instead of NULL
    std = F.when(
        n >= 2,
        # greatest clamps the -eps roundoff of the sumsq identity
        F.sqrt(F.greatest((sq - s * s / n) / (n - 1), F.lit(0.0))),
    )
    out = df.select(
        key_col,
        id_col,
        ts_col,
        value_col,
        n.alias("n_prev"),
        F.round(mean, decimals).alias("roll_mean"),
        F.round(std, decimals).alias("roll_std"),
        (
            (n >= min_prev)
            & (F.abs(v - mean) > F.lit(z_threshold) * std)
        ).alias("is_anomaly"),
    )
    return out


def transition_counts(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    decimals: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix of the per-key event-type
    sequences: (prev_type, next_type, n, p) where p is the row-
    stochastic probability P(next | prev).  The clickstream/session
    model behind path analysis and next-event prediction.

    One lag window per key (the same single key shuffle as
    rolling_zscore, ordered by ts then id) + one (prev, next) count
    aggregate with map-side partials; the probabilities divide by a
    per-prev rollup of the COUNTS table, which is bounded by
    |types|^2 rows — corpus-size-independent.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    seq = df.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n")
    )
    tot = counts.groupBy("prev_type").agg(F.sum("n").alias("_t"))
    return counts.join(tot, "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("_t"), decimals).alias("p"),
    )
