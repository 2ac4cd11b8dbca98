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


def resample_ffill(
    df,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int,
    tiebreak_col: str | None = None,
):
    """Resample an irregular per-key series onto a regular epoch grid
    with forward fill -> (key, grid_ts, value): for every key, one row
    per ``step_seconds`` tick from its first observation's bucket to
    its last, carrying the latest observation at-or-before the tick —
    the feature-engineering normal form (regular tensors from ragged
    event logs).

    Mechanics: the key's [min, max] epoch range is one aggregate;
    ``sequence()`` explodes the grid (fan-out = span/step, a documented
    cost the caller controls via step_seconds); grid ticks union with
    the observations and ONE key-ordered window carries
    last(value, ignoreNulls) forward; grid rows are kept, observation
    rows dropped.  Observations at the same second as a tick sort
    BEFORE it (is_grid flag in the ordering), so a tick reflects
    everything <= its timestamp.

    Scale shape: one key shuffle shared by the window; per-key state is
    the key's own rows + its grid — keys are user/series-grained.  A
    single pathological key spanning years at 1 s steps is a fan-out
    problem the step parameter owns; there is no corpus-wide sort.
    """
    from pyspark.sql import functions as F

    # deterministic ordering among same-second observations: without a
    # tiebreak, which of two equal-timestamp values carries forward is
    # a partition race (ts truncates to epoch seconds)
    tb = (
        F.col(tiebreak_col).cast("long")
        if tiebreak_col is not None
        else F.lit(0)
    )
    obs = df.select(
        F.col(key_col).alias("k"),
        F.unix_timestamp(ts_col).alias("t"),
        F.col(value_col).alias("v"),
        F.lit(0).alias("is_grid"),
        tb.alias("tb"),
    )
    spans = obs.groupBy("k").agg(
        (F.floor(F.min("t") / step_seconds) * step_seconds).alias("t0"),
        (F.floor(F.max("t") / step_seconds) * step_seconds).alias("t1"),
    )
    grid = spans.select(
        "k",
        F.explode(
            F.sequence("t0", "t1", F.lit(step_seconds))
        ).alias("t"),
        F.lit(None).cast(obs.schema["v"].dataType).alias("v"),
        F.lit(1).alias("is_grid"),
        F.lit(-1).cast("long").alias("tb"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_grid", "tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = obs.unionByName(grid).select(
        "k", "t", "is_grid", F.last("v", ignorenulls=True).over(w).alias("value")
    )
    return filled.filter(F.col("is_grid") == 1).select(
        F.col("k").alias(key_col),
        F.col("t").alias("grid_ts"),
        "value",
    )


def event_ngrams(
    events: DataFrame,
    key_col: str,
    type_col: str,
    ts_col: str,
    tiebreak_col: str,
    n: int = 2,
    top: int = 20,
) -> DataFrame:
    """Frequent event n-grams: per-key event sequences (ordered by
    ts, ties by the REQUIRED tiebreak column) sliced into n-grams and
    counted corpus-wide, top-``top`` returned — the first-order
    sequential-pattern miner (the n=2 case is the Markov transition
    support table; cf. event_transitions for the normalized form).

    -> (gram, n_occurrences) ordered by (count desc, gram asc),
    deterministic under ties.

    Scale shape: ONE key-keyed aggregate builds each sequence
    (collect_list state bounded by per-key event count — cap sessions
    upstream like sessionize does); n-gram slicing is a zero-shuffle
    array expression; the count partial-aggregates on the gram key;
    the final top-k is orderBy+limit = TakeOrderedAndProject (no
    global sort materialization).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    seq = events.groupBy(key_col).agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct(ts_col, tiebreak_col, type_col))
            ),
            lambda s: s.getField(type_col),
        ).alias("_seq")
    )
    grams = seq.select(
        F.explode(
            F.when(
                F.size("_seq") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("_seq") - F.lit(n - 1)),
                    lambda i: F.array_join(F.slice("_seq", i, n), ">"),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
        .limit(top)
    )
