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


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 7 * 86400,
    decimals: int = 6,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST event (period = floor(epoch_seconds / period_seconds));
    for each (cohort, offset) cell, ``n_active`` counts the cohort
    members with at least one event in cohort+offset, and ``retention``
    normalizes by the cohort's size (its offset-0 count — every member
    is by construction active in its first period).

    -> (cohort, offset, n_active, cohort_size, retention).

    Scale shape: the corpus pays ONE (key, period) hash aggregate
    (partial-agg absorbs per-user event volume map-side) whose output
    is at most |users| x |periods| rows; the first-period reduction and
    the join back are keyed on the user — both run on that already
    collapsed table, never on raw events.  The (cohort, offset) matrix
    is bounded by |periods|^2 rows, so the cohort-size join broadcasts.
    No windows, no global sort.
    """
    p = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(period_seconds))
    per = (
        events.select(F.col(key_col).alias("_k"), p.alias("_p"))
        .groupBy("_k", "_p")
        .agg(F.count("*").alias("_n"))
        .drop("_n")
    )
    first = per.groupBy("_k").agg(F.min("_p").alias("cohort"))
    cells = (
        per.join(first, "_k")
        .select("cohort", (F.col("_p") - F.col("cohort")).alias("offset"))
        .groupBy("cohort", "offset")
        .agg(F.count("*").alias("n_active"))
    )
    sizes = cells.filter(F.col("offset") == 0).select(
        "cohort", F.col("n_active").alias("cohort_size")
    )
    return (
        cells.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") / F.col("cohort_size"), decimals
            ).alias("retention"),
        )
    )


def rfm_scores(
    orders: DataFrame,
    key_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    ref_epoch_seconds: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """RFM customer segmentation: per key, recency (whole days between
    the key's latest order and the reference instant), frequency
    (order count) and monetary (exact DECIMAL amount sum), each scored
    1-4 against the population's quartile cutoffs; ``rfm`` packs the
    three digits (recency inverted: most recent = 4).

    ``ref_epoch_seconds`` defaults to the corpus max timestamp —
    pass it explicitly for a stable "as of" audit point.

    Determinism contract: the amount sum runs in DECIMAL(18,4) (no
    float accumulation-order drift); cutoffs use exact interpolated
    percentile (index p*(n-1), linear) which DuckDB's quantile_cont
    replays on the identical per-key summaries; scores are strict
    ``> cutoff`` comparisons, so boundary rows land identically.

    Scale shape: ONE key-keyed aggregate collapses the corpus to a
    |keys|-row summary; the quartile pass and the scoring cross join
    run on that summary (the cutoff table is a single broadcast row).
    Exact percentile over |keys| rows is the one non-partial aggregate
    — at 10^9+ keys swap in approx_percentile and re-derive cutoffs;
    the scoring plan is unchanged.
    """
    amt = F.col(amount_col).cast("decimal(18,4)")
    per = orders.groupBy(F.col(key_col).alias("key")).agg(
        F.max(F.unix_timestamp(F.col(ts_col))).alias("_last"),
        F.count("*").alias("frequency"),
        F.sum(amt).alias("_m"),
    )
    if ref_epoch_seconds is None:
        ref = per.agg(F.max("_last").alias("_ref"))
    else:
        ref = per.sparkSession.range(1).select(
            F.lit(int(ref_epoch_seconds)).cast("bigint").alias("_ref")
        )
    per = per.crossJoin(F.broadcast(ref)).select(
        "key",
        F.floor((F.col("_ref") - F.col("_last")) / F.lit(86400)).alias(
            "recency_days"
        ),
        "frequency",
        F.col("_m").cast("double").alias("monetary"),
    )
    cuts = per.agg(
        F.percentile(F.col("recency_days").cast("double"), F.lit([0.25, 0.5, 0.75])).alias("_rc"),
        F.percentile(F.col("frequency").cast("double"), F.lit([0.25, 0.5, 0.75])).alias("_fc"),
        F.percentile(F.col("monetary"), F.lit([0.25, 0.5, 0.75])).alias("_mc"),
    )

    def _score(v, c):
        one = F.lit(1)
        return (
            one
            + (v > F.element_at(c, 1)).cast("int")
            + (v > F.element_at(c, 2)).cast("int")
            + (v > F.element_at(c, 3)).cast("int")
        )

    scored = per.crossJoin(F.broadcast(cuts))
    r_s = F.lit(5) - _score(F.col("recency_days").cast("double"), F.col("_rc"))
    f_s = _score(F.col("frequency").cast("double"), F.col("_fc"))
    m_s = _score(F.col("monetary"), F.col("_mc"))
    return scored.select(
        "key",
        "recency_days",
        "frequency",
        F.round("monetary", 2).alias("monetary"),
        r_s.alias("r_score"),
        f_s.alias("f_score"),
        m_s.alias("m_score"),
        (r_s * 100 + f_s * 10 + m_s).alias("rfm"),
    )


def linear_attribution(
    touches: DataFrame,
    conversions: DataFrame,
    key_col: str,
    channel_col: str,
    window_s: int,
    touch_ts: str = "ts",
    conv_ts: str = "ts",
    conv_id_col: str = "conv_id",
    value_col: str | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Linear multi-touch attribution: every touch (click/view/...)
    of the same key within ``window_s`` seconds BEFORE a conversion
    (inclusive of the conversion instant) shares the conversion's
    credit equally; conversions with no in-window touch are attributed
    to the synthetic ``(direct)`` channel.  Credit = conversion value
    (or 1.0 when ``value_col`` is None) / touch count.

    -> (channel, n_touches, n_conversions, attributed) with
    ``sum(attributed)`` == total conversion value by construction.

    Scale shape: the touch<->conversion pairing reuses
    ``interval_join`` (time-bucketed equi-join — never a
    BroadcastNestedLoopJoin); the per-conversion touch count is a
    partial-agg on the conversion id over the bounded
    touches-in-window fan-out; the channel rollup is a bounded-key
    aggregate.  The (direct) branch is one anti-join of conversions
    against the matched set.
    """
    from graph_importer_spark.operators.joins import interval_join

    val = (
        F.col(value_col).cast("double") if value_col else F.lit(1.0)
    )
    conv = conversions.select(
        F.col(key_col).alias("_k"),
        F.col(conv_ts).alias("ts"),
        F.col(conv_id_col).alias("_cid"),
        val.alias("_val"),
    )
    tch = touches.select(
        F.col(key_col).alias("_k"),
        F.col(touch_ts).alias("ts"),
        F.col(channel_col).alias("channel"),
    )
    pairs = interval_join(
        conv, tch, on="_k", lower_s=-window_s, upper_s=0
    ).select("_cid", "_val", F.col("r_channel").alias("channel"))
    counts = pairs.groupBy("_cid").agg(F.count("*").alias("_n"))
    # credit is rounded to 9dp DECIMAL before summing: the channel
    # rollup then accumulates exactly (no float order drift), so the
    # oracle replays the sum bit-for-bit
    credited = pairs.join(counts, "_cid").select(
        "_cid",
        "channel",
        F.round(F.col("_val") / F.col("_n"), 9)
        .cast("decimal(28,9)")
        .alias("_credit"),
    )
    attributed = credited.groupBy("channel").agg(
        F.count("*").alias("n_touches"),
        F.countDistinct("_cid").alias("n_conversions"),
        F.round(F.sum("_credit").cast("double"), decimals).alias("attributed"),
    )
    direct = (
        conv.join(counts, conv["_cid"] == counts["_cid"], "left_anti")
        .groupBy()
        .agg(
            F.lit(0).cast("bigint").alias("n_touches"),
            F.count("*").alias("n_conversions"),
            F.round(
                F.sum(
                    F.round(F.col("_val"), 9).cast("decimal(28,9)")
                ).cast("double"),
                decimals,
            ).alias("attributed"),
        )
        .select(F.lit("(direct)").alias("channel"), "n_touches",
                "n_conversions", "attributed")
        .filter(F.col("n_conversions") > 0)
    )
    return attributed.unionByName(direct)


def cohort_ltv(
    orders: DataFrame,
    key_col: str,
    ts_col: str,
    amount_col: str,
    period_seconds: int = 30 * 86400,
    decimals: int = 6,
) -> DataFrame:
    """Cohort lifetime-value curves: keys cohort by first-purchase
    period (cohort_retention's rule); each (cohort, offset) cell sums
    that period's spend (exact DECIMAL) and carries the running
    cumulative; ``ltv`` divides by cohort size — the
    revenue-per-acquired-customer curve growth teams read.

    -> (cohort, offset, n_buyers, period_spend, cum_spend,
       cohort_size, ltv).

    Scale shape: ONE (key, period) aggregate collapses the order
    stream (DECIMAL partials map-side); cohort assignment and the
    matrix rollup run on that summary; the single window (cumulative
    over offset) orders <= |periods| rows per cohort — metadata-scale
    by construction, the documented window exception.
    """
    p = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(period_seconds))
    amt = F.col(amount_col).cast("decimal(18,4)")
    per = (
        orders.select(
            F.col(key_col).alias("_k"), p.alias("_p"), amt.alias("_a")
        )
        .groupBy("_k", "_p")
        .agg(F.sum("_a").alias("_spend"))
    )
    first = per.groupBy("_k").agg(F.min("_p").alias("cohort"))
    cells = (
        per.join(first, "_k")
        .select(
            "cohort",
            (F.col("_p") - F.col("cohort")).alias("offset"),
            "_spend",
        )
        .groupBy("cohort", "offset")
        .agg(
            F.count("*").alias("n_buyers"),
            F.sum("_spend").alias("_ps"),
        )
    )
    sizes = cells.filter(F.col("offset") == 0).select(
        "cohort", F.col("n_buyers").alias("cohort_size")
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("_ps").over(w)
    return (
        cells.join(F.broadcast(sizes), "cohort")
        .select(
            "cohort",
            "offset",
            "n_buyers",
            F.round(F.col("_ps").cast("double"), 2).alias("period_spend"),
            F.round(cum.cast("double"), 2).alias("cum_spend"),
            "cohort_size",
            F.round(
                cum.cast("double") / F.col("cohort_size"), decimals
            ).alias("ltv"),
        )
    )


def churn_labels(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    cutoff_epoch: int,
    horizon_seconds: int,
    value_col: str | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Leakage-safe churn training-table builder: features summarize
    each key's activity STRICTLY BEFORE the cutoff instant; the label
    is whether the key had NO event in [cutoff, cutoff + horizon) —
    the point-in-time discipline that keeps the label's future out of
    the features (the asof_join/feature-store correctness rule, batch
    form).

    -> (key, n_events, n_active_days, days_since_last, total_value,
       churned); keys with no pre-cutoff activity are excluded (no
    features to learn from).

    Scale shape: one key-keyed aggregate per side of the cutoff (both
    filters push to the scan) + one left join; label NULL never
    occurs — absence of post-cutoff rows IS the positive label.
    """
    t = F.unix_timestamp(F.col(ts_col))
    val = (
        F.round(F.col(value_col), 9).cast("decimal(28,9)")
        if value_col
        else F.lit(1).cast("decimal(28,9)")
    )
    pre = (
        events.filter(t < cutoff_epoch)
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct(F.floor(t / 86400)).alias("n_active_days"),
            F.max(t).alias("_last"),
            F.sum(val).alias("_tv"),
        )
    )
    post = (
        events.filter(
            (t >= cutoff_epoch) & (t < cutoff_epoch + horizon_seconds)
        )
        .select(F.col(key_col).alias("key"))
        .distinct()
        .withColumn("_active", F.lit(1))
    )
    return pre.join(post, "key", "left").select(
        "key",
        "n_events",
        "n_active_days",
        F.floor((F.lit(cutoff_epoch) - F.col("_last")) / 86400).alias(
            "days_since_last"
        ),
        F.round(F.col("_tv").cast("double"), decimals).alias("total_value"),
        F.col("_active").isNull().alias("churned"),
    )


def active_user_counts(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    wau_days: int = 7,
    mau_days: int = 28,
) -> DataFrame:
    """DAU / WAU / MAU per calendar day (epoch-day buckets): daily,
    trailing-``wau_days`` and trailing-``mau_days`` DISTINCT active
    keys — the product-analytics headline counts.  Exact form:
    distinct users cannot be summed across days, so the trailing
    counts re-join the (user, day) activity table against the day
    grid.

    -> (day, dau, wau, mau), day = epoch day number, one row per day
    in [min, max] activity span.

    Scale shape: the corpus collapses to ONE (key, day) distinct
    aggregate; the trailing counts fan that table out x window_days
    (28x here — bounded, stated) into a day-keyed count-distinct.
    At 10^9-user scale swap the exact re-join for per-day HLL
    sketches merged across the window (sketches.hll_build registers
    are union-mergeable) — same grid, approximate counts.
    """
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400))
    ud = (
        events.select(F.col(key_col).alias("_k"), day.alias("_d"))
        .distinct()
    )
    span = ud.agg(
        F.min("_d").alias("_lo"), F.max("_d").alias("_hi")
    )
    grid = span.select(
        F.explode(F.sequence("_lo", "_hi")).alias("day")
    )
    fan = ud.select(
        "_k",
        F.explode(
            F.sequence(F.col("_d"), F.col("_d") + F.lit(mau_days - 1))
        ).alias("day"),
        F.col("_d").alias("_active_day"),
    )
    per = fan.join(grid, "day", "left_semi").groupBy("day").agg(
        F.countDistinct(
            F.when(F.col("_active_day") == F.col("day"), F.col("_k"))
        ).alias("dau"),
        F.countDistinct(
            F.when(
                F.col("_active_day") > F.col("day") - wau_days, F.col("_k")
            )
        ).alias("wau"),
        F.countDistinct("_k").alias("mau"),
    )
    return per


def ab_test_summary(
    df: DataFrame,
    arm_col: str,
    converted_col: str,
    value_col: str | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Two-proportion A/B test readout: per arm the conversion rate
    (and optional DECIMAL-exact value sum), plus the pooled two-
    proportion z-statistic on the ('A', 'B') pair — the
    experimentation-platform summary row.  |z| > 1.96 is the usual
    5% call; the z value is reported, the decision left to the
    caller.

    Exactly two arms named 'A' and 'B' are required (guard-railed).

    -> one row (n_a, conv_a, rate_a, n_b, conv_b, rate_b, lift, z);
    with ``value_col`` set, val_a / val_b (the per-arm DECIMAL value
    sums) follow conv_a / conv_b.  z NULL when the pooled variance
    is 0.

    Scale shape: ONE arm-keyed aggregate (2 groups, map-side
    partials); the z arithmetic runs on the 2-row summary.
    """
    per = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count("*").alias("n"),
        F.sum(F.col(converted_col).cast("bigint")).alias("conv"),
        *(
            [
                F.sum(
                    F.round(F.col(value_col), 9).cast("decimal(28,9)")
                ).alias("val")
            ]
            if value_col
            else []
        ),
    )
    vcols_a = [F.col("val").alias("val_a")] if value_col else []
    vcols_b = [F.col("val").alias("val_b")] if value_col else []
    a = per.filter(F.col("arm") == "A").select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a"), *vcols_a
    )
    b = per.filter(F.col("arm") == "B").select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b"), *vcols_b
    )
    j = a.crossJoin(b)
    ra = F.col("conv_a") / F.col("n_a")
    rb = F.col("conv_b") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(
        pp * (1 - pp) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return j.select(
        "n_a",
        "conv_a",
        *(["val_a"] if value_col else []),
        F.round(ra, decimals).alias("rate_a"),
        "n_b",
        "conv_b",
        *(["val_b"] if value_col else []),
        F.round(rb, decimals).alias("rate_b"),
        F.round(rb - ra, decimals).alias("lift"),
        F.when(se > 0, F.round((rb - ra) / se, decimals)).alias("z"),
    )


def diff_in_diff(
    df: DataFrame,
    group_col: str,
    period_col: str,
    outcome_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Difference-in-differences estimate over a 2x2 design:
    ``group_col`` in {treat, control}, ``period_col`` in {pre, post},
    outcome a 0/1 (or numeric) column.  DiD = (treat_post - treat_pre)
    - (control_post - control_pre) — the parallel-trends causal
    readout for rollouts without randomization.

    -> one row (n_cells..., rate per cell, did); all four cells must
    be non-empty (guard-railed by NULL rates otherwise).

    Scale shape: ONE (group, period) aggregate (4 groups); the DiD
    arithmetic runs on the 4-row summary.
    """
    per = df.groupBy(
        F.col(group_col).alias("grp"), F.col(period_col).alias("per")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col(outcome_col).cast("double"), 9).cast(
            "decimal(28,9)"
        )).alias("s"),
    )

    def cell(g, p, what):
        src = per.filter((F.col("grp") == g) & (F.col("per") == p))
        return src.select(
            F.col("n").alias(f"n_{g}_{p}"),
            F.round(
                F.col("s").cast("double") / F.col("n"), decimals
            ).alias(f"rate_{g}_{p}"),
        )

    j = (
        cell("treat", "pre", "tp")
        .crossJoin(cell("treat", "post", "tq"))
        .crossJoin(cell("control", "pre", "cp"))
        .crossJoin(cell("control", "post", "cq"))
    )
    did = (
        (F.col("rate_treat_post") - F.col("rate_treat_pre"))
        - (F.col("rate_control_post") - F.col("rate_control_pre"))
    )
    return j.select(
        "n_treat_pre",
        "rate_treat_pre",
        "n_treat_post",
        "rate_treat_post",
        "n_control_pre",
        "rate_control_pre",
        "n_control_post",
        "rate_control_post",
        F.round(did, decimals).alias("did"),
    )


def seasonality_profile(
    events: DataFrame,
    ts_col: str = "ts",
    decimals: int = 6,
) -> DataFrame:
    """Weekly seasonality profile of event volume: per (day-of-week,
    hour) cell, the event count, the share of total traffic, and the
    lift over a flat profile (share * 168) — the baseline table
    anomaly monitors and capacity planners divide by.  DOW follows
    the epoch-day convention (day 0 = Thursday 1970-01-01) so the
    bucketing is a pure integer function of the timestamp — no
    locale/calendar dependence to diverge between engines.

    -> (dow, hour, n, share, lift).

    Scale shape: ONE (dow, hour) aggregate — 168 groups, map-side
    partials — plus a 1-row total broadcast.
    """
    t = F.unix_timestamp(F.col(ts_col))
    per = events.groupBy(
        (F.floor(t / 86400) % 7).alias("dow"),
        (F.floor(t / 3600) % 24).alias("hour"),
    ).agg(F.count("*").alias("n"))
    tot = per.groupBy().agg(F.sum("n").alias("_t"))
    return per.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hour",
        "n",
        F.round(F.col("n") / F.col("_t"), decimals).alias("share"),
        F.round(F.col("n") * 168.0 / F.col("_t"), decimals).alias("lift"),
    )


def time_to_convert(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    start_type: str = "signup",
    convert_type: str = "purchase",
    decimals: int = 6,
) -> DataFrame:
    """Time-to-convert distribution: per key, seconds from the FIRST
    ``start_type`` event to the first ``convert_type`` event AT OR
    AFTER it; the summary row reports conversion share and exact
    interpolated quartiles of the delay — the funnel-latency readout
    next to events_funnel's step counts.

    -> one row (n_started, n_converted, conv_rate, p25_s, p50_s,
    p75_s); quartiles NULL when nobody converts.

    Scale shape: both firsts come from ONE key-keyed aggregate
    (conditional mins); the quartiles run over the |converted
    keys|-row summary (exact percentile — swap approx_percentile in
    at 10^9 keys, same plan otherwise).
    """
    t = F.unix_timestamp(F.col(ts_col))
    per = events.groupBy(F.col(key_col).alias("k")).agg(
        F.min(F.when(F.col(type_col) == start_type, t)).alias("_s")
    )
    conv = events.select(
        F.col(key_col).alias("k"),
        F.when(F.col(type_col) == convert_type, t).alias("_c"),
    ).filter(F.col("_c").isNotNull())
    j = (
        per.filter(F.col("_s").isNotNull())
        .join(conv, "k", "left")
        .groupBy("k", "_s")
        .agg(F.min(F.when(F.col("_c") >= F.col("_s"), F.col("_c"))).alias("_c1"))
    )
    delays = j.select(
        "k", (F.col("_c1") - F.col("_s")).alias("delay")
    )
    agg = delays.agg(
        F.count("*").alias("n_started"),
        F.sum(F.col("delay").isNotNull().cast("bigint")).alias("n_converted"),
        F.percentile(
            F.col("delay").cast("double"), F.lit([0.25, 0.5, 0.75])
        ).alias("_q"),
    )
    return agg.select(
        "n_started",
        "n_converted",
        F.round(F.col("n_converted") / F.col("n_started"), decimals).alias(
            "conv_rate"
        ),
        F.round(F.element_at("_q", 1), decimals).alias("p25_s"),
        F.round(F.element_at("_q", 2), decimals).alias("p50_s"),
        F.round(F.element_at("_q", 3), decimals).alias("p75_s"),
    )


def robust_group_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z_threshold: float = 3.5,
    decimals: int = 6,
) -> DataFrame:
    """Median / MAD robust statistics per group plus the count of
    modified-z outliers (Iglewicz-Hoaglin: 0.6745 * |x - med| / MAD >
    threshold) — the outlier audit that survives the outliers it
    hunts (mean/stddev do not).

    -> (group, n, median, mad, n_outliers); MAD 0 (constant group)
    reports n_outliers = count of values != median... which is 0 by
    construction, so NULL-safety never fabricates flags.

    Scale shape: exact interpolated percentile per group — two
    passes (median, then MAD over |x - med|), each a group-keyed
    aggregate; groups are category-grained (bounded).  At truly
    hot groups swap approx_percentile; the outlier count is a third
    conditional aggregate on the same key.
    """
    v = F.col(value_col).cast("double")
    med = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count("*").alias("n"),
        F.percentile(v, F.lit(0.5)).alias("median"),
    )
    j = df.select(F.col(group_col).alias("g"), v.alias("_v")).join(
        F.broadcast(med), "g"
    )
    mad = j.groupBy("g", "n", "median").agg(
        F.percentile(F.abs(F.col("_v") - F.col("median")), F.lit(0.5)).alias(
            "mad"
        )
    )
    j2 = df.select(F.col(group_col).alias("g"), v.alias("_v")).join(
        F.broadcast(mad), "g"
    )
    out = j2.groupBy("g", "n", "median", "mad").agg(
        F.sum(
            F.when(
                (F.col("mad") > 0)
                & (
                    F.lit(0.6745)
                    * F.abs(F.col("_v") - F.col("median"))
                    / F.col("mad")
                    > z_threshold
                ),
                1,
            )
            .otherwise(0)
            .cast("bigint")
        ).alias("n_outliers")
    )
    return out.select(
        F.col("g").alias("grp"),
        "n",
        F.round("median", decimals).alias("median"),
        F.round("mad", decimals).alias("mad"),
        "n_outliers",
    )


def kaplan_meier(
    durations: DataFrame,
    duration_col: str = "duration",
    observed_col: str = "observed",
    decimals: int = 6,
) -> DataFrame:
    """Discrete Kaplan-Meier survival estimator over (duration,
    observed) rows — observed=true means the event (churn, failure)
    happened at ``duration``; false means censored there (still
    alive when observation ended).  S(t) = Π_{t_i <= t}
    (1 - d_i / n_i) over event times, the standard retention /
    reliability curve with censoring handled correctly (naive
    retention curves silently treat censored users as churned).

    Determinism: each factor rounds to 9dp and the product runs as
    exp(sum(ln(...))) over the time-ordered summary — both engines
    fold the identical rounded values in the identical order;
    survival rounds to ``decimals``.

    -> (t, n_risk, n_events, n_censored, survival), one row per
    distinct duration with at least one event or censor.

    Scale shape: the corpus collapses to ONE duration-keyed
    aggregate; the at-risk counts and the cumulative product are
    windows over the DISTINCT-duration summary (bounded by time
    granularity, not cohort size — the eval_auc argument again).
    """
    d = durations.select(
        F.col(duration_col).cast("bigint").alias("t"),
        F.col(observed_col).cast("boolean").alias("obs"),
    )
    per = d.groupBy("t").agg(
        F.sum(F.col("obs").cast("bigint")).alias("n_events"),
        F.sum((~F.col("obs")).cast("bigint")).alias("n_censored"),
    )
    tot = d.groupBy().agg(F.count("*").alias("_n"))
    w_before = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, -1
    )
    at_risk = per.crossJoin(F.broadcast(tot)).select(
        "t",
        "n_events",
        "n_censored",
        (
            F.col("_n")
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(w_before),
                F.lit(0),
            )
        ).alias("n_risk"),
    )
    factor = F.round(
        F.lit(1.0) - F.col("n_events") / F.col("n_risk"), 9
    )
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, 0
    )
    lnf = F.when(factor > 0, F.log(factor)).otherwise(F.lit(None))
    surv = F.when(
        F.min(factor).over(w_cum) <= 0, F.lit(0.0)
    ).otherwise(F.exp(F.sum(lnf).over(w_cum)))
    return at_risk.select(
        "t",
        "n_risk",
        "n_events",
        "n_censored",
        F.round(surv, decimals).alias("survival"),
    )


def cusum_changepoint(
    events: DataFrame,
    ts_col: str = "ts",
    decimals: int = 6,
) -> DataFrame:
    """CUSUM changepoint scan over the daily event-count series: with
    mean daily volume mu, S_d = Σ_{d' <= d} (n_d' - mu); the day
    maximizing |S| is the most likely level-shift point (Page's
    cumulative-sum test, count form).  The volume-drop detector for
    ingest pipelines — fires when a source silently halves.

    -> (day, n, dev, cusum, is_peak): one row per day in the span,
    ``is_peak`` marks the argmax |cusum| (ties to the earliest day).

    Determinism: mu is an exact ratio (total/days); deviations round
    to 9dp DECIMAL before the running sum, so the walk is
    order-exact.

    Scale shape: ONE day-keyed aggregate collapses the corpus; the
    grid fill, the running sum, and the argmax all run on the
    bounded day summary.
    """
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400))
    per = events.groupBy(day.alias("day")).agg(F.count("*").alias("n"))
    span = per.agg(
        F.min("day").alias("_lo"),
        F.max("day").alias("_hi"),
        F.sum("n").alias("_tot"),
    )
    grid = span.select(
        F.explode(F.sequence("_lo", "_hi")).alias("day"),
        (F.col("_tot") / (F.col("_hi") - F.col("_lo") + 1)).alias("_mu"),
    )
    j = grid.join(per, "day", "left").select(
        "day",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.round(F.coalesce("n", F.lit(0)) - F.col("_mu"), 9)
        .cast("decimal(28,9)")
        .alias("_dev"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = j.select(
        "day",
        "n",
        F.col("_dev").cast("double").alias("dev"),
        F.sum("_dev").over(w).cast("double").alias("_cusum"),
    )
    peak = cum.agg(
        F.expr("min_by(day, struct(-abs(_cusum), day))").alias("_pd")
    )
    return cum.crossJoin(F.broadcast(peak)).select(
        "day",
        "n",
        F.round("dev", decimals).alias("dev"),
        F.round("_cusum", decimals).alias("cusum"),
        (F.col("day") == F.col("_pd")).alias("is_peak"),
    )


def seasonal_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    z_threshold: float = 3.0,
    decimals: int = 6,
) -> DataFrame:
    """Seasonality-adjusted volume anomalies: each (day, hour) cell's
    observed count is compared against the expectation implied by the
    weekly (dow, hour) profile (seasonality_profile's shares scaled
    to that day's total is deliberately NOT used — it would absorb
    the anomaly; the baseline is the cell's own (dow, hour) mean over
    the span), with a Poisson-style z = (n - mu) / sqrt(mu).

    -> (day, hour, n, mu, z, is_anomaly); cells with mu = 0 and
    n = 0 are omitted (nothing to say), mu = 0 with n > 0 flags with
    NULL z (infinite surprise, reported honestly).

    Scale shape: ONE (day, hour) aggregate + one (dow, hour) rollup
    of that summary; the z math joins the two bounded tables.
    """
    t = F.unix_timestamp(F.col(ts_col))
    cell = events.groupBy(
        F.floor(t / 86400).alias("day"),
        (F.floor(t / 3600) % 24).alias("hour"),
    ).agg(F.count("*").alias("n"))
    span = cell.agg(
        F.min("day").alias("_lo"), F.max("day").alias("_hi")
    )
    grid = span.select(
        F.explode(F.sequence("_lo", "_hi")).alias("day")
    ).crossJoin(
        events.sparkSession.range(24).select(
            F.col("id").cast("bigint").alias("hour")
        )
    )
    full = grid.join(cell, ["day", "hour"], "left").select(
        "day", "hour", F.coalesce("n", F.lit(0)).alias("n")
    )
    base = full.groupBy(
        (F.col("day") % 7).alias("dow"), F.col("hour").alias("_bh")
    ).agg(
        F.count("*").alias("_days"), F.sum("n").alias("_tot")
    )
    j = full.join(
        F.broadcast(base),
        (F.col("day") % 7 == F.col("dow")) & (F.col("hour") == F.col("_bh")),
    ).select(
        "day",
        "hour",
        "n",
        (F.col("_tot") / F.col("_days")).alias("_mu"),
    )
    z = F.when(
        F.col("_mu") > 0,
        (F.col("n") - F.col("_mu")) / F.sqrt(F.col("_mu")),
    )
    return (
        j.filter((F.col("n") > 0) | (F.col("_mu") > 0))
        .select(
            "day",
            "hour",
            "n",
            F.round("_mu", decimals).alias("mu"),
            F.round(z, decimals).alias("z"),
            F.coalesce(
                F.abs(z) > F.lit(z_threshold),
                F.lit(True),  # n > 0 with mu = 0: infinite surprise
            ).alias("is_anomaly"),
        )
    )


def burstiness(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_gaps: int = 3,
    decimals: int = 6,
) -> DataFrame:
    """Per-key burstiness of inter-arrival times (Goh & Barabási
    2008): B = (sigma - mu) / (sigma + mu) over the key's gap
    sequence — -1 for a perfect clock, 0 for Poisson arrivals, -> 1
    for extreme bursts.  The traffic-shape fingerprint that separates
    humans (bursty) from schedulers and bots (periodic).

    Variance uses the sumsq identity over 9dp DECIMAL sums
    (order-exact); keys with fewer than ``min_gaps`` gaps are
    dropped (no stable estimate).

    -> (key, n_gaps, mean_gap_s, std_gap_s, burstiness).

    Scale shape: one lag window per key (single key shuffle, the
    rolling_zscore shape) + one key-keyed moment aggregate.
    """
    t = F.unix_timestamp(F.col(ts_col))
    gaps = (
        events.select(
            F.col(key_col).alias("key"),
            (t - F.lag(t).over(
                Window.partitionBy(key_col).orderBy(
                    F.col(ts_col).asc(), F.col(id_col).asc()
                )
            )).alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    d9 = lambda c: F.round(c, 9).cast("decimal(38,9)")  # noqa: E731
    agg = gaps.groupBy("key").agg(
        F.count("*").alias("n_gaps"),
        F.sum(d9(F.col("g").cast("double"))).alias("_s"),
        F.sum(d9(F.col("g").cast("double") * F.col("g"))).alias("_sq"),
    ).filter(F.col("n_gaps") >= min_gaps)
    n = F.col("n_gaps")
    s = F.col("_s").cast("double")
    sq = F.col("_sq").cast("double")
    mu = s / n
    var = F.greatest((sq - s * s / n) / n, F.lit(0.0))
    sd = F.sqrt(var)
    b = F.when(sd + mu > 0, (sd - mu) / (sd + mu))
    return agg.select(
        "key",
        "n_gaps",
        F.round(mu, decimals).alias("mean_gap_s"),
        F.round(sd, decimals).alias("std_gap_s"),
        F.round(b, decimals).alias("burstiness"),
    )


def forecast_eval_seasonal_naive(
    events: DataFrame,
    ts_col: str = "ts",
    test_days: int = 7,
    decimals: int = 6,
) -> DataFrame:
    """Backtest of the seasonal-naive hourly forecast (predict each
    (dow, hour) cell's TRAIN-period mean) over the final
    ``test_days`` of the span: per test cell, actual vs forecast,
    plus sMAPE contribution — the baseline every fancier traffic
    model must beat, with the same train/test discipline as
    churn_labels (the cutoff splits the data, the baseline never
    sees test).

    -> (day, hour, actual, forecast, abs_err, smape_contrib); sum
    smape_contrib / count for the sMAPE.

    Scale shape: one (day, hour) collapse + a (dow, hour) rollup of
    the TRAIN half; the test join is bounded-table x bounded-table.
    """
    t = F.unix_timestamp(F.col(ts_col))
    cell = events.groupBy(
        F.floor(t / 86400).alias("day"),
        (F.floor(t / 3600) % 24).alias("hour"),
    ).agg(F.count("*").alias("n"))
    span = cell.agg(F.min("day").alias("_lo"), F.max("day").alias("_hi"))
    grid = span.select(
        F.explode(F.sequence("_lo", "_hi")).alias("day"),
        F.col("_hi").alias("_hi"),
    ).crossJoin(
        events.sparkSession.range(24).select(
            F.col("id").cast("bigint").alias("hour")
        )
    )
    full = grid.join(cell, ["day", "hour"], "left").select(
        "day", "hour", "_hi", F.coalesce("n", F.lit(0)).alias("n")
    )
    cutoff = F.col("_hi") - F.lit(test_days - 1)
    train = full.filter(F.col("day") < cutoff)
    test = full.filter(F.col("day") >= cutoff)
    base = train.groupBy(
        (F.col("day") % 7).alias("dow"), F.col("hour").alias("_bh")
    ).agg((F.sum("n") / F.count("*")).alias("_fc"))
    j = test.join(
        F.broadcast(base),
        (F.col("day") % 7 == F.col("dow")) & (F.col("hour") == F.col("_bh")),
        "left",
    ).select(
        "day",
        "hour",
        F.col("n").alias("actual"),
        F.round(F.coalesce("_fc", F.lit(0.0)), decimals).alias("forecast"),
    )
    denom = F.col("actual") + F.col("forecast")
    return j.select(
        "day",
        "hour",
        "actual",
        "forecast",
        F.round(F.abs(F.col("actual") - F.col("forecast")), decimals).alias(
            "abs_err"
        ),
        F.when(
            denom > 0,
            F.round(
                2.0 * F.abs(F.col("actual") - F.col("forecast")) / denom,
                decimals,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("smape_contrib"),
    )


def daily_acf(
    events: DataFrame,
    ts_col: str = "ts",
    max_lag: int = 7,
    decimals: int = 6,
) -> DataFrame:
    """Autocorrelation function of the daily event-count series at
    lags 1..``max_lag`` (the weekly-cycle detector: a spike at lag 7
    IS the seasonality seasonality_profile assumes): classic
    sample-ACF normal form r_k = Σ(x_t - x̄)(x_{t+k} - x̄) / Σ(x_t -
    x̄)², deviations from the FULL-series mean.

    Determinism: the mean is an exact ratio; deviation products round
    to 9dp DECIMAL before summing.

    -> (lag, n_pairs, acf); NULL acf when the series is constant.

    Scale shape: ONE day-keyed collapse; each lag is a self-join of
    the bounded day summary shifted by k — max_lag bounded-table
    joins, no corpus re-scan.
    """
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400))
    per = events.groupBy(day.alias("day")).agg(F.count("*").alias("n"))
    span = per.agg(
        F.min("day").alias("_lo"), F.max("day").alias("_hi"),
        F.sum("n").alias("_tot"), F.count("*").alias("_nd0"),
    )
    grid = span.select(
        F.explode(F.sequence("_lo", "_hi")).alias("day"),
        (F.col("_tot") / (F.col("_hi") - F.col("_lo") + 1)).alias("_mu"),
    )
    full = grid.join(per, "day", "left").select(
        "day",
        "_mu",
        (F.coalesce("n", F.lit(0)) - F.col("_mu")).alias("_d"),
    )
    denom_t = full.agg(
        F.sum(
            F.round(F.col("_d") * F.col("_d"), 9).cast("decimal(38,9)")
        ).alias("_den")
    )
    out = None
    for k in range(1, max_lag + 1):
        a = full.select(F.col("day"), F.col("_d").alias("_da"))
        b = full.select(
            (F.col("day") - k).alias("day"), F.col("_d").alias("_db")
        )
        num = a.join(b, "day").agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                F.round(F.col("_da") * F.col("_db"), 9).cast(
                    "decimal(38,9)"
                )
            ).alias("_num"),
        )
        row = num.crossJoin(F.broadcast(denom_t)).select(
            F.lit(k).alias("lag"),
            "n_pairs",
            F.when(
                F.col("_den").cast("double") > 0,
                F.round(
                    F.col("_num").cast("double")
                    / F.col("_den").cast("double"),
                    decimals,
                ),
            ).alias("acf"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def stationary_distribution(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    iterations: int = 20,
    decimals: int = 6,
) -> DataFrame:
    """Stationary distribution of the first-order event-type Markov
    chain (the long-run where-do-users-end-up readout over
    transition_counts' matrix): power iteration from the uniform
    vector, ``iterations`` steps, every step a bounded
    |types|² matrix-vector product with 9dp rounding so the result
    replays exactly.

    -> (state, pi) — the probability mass after ``iterations`` steps
    (converged for ergodic chains at this length; compare two
    iteration counts to check).

    Scale shape: the corpus pays transition_counts' one lag window +
    count agg; the power iteration runs entirely on the bounded
    transition table (a driver loop of |types|²-row jobs).
    """
    tc = transition_counts(events, key_col, ts_col, id_col, type_col, 9)
    trans = tc.select(
        F.col("prev_type").alias("s"), F.col("next_type").alias("t"), "p"
    ).localCheckpoint(eager=True)
    states = (
        trans.select(F.col("s").alias("state"))
        .unionByName(trans.select(F.col("t").alias("state")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_states = states.count()
    pi = states.select(
        "state", (F.lit(1.0) / F.lit(float(n_states))).alias("pi")
    )
    for _ in range(iterations):
        pi = (
            pi.join(trans, pi["state"] == trans["s"])
            .groupBy(F.col("t").alias("state"))
            .agg(
                F.round(F.sum(F.round(F.col("pi") * F.col("p"), 9)), 9).alias(
                    "pi"
                )
            )
        )
        # states with no inbound mass drop out; renormalize drift from
        # the rounding so masses stay a distribution
        tot = pi.agg(F.sum("pi").alias("_t"))
        pi = (
            pi.crossJoin(F.broadcast(tot))
            .select(
                "state", F.round(F.col("pi") / F.col("_t"), 9).alias("pi")
            )
            .localCheckpoint(eager=True)
        )
    return states.join(pi, "state", "left").select(
        "state",
        F.round(F.coalesce("pi", F.lit(0.0)), decimals).alias("pi"),
    )


def alert_suppression(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    suppress_seconds: int = 600,
) -> DataFrame:
    """Alert-fatigue suppression audit: within each key's event
    stream, an event is SUPPRESSED when it falls within
    ``suppress_seconds`` of the previous KEPT event — the classic
    paging-dedup rule (first alert fires, the storm behind it is
    folded), whose kept set is the fixpoint of a sequential scan,
    NOT a simple lag filter (a long storm re-fires every window
    width, by design).

    -> (key, id, ts_s, kept, storm_idx): storm_idx numbers each
    key's kept alerts 0.. and ties every suppressed event to the
    kept alert that muted it.

    Scale shape: one key shuffle; the sequential keep-scan runs as a
    per-key sorted-array fold (collect bounded by the key's event
    count — alert streams are key-bounded by construction; cap
    upstream if a key can page unboundedly).
    """
    t = F.unix_timestamp(F.col(ts_col))
    per = events.groupBy(F.col(key_col).alias("key")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    t.alias("t"), F.col(id_col).cast("long").alias("i")
                )
            )
        ).alias("_ev")
    )
    # sequential fold: carry (last_kept_t, storm_idx); emit per event
    fold = (
        "aggregate(_ev, "
        " named_struct('last', CAST(-1000000000000 AS BIGINT),"
        "              'storm', CAST(-1 AS INT),"
        "              'out', CAST(array() AS ARRAY<STRUCT<i: BIGINT,"
        "                    t: BIGINT, kept: BOOLEAN, storm: INT>>)),"
        " (acc, e) -> IF(e.t - acc.last >= {S},"
        "   named_struct('last', e.t, 'storm', acc.storm + 1,"
        "     'out', array_append(acc.out, named_struct('i', e.i,"
        "       't', e.t, 'kept', true, 'storm', acc.storm + 1))),"
        "   named_struct('last', acc.last, 'storm', acc.storm,"
        "     'out', array_append(acc.out, named_struct('i', e.i,"
        "       't', e.t, 'kept', false, 'storm', acc.storm)))),"
        " acc -> acc.out)"
    ).format(S=int(suppress_seconds))
    out = per.select("key", F.explode(F.expr(fold)).alias("_o"))
    return out.select(
        "key",
        F.col("_o.i").alias("id"),
        F.col("_o.t").alias("ts_s"),
        F.col("_o.kept").alias("kept"),
        F.col("_o.storm").alias("storm_idx"),
    )


def traffic_hhi(
    events: DataFrame,
    ts_col: str = "ts",
    decimals: int = 6,
) -> DataFrame:
    """Herfindahl-Hirschman concentration of traffic over the weekly
    (dow, hour) cells: HHI = Σ share² — 1/168 for perfectly flat
    traffic, 1.0 for a single-cell spike; the one-number peakiness
    next to seasonality_profile's full table (capacity planning reads
    HHI, autoscaling reads the profile).

    -> one row (n_cells, hhi, flat_hhi, peakiness) with peakiness =
    hhi / flat_hhi (1 = flat).

    Determinism: each cell's share² rounds to an integer count of
    BILLIONTHS (0dp rounding of a double is engine-consistent — the
    .5 boundary k.5 is exactly representable, unlike the x.xxxxxxxx5
    boundary of a fractional round, where Spark's shortest-repr
    HALF_UP and DuckDB's binary-value round diverge — the sf0.1
    strict-sweep finding of round 5); the sum and both 6dp rounds are
    then exact integer arithmetic ((v + 500) // 1000 IS half-up), and
    the only float op left is one correctly-rounded /1e6.
    """
    t = F.unix_timestamp(F.col(ts_col))
    per = events.groupBy(
        (F.floor(t / 86400) % 7).alias("dow"),
        (F.floor(t / 3600) % 24).alias("hour"),
    ).agg(F.count("*").alias("n"))
    tot = per.agg(F.sum("n").alias("_t"), F.count("*").alias("n_cells"))
    j = per.crossJoin(F.broadcast(tot))
    cell_b = F.round(
        (F.col("n") / F.col("_t")) * (F.col("n") / F.col("_t")) * 1000000000
    ).cast("bigint")
    agg = j.groupBy("n_cells").agg(F.sum(cell_b).alias("_c"))
    half_up_milli = lambda v: F.floor((v + 500) / 1000).cast(  # noqa: E731
        "bigint"
    )
    return agg.select(
        "n_cells",
        (half_up_milli(F.col("_c")) / F.lit(1000000.0)).alias("hhi"),
        F.round(F.lit(1.0) / F.col("n_cells"), decimals).alias("flat_hhi"),
        (
            half_up_milli(F.col("_c") * F.col("n_cells")) / F.lit(1000000.0)
        ).alias("peakiness"),
    )
