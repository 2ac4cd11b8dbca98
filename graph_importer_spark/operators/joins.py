"""Temporal joins Spark's built-in operator set lacks.

The reference has no temporal joins at all (its only joins are the
clique/k-partite range joins, clique_generator.py:19-57, and the AQL
dedup insert, edges_generator.py:60-97); a KG/event pipeline at web
scale needs the as-of join constantly (attribution: "the last click
before this error", feature backfill: "the latest profile snapshot at
training-example time").

Scale-first shape — the union-tag trick, NOT join-then-filter:

* join+filter(ts_r <= ts_l)+max_by shuffles the (left x right-per-key)
  blow-up: a hot user with 10^5 events on each side materializes 10^10
  intermediate rows before the aggregate.
* Here both sides are unioned with a side tag and shuffled ONCE on the
  key; one running `last_value(..., ignorenulls) OVER (PARTITION BY key
  ORDER BY ts, side, id ROWS UNBOUNDED PRECEDING)` carries the most
  recent right payload forward; filtering back to left rows yields the
  match.  Cost = one hash shuffle + one in-partition sort of n_l + n_r
  rows — the same cost as the sessionization window, with no
  intermediate blow-up.  (Per-key data must fit a partition's sort
  spill budget — same constraint as any keyed window; salt-by-time-
  bucket is the escape hatch for a pathological single key.)

Determinism: ties inside the right side at the same (key, ts) are
broken toward the larger id (ORDER BY puts it last, last_value wins) —
bit-replayable in the DuckDB oracle (contract.py ORACLE_ASOF uses the
same window program).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _check_names(
    left: DataFrame, right: DataFrame, prefix: str, out_names: list[str]
) -> None:
    """Fail loudly when caller schemas collide with the join's reserved
    internal columns or its output names — a silent duplicate/ambiguous
    column is much worse than an error."""
    reserved = [
        c for c in set(left.columns) | set(right.columns) if c.startswith(prefix)
    ]
    if reserved:
        raise ValueError(
            f"input columns {sorted(reserved)} collide with reserved internal "
            f"prefix '{prefix}'; rename them before the join"
        )
    clobbered = sorted(set(left.columns) & set(out_names))
    if clobbered:
        raise ValueError(
            f"left columns {clobbered} collide with the join's output columns "
            f"{out_names}; rename them or narrow right_payload"
        )


def _epoch_seconds(col: Column, dtype: str) -> Column:
    """Numeric seconds for bucketing, whatever the timestamp column's
    physical type (timestamp/date/string -> unix seconds; numerics pass
    through)."""
    if dtype in ("bigint", "int", "smallint", "tinyint", "double", "float") or dtype.startswith("decimal"):
        return col.cast("long")
    return F.unix_timestamp(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    strict: bool = False,
    tolerance: Column | None = None,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: every left row picks the right row with the
    greatest ``right_ts`` <= ``left_ts`` (``<`` when ``strict``) sharing
    the ``on`` key; left rows with no predecessor keep NULL payload.

    ``right_payload`` — right columns to carry (default: all but the
    key and the timestamp; emitted as ``r_<name>`` plus ``r_ts``).
    ``tolerance`` — optional max age: matches older than
    ``left_ts - tolerance`` are nulled out (pandas ``merge_asof``
    semantics).

    ``bucket_seconds`` — hot-key escape hatch.  The default single
    window sorts each key's full timeline inside one partition; a
    pathological key holding most of the rows serializes into one task.
    With ``bucket_seconds=w`` the window runs per (key, floor(ts/w)) —
    the hot key splits across its time buckets — and matches that cross
    a bucket boundary come from a bucket-level carry:

      1. within-bucket: the same union-tag running ``last_value`` window,
         partitioned by (key, bucket);
      2. per-(key, bucket) right summary: the bucket's last payload via
         one ``max_by`` aggregate (map-side partials — no sort);
      3. bucket-level carry: a window over the SUMMARY rows per key
         (n_buckets rows, not n_rows) propagates the latest payload of
         any strictly earlier bucket to each left bucket;
      4. one hash join of the carry back on (key, bucket), then
         ``coalesce(within, carry)``.

    A bucket-level carry row always has strictly smaller ts than every
    left row of later buckets, so inclusive/strict semantics and the
    equal-ts tie-break (larger payload wins) are decided entirely inside
    the within-bucket window — the result is bit-identical to the
    unbucketed plan (tests assert this).
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (on, right_ts)]
    out_names = ["r_ts"] + [f"r_{c}" for c in right_payload]
    _check_names(left, right, "__asof_", out_names)
    payload = F.struct(
        F.col(right_ts).alias("r_ts"), *[F.col(c).alias(f"r_{c}") for c in right_payload]
    )
    # side=0 sorts right rows before left at equal ts => inclusive (<=)
    # match; strict mode instead sorts them after (side=2), so a right
    # row at exactly left_ts is not visible to that left row.
    r = right.select(
        F.col(on).alias("__asof_k"),
        F.col(right_ts).alias("__asof_t"),
        F.lit(2 if strict else 0).alias("__asof_side"),
        payload.alias("__asof_p"),
    )
    lcols = [F.col(c) for c in left.columns]
    l = left.select(  # noqa: E741
        F.col(on).alias("__asof_k"),
        F.col(left_ts).alias("__asof_t"),
        F.lit(1).alias("__asof_side"),
        F.lit(None).cast(r.schema["__asof_p"].dataType).alias("__asof_p"),
        *lcols,
    )
    part_cols = ["__asof_k"]
    if bucket_seconds is not None:
        w_s = max(int(bucket_seconds), 1)
        r = r.withColumn(
            "__asof_b",
            F.floor(_epoch_seconds(F.col("__asof_t"), dict(right.dtypes)[right_ts]) / w_s),
        )
        l = l.withColumn(  # noqa: E741
            "__asof_b",
            F.floor(_epoch_seconds(F.col("__asof_t"), dict(left.dtypes)[left_ts]) / w_s),
        )
        part_cols = ["__asof_k", "__asof_b"]
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("__asof_t").asc(), F.col("__asof_side").asc(), F.col("__asof_p").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r, allowMissingColumns=True).withColumn(
        "__asof_m", F.last("__asof_p", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__asof_side") == 1)
    if bucket_seconds is not None:
        # (2) per-(key, bucket) last right payload — aggregate, not sort
        rsum = r.groupBy("__asof_k", "__asof_b").agg(
            F.max_by("__asof_p", F.struct("__asof_t", "__asof_p")).alias("__asof_p")
        )
        # (3) carry over SUMMARY rows: left bucket markers (side 1) see
        # only summaries of strictly earlier buckets (side 2 sorts after)
        lmark = out.select("__asof_k", "__asof_b").distinct()
        levels = lmark.select(
            "__asof_k",
            "__asof_b",
            F.lit(1).alias("__asof_side"),
            F.lit(None).cast(r.schema["__asof_p"].dataType).alias("__asof_p"),
        ).unionByName(
            rsum.select(
                "__asof_k", "__asof_b", F.lit(2).alias("__asof_side"), "__asof_p"
            )
        )
        wb = (
            Window.partitionBy("__asof_k")
            .orderBy(F.col("__asof_b").asc(), F.col("__asof_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carry = (
            levels.withColumn(
                "__asof_c", F.last("__asof_p", ignorenulls=True).over(wb)
            )
            .filter(F.col("__asof_side") == 1)
            .select("__asof_k", "__asof_b", "__asof_c")
        )
        # (4) hash join back on (key, bucket); within-bucket match wins
        out = out.drop("__asof_side").join(
            carry, ["__asof_k", "__asof_b"], "left"
        ).withColumn("__asof_m", F.coalesce("__asof_m", "__asof_c"))
    if tolerance is not None:
        fresh = F.col("__asof_m.r_ts") >= (F.col("__asof_t") - tolerance)
        out = out.withColumn("__asof_m", F.when(fresh, F.col("__asof_m")))
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col("__asof_m.r_ts").alias("r_ts"),
        *[F.col(f"__asof_m.r_{c}").alias(f"r_{c}") for c in right_payload],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    lower_s: int,
    upper_s: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Range/interval join: pairs (l, r) sharing the ``on`` key with
    ``r[right_ts]`` in ``[l[left_ts] + lower_s, l[left_ts] + upper_s]``
    (seconds, inclusive).  Returns the left row + ``r_ts`` + right
    payload columns prefixed ``r_`` (inner semantics: unmatched left
    rows absent; wrap with a left join on the caller side for counts
    with zeros).

    Scale shape — time-bucketed equi-join, NOT an inequality theta join
    (which Spark must execute as a BroadcastNestedLoopJoin):

    * bucket width w = the interval span (>= 1 s); right rows land in
      bucket floor(rt / w);
    * a left row's admissible window spans AT MOST two consecutive
      buckets (w >= span), so the left side explodes to <= 2
      (key, bucket) probes — constant fan-out, no blow-up;
    * one hash equi-join on (key, bucket), then the exact range filter.

    Cost = one shuffle of each side on (key, bucket); hot keys split by
    AQE exactly as any keyed join.  This is the standard interval-join
    decomposition (e.g. Flink's interval join uses the same keyed
    time-bucket state).
    """
    span = max(int(upper_s) - int(lower_s), 1)
    lts = F.unix_timestamp(F.col(left_ts).cast("timestamp"))
    rts = F.unix_timestamp(F.col(right_ts).cast("timestamp"))
    rpay = [c for c in right.columns if c not in (on, right_ts)]
    _check_names(left, right, "__iv_", ["r_ts_s"] + [f"r_{c}" for c in rpay])
    r = right.select(
        F.col(on).alias("__iv_k"),
        rts.alias("__iv_rt"),
        F.floor(rts / span).alias("__iv_b"),
        *[F.col(c).alias(f"r_{c}") for c in rpay],
    )
    l = left.withColumn(  # noqa: E741
        "__iv_b",
        F.explode(
            F.sequence(
                F.floor((lts + F.lit(int(lower_s))) / span),
                F.floor((lts + F.lit(int(upper_s))) / span),
            )
        ),
    ).withColumn("__iv_lt", lts)
    out = (
        l.join(r, (F.col(on) == F.col("__iv_k")) & (l["__iv_b"] == r["__iv_b"]))
        .filter(
            (F.col("__iv_rt") >= F.col("__iv_lt") + int(lower_s))
            & (F.col("__iv_rt") <= F.col("__iv_lt") + int(upper_s))
        )
    )
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col("__iv_rt").alias("r_ts_s"),
        *[F.col(f"r_{c}") for c in rpay],
    )


def range_lookup(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_bits: int = 16,
    payload: list[str] | None = None,
) -> DataFrame:
    """Broadcast range-dimension lookup: attach to each fact row the
    dim row whose half-open interval [lo, hi) contains ``value_col``
    (IP->geo, port->service, price->tier — the static-range flavor of
    dim enrichment, vs the temporal as-of above).

    Naive `facts JOIN ranges ON lo <= v AND v < hi` plans a broadcast
    NESTED LOOP (every fact probes every range).  Here both sides are
    bucketed by the value's high bits (bucket = v >> bucket_bits): each
    dim interval explodes to the buckets it overlaps, the join is a
    broadcast EQUI-join on bucket refined by the range predicate, so a
    fact probes only the handful of intervals sharing its bucket.  The
    fact side never shuffles and stays whole-stage codegen.

    Pick ``bucket_bits`` near the log2 of the typical interval width:
    each interval then lands in ~1-2 buckets (the explode fan-out is
    (hi-lo)/2^bits + 1, so the broadcast stays ~|ranges| rows).
    Intervals must not overlap (standard range-dim contract; overlaps
    produce one output row per covering interval).  ``payload`` narrows
    the dim columns carried.  Unmatched facts keep NULL payload (left
    join semantics).  All arithmetic is int64 shifts — replayable in
    SQL (contract ORACLE_RANGE_LOOKUP).
    """
    v = F.col(value_col).cast("long")
    pay = payload if payload is not None else [
        c for c in ranges.columns if c not in (lo_col, hi_col)
    ]
    _check_names(facts, ranges.select(*pay), "_rl_", pay)
    dim = ranges.select(
        F.col(lo_col).cast("long").alias("_rl_lo"),
        F.col(hi_col).cast("long").alias("_rl_hi"),
        *pay,
    ).withColumn(
        "_rl_bucket",
        F.explode(
            F.sequence(
                F.shiftright(F.col("_rl_lo"), bucket_bits),
                F.shiftright(F.col("_rl_hi") - 1, bucket_bits),
            )
        ),
    )
    out = facts.withColumn("_rl_fb", F.shiftright(v, bucket_bits)).join(
        F.broadcast(dim),
        on=[
            F.col("_rl_fb") == F.col("_rl_bucket"),
            F.col("_rl_lo") <= v,
            v < F.col("_rl_hi"),
        ],
        how="left",
    )
    return out.drop("_rl_fb", "_rl_bucket", "_rl_lo", "_rl_hi")
