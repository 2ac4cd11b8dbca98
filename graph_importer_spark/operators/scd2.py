"""Slowly-changing-dimension (type 2) history construction.

The reference importer's sinks are append/overwrite-only
(``insert_documents``, general.py:122; edge_list.py:47-58 only *skips*
existing keys) —
there is no notion of attribute history.  A warehouse ingesting mutable
entities at 100 TB needs the standard SCD2 shape: each (key, attribute)
change becomes a validity interval ``[valid_from, valid_to)`` with the
open interval marking the current row.

Spark-first design:

* ONE shuffle total: every window partitions by the same key, so
  Catalyst plans a single Exchange and the collapse + interval steps
  run inside the same sorted partition (no second sort — the
  row_number/lag/lead frames share one (key, order) sort).
* The collapse step (drop a change row when nothing tracked actually
  changed) happens BEFORE interval construction, so noisy change
  streams that mostly re-assert the same value shrink early.
* ``scd2_latest`` deliberately avoids windows entirely: current state
  per key is an algebraic ``max_by`` aggregate — map-side partials,
  no per-key sort, the right plan when only the snapshot is needed.

All of it is plain built-in expressions — whole-stage codegen, and
bit-for-bit replayable in DuckDB SQL (contract ORACLE_SCD2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Build type-2 history from a change log.

    Input: one row per observed state ``(key, attrs..., ts)``.
    Output: ``(key, attrs..., valid_from, valid_to, is_current,
    version)`` — consecutive re-assertions of the same attrs collapse
    into one interval keeping the EARLIEST ts; ``valid_to`` is the next
    change's ``valid_from`` (NULL on the open/current interval);
    ``version`` numbers intervals per key from 1.

    ``tiebreak_col`` makes same-timestamp changes deterministic (last
    one in tiebreak order wins the interval start ordering).
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)

    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(F.col(a)).over(w)
        # NULL-safe inequality: a change to/from NULL is a real change.
        changed = changed | ~F.col(a).eqNullSafe(prev)
    first = F.lag(F.col(ts_col)).over(w).isNull()

    collapsed = changes.withColumn("_chg", first | changed).filter("_chg")

    w2 = Window.partitionBy(key_col).orderBy(*order)
    return collapsed.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        F.lead(F.col(ts_col)).over(w2).isNull().alias("is_current"),
        F.row_number().over(w2).alias("version"),
    )


def scd2_latest(
    changes: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Current snapshot per key WITHOUT a window sort: ``max_by`` over
    a (ts, tiebreak) struct — one hash aggregate with map-side
    partials.  Use this (not ``scd2_history().filter(is_current)``)
    when only the latest state matters."""
    ordk = (
        F.struct(F.col(ts_col), F.col(tiebreak_col))
        if tiebreak_col is not None
        else F.struct(F.col(ts_col))
    )
    val = F.struct(*[F.col(a) for a in attr_cols], F.col(ts_col))
    picked = changes.groupBy(key_col).agg(F.max_by(val, ordk).alias("_v"))
    return picked.select(
        key_col,
        *[F.col(f"_v.{a}").alias(a) for a in attr_cols],
        F.col(f"_v.{ts_col}").alias("as_of"),
    )


def scd2_asof(
    history: DataFrame,
    key_col: str,
    ts: F.Column,
) -> DataFrame:
    """Point-in-time slice of an SCD2 table: rows whose interval covers
    ``ts``.  A pure filter — partition-prunable when the history table
    is stored partitioned/sorted on ``valid_from`` (no join, no
    shuffle)."""
    return history.filter(
        (F.col("valid_from") <= ts)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
    )


def apply_cdc(
    snapshot,
    changes,
    key: str,
    version_col: str = "version",
    op_col: str = "op",
):
    """Apply a change-data-capture log to a snapshot — the lakehouse
    MERGE (upsert + delete) as a deterministic batch operator:

    * ``changes`` rows carry ``op`` in {'I', 'U', 'D'} and a strictly
      ordered ``version``; per key, the HIGHEST version wins
      (last-writer-wins, max_by — no window);
    * a winning 'D' removes the key; 'I'/'U' replace the row;
    * keys untouched by the log pass through unchanged.

    -> the new snapshot with the snapshot's columns.

    Scale shape: one key-keyed max_by over the changes (partials
    absorb hot keys — a key rewritten millions of times per day
    collapses map-side), then ONE full-outer key join against the
    snapshot.  With both sides written bucketed by key (tables.py)
    the join exchange is elided — the nightly CDC apply becomes
    shuffle-free, which is the difference between minutes and hours
    at 10^12 rows.
    """
    from pyspark.sql import functions as F

    cols = [c for c in snapshot.columns if c != key]
    payload = [c for c in changes.columns if c not in (key, version_col)]
    latest = (
        changes.groupBy(key)
        .agg(F.max_by(F.struct(*payload), version_col).alias("_r"))
        .select(key, "_r.*")
    )
    snap = snapshot.select(key, *[F.col(c).alias(f"_s_{c}") for c in cols])
    merged = snap.join(latest, key, "full")
    keep = F.col(op_col).isNull() | (F.col(op_col) != "D")
    out = merged.filter(keep).select(
        key,
        *[
            F.when(F.col(op_col).isNotNull(), F.col(c))
            .otherwise(F.col(f"_s_{c}"))
            .alias(c)
            for c in cols
        ],
    )
    return out
