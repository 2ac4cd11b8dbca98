"""Multi-dimensional data layout: Z-order (Morton) clustering keys and
file-skipping statistics.

At the 100 TB design point the cheapest query is the one that never
reads the file: engines prune parquet row-groups/files from per-file
min/max stats, and pruning quality is a property of the WRITE-TIME
layout.  Sorting on one column gives perfect skipping on that column
and none on any other; interleaving the bits of two (quantized)
dimensions — the classic Z-order curve used by warehouse OPTIMIZE
commands — gives useful min/max locality on BOTH.

Spark-first shape:

* ``zorder_key`` is pure int64 arithmetic (shift/mask built-ins) —
  whole-stage codegen, zero shuffle to compute;
* the production write path is
  ``df.repartitionByRange(n, zorder_key(...)).write...`` — ONE range
  shuffle (sampled range bounds), the same cost as any global sort,
  after which every output file covers a compact Z-range;
* ``file_stats`` computes the per-file min/max the reader's pruner
  would see, plus row counts — the measurable artifact of layout
  quality (contract entry ``layout_zorder`` pins it against DuckDB).

Quantization uses exact integer arithmetic (``div`` on non-negative
int64) so the curve, the file assignment, and the stats replay
bit-for-bit in SQL in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from graph_importer_spark.operators.generators import _A, _M


def quantize(col: Column, lo: Column, hi: Column, bits: int = 8) -> Column:
    """Map ``col`` in [lo, hi] to an integer cell 0..2^bits-1.  The
    arithmetic is the module-header determinism rule: (col-lo)*cells is
    an exactly-representable double (inputs < 2^53), one IEEE division,
    one floor — the identical expression replays bit-for-bit in the
    DuckDB oracle (same operand order, same double rounding)."""
    cells = 1 << bits
    q = (col - lo) * F.lit(cells) / (hi - lo + F.lit(1))
    return F.floor(q).cast("long")


def zorder_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two quantized dims into a
    Morton key (y gets the odd bit positions).  2*bits shift/mask
    terms, all codegen; inputs must already be 0..2^bits-1."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out.cast("long")


def file_stats(
    df: DataFrame,
    key: Column,
    dims: dict[str, Column],
    n_files: int = 16,
    tiebreak: Column | None = None,
) -> DataFrame:
    """Assign rows to ``n_files`` equal-size files in ``key`` order and
    report what the reader's pruner would see: per-file row count and
    min/max of every dimension in ``dims``.

    Uses ``ntile`` for a deterministic, oracle-replayable assignment
    (one global sort).  The production path replaces this with
    ``repartitionByRange(n_files, key)`` + per-file parquet footer
    stats — same layout, no single-partition window; this helper is the
    measurement/verification form.
    """
    from pyspark.sql import Window

    order = [key.asc()] + ([tiebreak.asc()] if tiebreak is not None else [])
    w = Window.orderBy(*order)
    aggs = [F.count("*").alias("n_rows")]
    for name, c in dims.items():
        aggs.append(F.min(c).alias(f"{name}_min"))
        aggs.append(F.max(c).alias(f"{name}_max"))
    return (
        df.withColumn("file_id", F.ntile(n_files).over(w))
        .groupBy("file_id")
        .agg(*aggs)
    )


def skipping_ratio(
    stats: DataFrame, dim: str, lo, hi
) -> DataFrame:
    """Fraction of files a min/max pruner SKIPS for ``dim BETWEEN lo
    AND hi`` — the layout-quality score (1-row result)."""
    overlap = (F.col(f"{dim}_min") <= F.lit(hi)) & (
        F.col(f"{dim}_max") >= F.lit(lo)
    )
    return stats.agg(
        (
            F.sum((~overlap).cast("long")) / F.count("*")
        ).alias("skip_frac")
    )


def rendezvous_shard(key: Column, n_shards: int, seed: int = 42) -> Column:
    """Highest-random-weight (rendezvous) shard assignment of an int64
    key onto ``n_shards`` buckets (Thaler & Ravishankar, IEEE ToN'98):
    shard = argmax_s h(key, s).  Unlike ``key % n`` or hash-mod,
    growing the shard count from S to S+1 moves only ~1/(S+1) of the
    keys — the property that matters when a 100 TB corpus is
    re-bucketed incrementally instead of rewritten.

    Pure int64 codegen: an array of (hash, shard) structs and one
    array_max (struct comparison is lexicographic, so ties on the hash
    break toward the larger shard id deterministically).  The hash is
    the repo's congruential family (operators/sampling.hash_unit) with
    a per-shard offset, so assignment is partition-invariant and
    SQL-replayable.  Cost: O(n_shards) cheap int ops per row, no
    shuffle to COMPUTE the shard; the actual bucketing write is then
    ``df.repartition(n_shards, F.col('shard'))`` or a partitioned
    write — one shuffle the sink needs anyway.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    # Any hash AFFINE in the shard id collapses here: h_s = base + s*d
    # (mod M) is an arithmetic progression whose argmax is almost
    # always the largest shard id (observed 71% of keys on one shard).
    # So the shard is mixed in BEFORE a multiplicative round and a
    # mid-square round (r*r + r, non-linear) breaks the progression —
    # all plain int64 arithmetic, replayable in any SQL engine.
    k = F.pmod(key, F.lit(_M))

    def h(s: int):
        r = F.pmod(k + F.lit(seed + 131 * s), F.lit(_M)) * F.lit(_A)
        r = F.pmod(r, F.lit(_M))
        return F.pmod(r * r + r, F.lit(_M))

    cands = F.array(*[
        F.struct(h(s).alias("h"), F.lit(s).alias("s")) for s in range(n_shards)
    ])
    return F.array_max(cands).getField("s")


def shard_balance(df: DataFrame, shard_col: str = "shard") -> DataFrame:
    """Per-shard row counts plus each shard's share of a perfectly
    even split (skew = n / (total / n_shards)) — the one-line audit
    that a layout choice actually balanced the write.  Two tiny
    aggregates: per-shard counts (map-side partials) and a broadcast
    1-row total."""
    counts = df.groupBy(shard_col).agg(F.count("*").alias("n_rows"))
    tot = counts.agg(
        F.sum("n_rows").alias("_tot"), F.count("*").alias("_nsh")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            shard_col,
            "n_rows",
            F.round(F.col("n_rows") * F.col("_nsh") / F.col("_tot"), 6).alias("skew"),
        )
    )


def compaction_plan(
    files: DataFrame,
    id_col: str,
    size_col: str,
    target_bytes: int,
    bucket: Column | None = None,
) -> DataFrame:
    """Small-file compaction planner: assign files (in ``id_col``
    order) to contiguous compaction groups of ~``target_bytes`` each —
    the bin assignment an Iceberg/Delta OPTIMIZE job computes before
    rewriting (binpack strategy; contiguity preserves any sort-order
    clustering the table already has).

    Group of a file = floor(exclusive_prefix_sum(size) / target): a
    file starts the group its first byte falls in, so every group's
    payload is (target, target + max_file_size) — the first-fit-by-
    sorted-order bound.

    -> per-group rows (group_id, n_files, total_bytes, first_id,
    last_id) ordered by the metadata the rewrite job needs.

    Scale shape: the prefix sum is the two-phase distributed form (same
    pattern as blocking.global_rank): per-bucket subtotal -> driver
    prefix offsets (one row per bucket — metadata) -> broadcast back ->
    within-bucket window (parallel, partitioned BY BUCKET).  ``bucket``
    must be an order-preserving coarsening of ``id_col``; default
    buckets on the id's leading 2 hex/char prefix.  No single-partition
    window, no global sort.
    """
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    b = files.withColumn(
        "_bkt",
        bucket if bucket is not None else F.substring(F.col(id_col).cast("string"), 1, 2),
    )
    sub = b.groupBy("_bkt").agg(F.sum(size_col).alias("_n"))
    rows = sorted(sub.collect(), key=lambda r: r["_bkt"])
    offsets, acc = [], 0
    for r in rows:  # driver metadata: one row per bucket
        offsets.append((r["_bkt"], acc))
        acc += r["_n"]
    off = files.sparkSession.createDataFrame(offsets, ["_bkt", "_off"])
    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    assigned = (
        b.join(F.broadcast(off), "_bkt")
        .withColumn(
            "_start",
            F.sum(size_col).over(w) + F.col("_off") - F.col(size_col),
        )
        .withColumn(
            "group_id", F.floor(F.col("_start") / F.lit(target_bytes))
        )
    )
    return assigned.groupBy("group_id").agg(
        F.count("*").alias("n_files"),
        F.sum(size_col).alias("total_bytes"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
    )
