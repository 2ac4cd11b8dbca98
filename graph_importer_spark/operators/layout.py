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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
