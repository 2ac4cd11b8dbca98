"""Mergeable cardinality sketches, SQL-replayable.

Spark's ``approx_count_distinct`` is HLL++ with an engine-internal
binary sketch: fine at 100 TB, but unverifiable against any other
engine and irreproducible bit-for-bit.  This module provides the
Flajolet-Martin variant the analytics catalog already uses for
effective closeness (operators/analytics.effective_closeness —
reference catalog 'effectivecloseness', Kang et al. HADI): the sketch
state is ``registers`` int64 bitmasks fed by the congruential hash, so

* the aggregate is ``bit_or`` — associative/commutative/idempotent =>
  map-side partial aggregation, mergeable across partitions, days,
  or pre-aggregated segments (store the masks, union later);
* every bit of the result is a pure int64 function of the input keys —
  replayable in DuckDB SQL, partition-invariant, rerun-stable.

Accuracy is the classic FM ~1.3/sqrt(registers) (about 32% at r=16 —
the contract query pins exactness by replay, and the pytest asserts
the estimate tracks the true cardinality within that band).  No row
blow-up: the ``registers`` masks are COLUMNS, so a group shuffles one
row of r int64s regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_importer_spark.operators.generators import _A, _A2, _M, _M2

PHI = 0.77351  # Flajolet-Martin correction constant


def _mask(key_col: str, reg: int, seed: int) -> F.Column:
    # Two congruential rounds over two DIFFERENT primes, chained into a
    # ~40-bit value (h1*M2 + h2 < 2^40).  A single mod-M round is doubly
    # capped near ~10^6: the hash output spans only ~2^20 (trailing-zero
    # index <= ~19, so registers saturate around ~1.3M distinct), AND the
    # key reduction `key % M` itself collapses the key space to M
    # residues.  Reducing by two coprime primes keeps (k1, k2) injective
    # up to M*M2 ~= 10^12 keys (CRT), restoring the full 40-bit budget of
    # the `least(..., 40)` cap.  Keys are reduced with pmod semantics
    # (((k % M) + M) % M) so negative int64 keys hash like any other
    # value instead of collapsing to bit 0.  Intermediates stay < 2^52 —
    # no int64 overflow under ANSI mode — and the whole formula remains
    # replayable in DuckDB SQL (see contract._oracle_fm_distinct).
    # The affine rounds alone leave arithmetic-progression structure in
    # the low bits for consecutive keys (trailing-zero bias); the
    # xor-shift finalizer (murmur-style, integer-exact in both engines)
    # folds the high bits back down and removes it.
    k1 = f"((({key_col} % {_M}) + {_M}) % {_M})"
    k2 = f"((({key_col} % {_M2}) + {_M2}) % {_M2})"
    h1 = f"(({k1} * {_A} + {reg * 131 + seed}) % {_M})"
    h2 = f"(({k2} * {_A2} + {reg * 131 + seed + 71}) % {_M2})"
    hraw = f"({h1} * {_M2} + {h2})"
    h = (
        f"GREATEST({hraw} ^ shiftright({hraw}, 13) ^ shiftright({hraw}, 27),"
        " CAST(1 AS BIGINT))"
    )
    return F.expr(
        f"shiftleft(CAST(1 AS BIGINT),"
        f" least(bit_count((({h}) & -({h})) - 1), 40))"
    )


def fm_distinct(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    registers: int = 16,
    seed: int = 9,
) -> DataFrame:
    """Approximate COUNT(DISTINCT key) per group -> (group_cols...,
    approx_distinct: double).  One hash aggregate of ``registers``
    bit_or columns; estimate = 2^mean_r(z_r) / 0.77351 with z_r the
    lowest unset bit of register r."""
    masks = [
        F.bit_or(_mask(key_col, r, seed)).alias(f"m{r}") for r in range(registers)
    ]
    z = [
        F.expr(f"CAST(bit_count(((~m{r}) & (m{r} + 1)) - 1) AS DOUBLE)")
        for r in range(registers)
    ]
    zsum = z[0]
    for c in z[1:]:
        zsum = zsum + c
    est = F.pow(F.lit(2.0), zsum / F.lit(float(registers))) / F.lit(PHI)
    return (
        df.groupBy(*group_cols)
        .agg(*masks)
        .select(*group_cols, est.alias("approx_distinct"))
    )
