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

from pyspark.sql import DataFrame, Window
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


# ---------------------------------------------------------------------------
# Bloom filter: mergeable set-membership over string keys
# ---------------------------------------------------------------------------
#
# The incremental-dedup primitive the reference implements as a per-bulk
# server round-trip (edge_list.py:47-58 "unique vertices" AQL probe):
# build a bitmap of what yesterday's corpus contained, broadcast it,
# probe today's batch with zero shuffle on the probe side.  Positions
# come from k md5-derived hashes (bit-identical in Spark and DuckDB), so
# the whole filter — build AND probe — replays in SQL.  The bitmap is
# stored as m/64 int64 words built with a bit_or aggregate: associative
# + idempotent => map-side partials, mergeable across days/segments.
# No false negatives ever; false-positive rate ~ (1 - e^(-k*n/m))^k.


def _bloom_pos(key: F.Column, i: int, m_bits: int) -> F.Column:
    """Bit position i (of k) for a string key: 32 bits of md5 over the
    seed-tagged key, mod m.  Replayable: DuckDB evaluates the same md5
    hex polynomial (contract._BLOOM_POS_SQL)."""
    h = F.conv(
        F.substring(F.md5(F.encode(F.concat_ws("|", F.lit(str(i)), key), "UTF-8")), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(m_bits))


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1024, k: int = 3
) -> DataFrame:
    """Build the bitmap: ``(word_idx, bits)`` with at most m/64 rows
    (absent words = all-zero).  One explode (x k, constant) and one
    word-keyed bit_or aggregate — mergeable, partial-agg-friendly."""
    positions = F.array(
        *[_bloom_pos(F.col(key_col), i, m_bits) for i in range(k)]
    )
    return (
        df.select(F.explode(positions).alias("_pos"))
        .select(
            (F.col("_pos") / 64).cast("long").alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
            ).alias("_mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_probe(
    probes: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 1024,
    k: int = 3,
) -> DataFrame:
    """Membership probe: adds ``maybe_present`` (true iff all k bits are
    set).  The bitmap (<= m/64 rows) is broadcast; the probe side
    explodes x k, joins on word_idx, and reduces back — the probe
    corpus itself never shuffles on a data-dependent key."""
    pos = probes.select(
        F.col(key_col).alias("_key"),
        F.posexplode(
            F.array(*[_bloom_pos(F.col(key_col), i, m_bits) for i in range(k)])
        ).alias("_i", "_pos"),
    ).select(
        "_key",
        "_i",
        (F.col("_pos") / 64).cast("long").alias("word_idx"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
        ).alias("_mask"),
    )
    hit = pos.join(F.broadcast(bloom), "word_idx", "left").select(
        "_key",
        "_i",
        (
            F.coalesce(F.col("bits"), F.lit(0).cast("long")).bitwiseAND(
                F.col("_mask")
            )
            != 0
        ).alias("_hit"),
    )
    return (
        hit.groupBy(F.col("_key").alias(key_col))
        .agg((F.sum(F.col("_hit").cast("long")) == F.lit(k)).alias("maybe_present"))
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable frequency counters + heavy hitters
# ---------------------------------------------------------------------------
#
# The frequency-estimation companion to fm_distinct/bloom (Cormode &
# Muthukrishnan 2005, public).  The sketch state is a depth x width
# counter matrix stored RELATIONALLY as (d, pos, cnt) rows — at most
# depth*width rows regardless of input size — so
#
# * build is one constant-fanout explode (x depth) into a (d, pos)
#   hash aggregate: partial aggregation collapses every map task to
#   <= depth*width rows before the shuffle, the classic sketch shape
#   that survives 100 TB (the reference's progress counters are
#   driver-side tqdm tallies, graphalytics_importer.py:83-90 — here
#   the tally IS a DataFrame and merges by SUM across
#   partitions/days/segments);
# * estimate(key) = min over d of cnt[d][pos_d(key)] — overcounts only
#   (never undercounts), error <= e/width * N with prob 1 - e^-depth;
# * positions reuse the md5 polynomial of _bloom_pos, so both the
#   counters AND the estimates replay bit-for-bit in DuckDB SQL
#   (contract._oracle_sketch_cms_topk).
#
# The probe side takes a CANDIDATE key set.  At 100 TB you never probe
# every distinct key (that cardinality is why you sketched in the first
# place): candidates come from a cheap pre-filter — per-partition local
# top-m (skew.salted_topk's phase 1), yesterday's heavy hitters, or an
# explicit watch-list — and the counter matrix broadcasts to them.


def cms_build(
    df: DataFrame, key_col: str, depth: int = 3, width: int = 1024
) -> DataFrame:
    """Count-Min counters over ``key_col`` -> (d, pos, cnt).  Mergeable:
    union two builds and re-aggregate with SUM(cnt)."""
    key = F.col(key_col).cast("string")
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"), _bloom_pos(key, d, width).alias("pos")
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("r"))
        .select("r.d", "r.pos")
        .groupBy("d", "pos")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    probes: DataFrame,
    key_col: str,
    cms: DataFrame,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each probe key -> (key_col, est).
    est >= true count always; the counter matrix (<= depth*width rows)
    is broadcast so the probe side never shuffles on a data key."""
    key = F.col(key_col).cast("string")
    pos = probes.select(
        F.col(key_col).alias("_key"),
        F.posexplode(
            F.array(*[_bloom_pos(key, d, width) for d in range(depth)])
        ).alias("d", "pos"),
    )
    got = pos.join(F.broadcast(cms), ["d", "pos"], "left").select(
        "_key", F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("cnt")
    )
    return got.groupBy(F.col("_key").alias(key_col)).agg(
        F.min("cnt").alias("est")
    )


def cms_topk(
    df: DataFrame,
    key_col: str,
    candidates: DataFrame,
    k: int = 10,
    depth: int = 3,
    width: int = 1024,
) -> DataFrame:
    """Heavy hitters: estimate every candidate key and keep the top k
    by (est DESC, key ASC) — the deterministic tie-break makes the
    result partition-invariant and oracle-replayable.  ``candidates``
    carries ``key_col`` (see module note on candidate generation)."""
    est = cms_estimate(candidates, key_col, cms_build(df, key_col, depth, width),
                       depth, width)
    w = Window.orderBy(F.desc("est"), F.asc(key_col))
    return (
        est.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(key_col, "est", "rk")
    )


# ---------------------------------------------------------------------------
# Fixed-bin histogram sketch: mergeable quantiles / distributions
# ---------------------------------------------------------------------------
#
# Completes the mergeable-sketch catalog (distinct = fm_distinct,
# frequency = cms_*, membership = bloom_*): a fixed-bin equi-width
# histogram per group, stored relationally as (group..., bin, cnt).
# <= bins rows per group whatever the input size; merges by SUM across
# partitions/days/segments — the rollup-friendly alternative to
# Spark's approx_percentile, whose internal GK sketch neither merges
# across pre-aggregated segments as a column nor replays in another
# engine.  Quantile error is bounded by the bin width ((hi-lo)/bins),
# the classic histogram trade: pick the range from domain knowledge or
# one min/max scan.  Every count and every estimate is a pure
# deterministic function of the inputs — DuckDB replays the whole
# thing bit-for-bit (contract ORACLE_HIST_QUANTILES).


def hist_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """Equi-width histogram -> (group_cols..., bin, cnt).  Values are
    clamped into [lo, hi]; bin = floor((v - lo) * bins / (hi - lo)),
    capped at bins-1 (the IEEE expression the oracle replays).
    Mergeable: union + re-aggregate with SUM(cnt)."""
    v = F.col(value_col).cast("double")
    b = F.floor((v - F.lit(lo)) * F.lit(float(bins)) / F.lit(hi - lo)).cast(
        "long"
    )
    b = F.least(F.greatest(b, F.lit(0)), F.lit(bins - 1))
    return (
        df.select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count("*").alias("cnt"))
    )


def hist_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    bins: int = 64,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: for each q, the
    UPPER EDGE of the first bin whose cumulative count reaches
    q * total -> (group_cols..., q, est).  Error <= one bin width.
    One partial-agg collect of <= bins (bin, cnt) structs per group —
    no window, no second shuffle: the cumulative walk happens inside a
    per-group array expression."""
    packed = hist.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(F.struct("bin", "cnt"))).alias("bc"),
        F.sum("cnt").alias("total"),
    )
    width = (hi - lo) / bins
    out_rows = []
    for q in qs:
        # need = ceil(q * total) rows; first bin with running cnt >= need
        need = F.ceil(F.lit(q) * F.col("total"))
        # aggregate carries (remaining, chosen_bin)
        picked = F.aggregate(
            F.col("bc"),
            F.struct(
                need.cast("long").alias("rem"),
                F.lit(-1).cast("long").alias("pick"),
            ),
            lambda acc, x: F.struct(
                (acc["rem"] - x["cnt"]).alias("rem"),
                F.when(
                    (acc["pick"] == -1) & (acc["rem"] <= x["cnt"]), x["bin"]
                )
                .otherwise(acc["pick"])
                .alias("pick"),
            ),
        )["pick"]
        out_rows.append(
            F.struct(
                F.lit(q).alias("q"),
                (F.lit(lo) + (picked + 1) * F.lit(width)).alias("est"),
            )
        )
    return packed.select(
        *group_cols, F.explode(F.array(*out_rows)).alias("r")
    ).select(*group_cols, "r.q", "r.est")


# ---------------------------------------------------------------------------
# HyperLogLog: the industry-standard cardinality sketch, replayable
# ---------------------------------------------------------------------------

def _hraw_sql(key_col: str, seed: int) -> str:
    """The repo's standard replayable 40-bit hash (two congruential
    rounds over coprime primes + xor-shift finalizer — see _mask), as
    a raw value instead of an FM bitmask."""
    k1 = f"((({key_col} % {_M}) + {_M}) % {_M})"
    k2 = f"((({key_col} % {_M2}) + {_M2}) % {_M2})"
    h1 = f"(({k1} * {_A} + {seed}) % {_M})"
    h2 = f"(({k2} * {_A2} + {seed + 71}) % {_M2})"
    hraw = f"({h1} * {_M2} + {h2})"
    return (
        f"GREATEST({hraw} ^ shiftright({hraw}, 13) ^ shiftright({hraw}, 27),"
        " CAST(1 AS BIGINT))"
    )


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_build(
    df: DataFrame, group_cols: list[str], key_col: str, p: int = 6, seed: int = 9
) -> DataFrame:
    """HyperLogLog registers per group -> (group..., bucket, register).

    bucket = low p hash bits; register = MAX over keys of rho (position
    of the lowest set bit of the remaining hash, 1-based; the
    trailing-zero variant — identically distributed to Flajolet's
    leading-zero form under a uniform hash and cheaper in int64 ops).

    The aggregate is MAX: associative/commutative/idempotent =>
    map-side partials, mergeable across partitions/days/segments by
    re-MAXing — store the <= 2^p rows per group, union later.  Every
    register is a pure int64 function of the keys (the repo's
    congruential+xor-shift hash), so DuckDB replays the sketch
    bit-for-bit, unlike approx_count_distinct's opaque HLL++ binary.
    """
    m = 1 << p
    h = _hraw_sql(key_col, seed)
    maxrho = 41 - p
    w = f"shiftright({h}, {p})"
    rho = (
        f"CASE WHEN {w} = 0 THEN {maxrho} "
        f"ELSE bit_count((({w}) & -({w})) - 1) + 1 END"
    )
    return (
        df.select(
            *group_cols,
            F.expr(f"({h}) & {m - 1}").alias("bucket"),
            F.expr(rho).alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimate(
    built: DataFrame, group_cols: list[str], p: int = 6, decimals: int = 4
) -> DataFrame:
    """Registers -> (group..., approx_distinct) via the published HLL
    estimator: raw = alpha_m * m^2 / sum_j 2^-M_j (absent buckets
    contribute 2^0 = 1), with the small-range linear-counting
    correction (raw <= 2.5m and empty buckets exist ->
    m * ln(m / zeros)).  The 2^-M_j sum is EXACT in doubles (binary
    fractions), so the estimate is deterministic, not merely
    round-stable."""
    m = 1 << p
    alpha = _hll_alpha(m)
    agg = built.groupBy(*group_cols).agg(
        (
            F.sum(F.pow(F.lit(2.0), -F.col("register")))
            + (F.lit(m) - F.count("*"))
        ).alias("suminv"),
        (F.lit(m) - F.count("*")).alias("zeros"),
    )
    raw = F.lit(alpha * m * m) / F.col("suminv")
    est = F.when(
        (raw <= 2.5 * m) & (F.col("zeros") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros")),
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est, decimals).alias("approx_distinct")
    )


def theta_sketch_lite(
    df,
    key_col: str,
    value_col: str,
    k: int = 64,
    seed: int = 9,
):
    """KMV/theta distinct sketch (the k-minimum-values estimator —
    the mergeable DISTINCT sketch that also supports set EXPRESSIONS,
    unlike HLL's union-only registers): per group keep the k smallest
    congruential hashes of the values; the estimate is
    (k - 1) / theta with theta = the k-th smallest normalized hash.
    Groups with < k distinct values report exactly.

    -> (key, n_kept, theta, estimate) with estimate rounded to 2.

    Determinism: the congruential hash and the k-smallest selection
    (sort_array + slice over the collected distinct hashes) are pure
    functions of the value set.

    Scale shape: one (key, value) distinct collapse, then a
    key-keyed collect bounded by... the DISTINCT VALUE count — the
    honest caveat: the bounded-state variant keeps partial k-mins
    map-side via partial_agg on sorted slices; this reference form
    collects per-group distinct hashes and slices, correct when
    per-group distinct counts are collectable (set-expression
    support is what you buy over fm_distinct/hll for the price).
    """
    from pyspark.sql import functions as F

    # md5-derived 48-bit hash — the repo's cross-engine-replayable
    # convention (xxhash64 has no DuckDB twin)
    _M = 1 << 48
    h = F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat_ws(
                        "|", F.col(value_col).cast("string"), F.lit(str(seed))
                    ),
                    "UTF-8",
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    dv = (
        df.select(F.col(key_col).alias("key"), h.alias("_h"))
        .distinct()
    )
    per = dv.groupBy("key").agg(
        F.slice(F.sort_array(F.collect_set("_h")), 1, k).alias("_mins"),
        F.count("*").alias("_nd"),
    )
    theta = F.element_at("_mins", k) / F.lit(float(_M))
    est = F.when(
        F.col("_nd") < k, F.col("_nd").cast("double")
    ).otherwise((F.lit(float(k - 1))) / theta)
    return per.select(
        "key",
        F.least(F.col("_nd"), F.lit(k)).alias("n_kept"),
        F.when(F.col("_nd") >= k, F.round(theta, 9)).alias("theta"),
        F.round(est, 2).alias("estimate"),
    )
