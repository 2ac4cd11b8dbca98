"""Symmetric int8 scalar quantization of embedding columns.

At 100 TB the embedding table dwarfs the text: float32 x 1024 dims is
4 KB/doc, and ANN probes (similarity.py) read it repeatedly.  Scalar
int8 cuts storage and scan bytes 4x with a per-vector scale — the
standard first rung of the quantization ladder (below product
quantization, which needs trained codebooks).  This implements the
quantize + reconstruction-error audit as pure codegen array
expressions: zero shuffle, zero Python, one scan.

Determinism contract (what makes the DuckDB oracle replayable):
* everything computes in float64 after an explicit cast — the parquet
  column is float32, and both engines widen the same bits;
* the rounding rule is pinned to floor(x + 0.5) (round-half-up) rather
  than engine-default ROUND so Spark and SQL agree on .5 boundaries;
* zero vectors get scale = 0 and all-zero codes (no 0/0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _round_half_up(x: Column) -> Column:
    return F.floor(x + F.lit(0.5))


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """-> (id, n_dims, scale, codes, q_sum, mse, max_abs_err).

    ``codes[i] = floor(v[i]/scale + 0.5)`` with ``scale =
    max(|v|)/127`` — int8-range symmetric quantization.  ``q_sum`` is
    an integer checksum of the code vector (hash-stable), ``mse`` /
    ``max_abs_err`` audit the reconstruction ``codes[i] * scale``
    against the float64 original.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(v, F.abs))
    scale = (max_abs / F.lit(127.0)).alias("scale")

    def codes_of(vec: Column, s: Column) -> Column:
        return F.transform(
            vec,
            lambda x: F.when(s == 0.0, F.lit(0.0))
            .otherwise(_round_half_up(x / s))
            .cast("long"),
        )

    out = df.select(
        F.col(id_col),
        F.size(F.col(vec_col)).alias("n_dims"),
        v.alias("_v"),
        scale,
    ).select(
        id_col,
        "n_dims",
        "_v",
        "scale",
        codes_of(F.col("_v"), F.col("scale")).alias("codes"),
    )
    # NOTE: err must be projected BEFORE the final select rounds
    # "scale" — a same-select reference to col("scale") resolves to the
    # rounded lateral alias (Spark lateral column aliasing), silently
    # auditing against the truncated scale.
    out = out.withColumn(
        "_err",
        F.zip_with(
            F.col("_v"),
            F.col("codes"),
            lambda x, q: x - q.cast("double") * F.col("scale"),
        ),
    )
    err = F.col("_err")
    return out.select(
        id_col,
        "n_dims",
        F.round("scale", decimals).alias("scale"),
        "codes",
        F.aggregate(
            "codes", F.lit(0).cast("long"), lambda acc, q: acc + q
        ).alias("q_sum"),
        F.round(
            F.aggregate(
                err, F.lit(0.0), lambda acc, e: acc + e * e
            )
            / F.col("n_dims"),
            decimals + 3,
        ).alias("mse"),
        F.round(F.array_max(F.transform(err, F.abs)), decimals + 3).alias(
            "max_abs_err"
        ),
    )


_M = 1000003          # prime modulus (operators/generators.py convention)
_A = 2654435761       # Knuth multiplicative constant


def pq_codebook(
    df: DataFrame,
    dim: int,
    m_blocks: int,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Deterministic product-quantization codebook: the ``k`` corpus
    vectors with the smallest congruential id-hash (ties by id), each
    sliced into ``m_blocks`` contiguous sub-vectors -> (block, code,
    cvec) with code = 0..k-1 in hash order.

    Sampled codebooks instead of Lloyd-iterated ones — the same
    design decision as ``similarity.ivf_centroids`` (deterministic,
    SQL-replayable, one TakeOrderedAndProject instead of an iterative
    k-means job chain); at real scale swap in trained centroids
    without touching the assignment plan.  k·m_blocks rows — driver
    metadata, broadcast to the assignment join.
    """
    if dim % m_blocks != 0:
        raise ValueError(f"dim {dim} not divisible by m_blocks {m_blocks}")
    db = dim // m_blocks
    h = F.pmod(
        F.pmod(F.col(id_col), F.lit(_M)) * F.lit(_A) + F.lit(seed), F.lit(_M)
    )
    rows = (
        df.select(
            F.col(id_col),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
            h.alias("_h"),
        )
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    book = [
        (b, code, list(r["_v"][b * db : (b + 1) * db]))
        for code, r in enumerate(rows)
        for b in range(m_blocks)
    ]
    return df.sparkSession.createDataFrame(
        book, "block int, code int, cvec array<double>"
    )


def pq_codes(
    df: DataFrame,
    dim: int,
    m_blocks: int = 4,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    decimals: int = 6,
) -> DataFrame:
    """Product-quantization assignment -> (id, block, code, d2): for
    each vector and each of its ``m_blocks`` contiguous sub-vectors,
    the codebook entry with minimal squared L2 distance (distance
    rounded to ``decimals``; ties broken by code id — replayable).

    The fine-quantization half of IVF-PQ, the standard 10^9+-vector
    ANN layout: IVF (similarity.py) prunes to ~nprobe/C of the corpus,
    PQ codes cut the scan payload dim·4 bytes -> m_blocks bytes.

    Scale shape: corpus explodes m_blocks× (m is 4-16, a constant-
    fanout explode like the SimHash bits), joins the BROADCAST k·m-row
    codebook on block (never shuffles the corpus), and one
    (id, block) min_by aggregate with map-side partials picks the
    code.  No window, no corpus shuffle.
    """
    if dim % m_blocks != 0:
        raise ValueError(f"dim {dim} not divisible by m_blocks {m_blocks}")
    db = dim // m_blocks
    book = pq_codebook(df, dim, m_blocks, k, id_col, vec_col, seed)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    slices = F.array(
        *[F.slice(v, b * db + 1, db) for b in range(m_blocks)]
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(slices).alias("block", "sub")
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with(F.col("sub"), F.col("cvec"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, e: acc + e,
        ),
        decimals,
    )
    return (
        exploded.join(F.broadcast(book), "block")
        .withColumn("_d2", d2)
        .groupBy(id_col, "block")
        .agg(
            F.expr("min_by(code, struct(_d2, code))").alias("code"),
            F.min("_d2").alias("d2"),
        )
    )


def whiten(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Mean-center + L2-renormalize an embedding column (the standard
    pre-processing before cosine ANN / SemDeDup: centering removes the
    corpus-wide 'hubness' direction so cosine contrasts carry signal).

    -> (id, centered — the rounded whitened vector, norm_before,
       norm_after) where norm_after is the pre-renormalization length
    of the centered vector (a 0 here = the vector WAS the mean; its
    output is the zero vector, not NaN).

    Scale shape: the mean vector is a (dim)-keyed aggregate over a
    posexplode — dim-bounded state (<= n_dims rows globally,
    partial-agg absorbed map-side) — collected to ONE broadcast array
    row; the centering itself is zero-shuffle zip_with codegen over a
    single corpus scan.  Two scans total (mean pass + transform pass),
    the DSIR cost shape.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dims = df.select(F.posexplode(v).alias("_d", "_x"))
    mean_tbl = (
        dims.groupBy("_d")
        # rounded means flow forward (the kmeans_train discipline):
        # downstream arithmetic is a pure function of 6dp values, so
        # double-sum accumulation-order differences stay sub-rounding
        .agg(F.round(F.avg("_x"), decimals).alias("_mu"))
        .groupBy()
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_d", "_mu"))),
                lambda s: s.getField("_mu"),
            ).alias("_mean")
        )
    )
    out = df.crossJoin(F.broadcast(mean_tbl))
    centered = F.zip_with(v, F.col("_mean"), lambda a, b: a - b)
    norm = lambda a: F.sqrt(  # noqa: E731
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    nb, na = norm(v), norm(centered)
    unit = F.when(na == 0.0, F.transform(centered, lambda x: x * 0.0)).otherwise(
        F.transform(centered, lambda x: x / na)
    )
    return out.select(
        F.col(id_col),
        F.transform(unit, lambda x: F.round(x, decimals)).alias("centered"),
        F.round(nb, decimals).alias("norm_before"),
        F.round(na, decimals).alias("norm_after"),
    )


def centroid_drift(
    a: DataFrame,
    b: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Per-label centroid drift between two embedding snapshots (the
    model-refresh gate: re-embedding a corpus with a new encoder
    shifts class centroids; large drift says re-tune the ANN index
    and thresholds before serving): per label present in either
    snapshot, the cosine between the two 6dp-rounded mean vectors
    and the L2 distance.

    -> (label, n_a, n_b, cosine, l2); NULL metrics when a side is
    missing the label or has a zero mean vector.

    Scale shape: each side pays one (label, dim) partial aggregate
    (dim-bounded state) rolled to one mean vector per label; the
    comparison is a bounded-table join with array codegen.
    """

    def means(df, n_name, v_name):
        v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        dims = df.select(
            F.col(label_col).alias("label"), F.posexplode(v).alias("_d", "_x")
        )
        return (
            dims.groupBy("label", "_d")
            .agg(F.round(F.avg("_x"), 6).alias("_mu"), F.count("*").alias("_c"))
            .groupBy("label")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_d", "_mu"))),
                    lambda s: s.getField("_mu"),
                ).alias(v_name),
                F.max("_c").alias(n_name),
            )
        )

    ma = means(a, "n_a", "va")
    mb = means(b, "n_b", "vb")
    j = ma.join(mb, "label", "full")
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("va"), F.col("vb"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    na, nb = nrm(F.col("va")), nrm(F.col("vb"))
    ok = F.col("va").isNotNull() & F.col("vb").isNotNull()
    return j.select(
        "label",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
        F.when(ok & (na > 0) & (nb > 0), F.round(dot / (na * nb), decimals)).alias(
            "cosine"
        ),
        F.when(ok, F.round(l2, decimals)).alias("l2"),
    )
