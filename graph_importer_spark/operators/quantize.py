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
