"""Multimodal columns: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a metadata struct,
per the training-data-pipeline contract.  The Spark-side plumbing —
schema, partitioning, Arrow batch shape, mapInPandas signatures — is
real and tested; the actual codec calls are STUBBED (this container
ships no image/audio libraries): ``decode_image`` raises
NotImplementedError behind an import-try, and ``fake_decode`` is the
deterministic stand-in used by tests.

Real (no stub) operators:
* byte_stats     — size/entropy-ish stats via built-ins (JVM-side)
* byte_histogram — 16-bucket byte histogram via mapInPandas (Arrow
                   batches of binary -> fixed-size array<double>): the
                   exact batch shape a real decode-and-featurize UDF has.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta_format", StringType()),
        StructField("meta_width", LongType()),
        StructField("meta_height", LongType()),
    ]
)

HIST_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("hist", ArrayType(DoubleType())),
    ]
)

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real decode path; requires an image library (not shipped here)."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL/pillow; use fake_decode in tests"
        )
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in: pretend dimensions derived from bytes."""
    if not payload:
        return (0, 0)
    return (1 + payload[0] % 64, 1 + payload[-1] % 64)


def byte_stats(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Pure built-in stats over binary columns (no Python)."""
    return media.select(
        "media_id",
        F.length(F.col(payload_col)).alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("payload_md5"),
    )


def byte_histogram(media: DataFrame, payload_col: str = "payload", bins: int = 16) -> DataFrame:
    """mapInPandas over Arrow batches: binary -> normalized histogram.

    This is the canonical decode-and-featurize shape: executor-side
    vectorized loop, fixed-size float array out, no driver involvement.
    The per-payload work is numpy (``frombuffer`` + ``bincount``), never
    a per-byte Python loop — at real media sizes (MBs/payload) that loop
    is the difference between Arrow-speed and row-at-a-time Python.
    Fractions are emitted UNROUNDED (exact IEEE division counts/n):
    callers round with F.round, whose HALF_UP matches SQL engines, while
    Python/numpy round are half-even — rounding here would bake in a
    cross-engine mismatch.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        width = 256 // bins
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                if payload is None or len(payload) == 0:
                    rows.append((mid, 0, [0.0] * bins))
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr // width, minlength=bins)
                rows.append((mid, len(arr), (hist / len(arr)).tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "hist"])

    return media.select("media_id", payload_col).mapInPandas(run, HIST_SCHEMA)


def entropy_of_hist(hist_col) -> F.Column:
    """Shannon entropy (bits) of a normalized histogram column."""
    return F.aggregate(
        hist_col,
        F.lit(0.0),
        lambda acc, p: acc
        + F.when(p > 0, -p * F.log2(p)).otherwise(F.lit(0.0)),
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table exercising the schema/partitioning."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.encode(
            F.concat(F.lit("payload-"), F.sha2(F.concat(F.col("id").cast("string"), F.lit(str(seed))), 256)),
            "UTF-8",
        ).cast("binary").alias("payload"),
        F.lit("synthetic").alias("meta_format"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(512)) + 16).alias("meta_width"),
        (F.pmod(F.xxhash64("id", F.lit(seed + 2)), F.lit(512)) + 16).alias("meta_height"),
    )
    return df
