"""DSIR-style data selection: hashed n-gram importance weights.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023 —
public) scores each raw document by how much more likely its hashed
n-gram features are under a small TARGET corpus than under the RAW
corpus, then resamples raw data by that weight.  The public recipe:

* features  = unigrams + bigrams, hashed into B buckets,
* model     = bag-of-buckets with Laplace (+1) smoothing,
* weight(d) = sum over d's grams of
              ln p_target(bucket) - ln p_raw(bucket).

Reference scope note: the reference importer has no selection stage —
this operator belongs to the "beyond the reference" training-pipeline
surface (dedup, decontamination, quality scoring live beside it).

Scale shape (raw = 100 TB, target = MBs..GBs):
* Both distributions are one hash aggregate over exploded grams; the
  bucket space is fixed (B ~ 10^4), so the per-corpus model is a tiny
  B-row frame — broadcast, never shuffled with the corpus.
* The corpus side is the same O(len) explode every dedup operator
  pays, then groupBy (doc, bucket) — uniform keys, map-side partials —
  one broadcast join against the log-ratio table, and one per-doc sum.
* The gram hash is the first 8 hex chars of md5 (32 bits -> pmod B),
  the repo's standard replayable hash: DuckDB reproduces it digit by
  digit, so the oracle replays every weight bit-for-bit (modulo the
  documented round-to-6dp on the final sum).

Grams reuse :func:`textstats.normalize_text`'s normal form, like every
other text operator here, so the oracle shares one tokenizer formula.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graph_importer_spark.operators.textstats import normalize_text


def gram_bucket(gram: Column, buckets: int, seed: int = 0) -> Column:
    """Deterministic 32-bit md5 bucket of a gram (replayable in SQL)."""
    h = F.conv(
        F.substring(
            F.md5(F.encode(F.concat_ws("|", F.lit(str(seed)), gram), "UTF-8")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(buckets))


def hashed_grams(
    df: DataFrame, id_col: str, text_col: str, buckets: int = 4096, seed: int = 0
) -> DataFrame:
    """(id, bucket) with one row per gram OCCURRENCE (counts matter for
    the language model, unlike dedup's distinct shingles): unigrams and
    bigrams over the normalized text."""
    from graph_importer_spark.operators.textstats import let_bind

    # bigrams via zip_with over shifted slices: one lambda with direct
    # element args (no interpreted element_at indexing per position).
    # The token array is let-bound: it is referenced three times
    # (unigram concat + both zip_with sides), and without the binding
    # each reference re-runs the normalize regexp + split per row.
    grams = let_bind(
        F.split(normalize_text(F.col(text_col)), " "),
        lambda toks: F.concat(
            toks,
            F.when(
                F.size(toks) >= 2,
                F.zip_with(
                    F.slice(toks, 1, F.size(toks) - 1),
                    F.slice(toks, 2, F.size(toks) - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(grams).alias("gram")
    ).select(id_col, gram_bucket(F.col("gram"), buckets, seed).alias("bucket"))


def _bucket_counts(grams: DataFrame) -> DataFrame:
    return grams.groupBy("bucket").agg(F.count("*").alias("n"))


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 4096,
    seed: int = 0,
) -> DataFrame:
    """Per-raw-document DSIR log importance weight:
    (id, dsir_logweight) — higher means more target-like.

    Both unigram+bigram bag-of-buckets models use Laplace smoothing
    (+1 per bucket), so empty buckets are defined and the weight is
    finite for every document.  The log-ratio table (<= ``buckets``
    rows) is broadcast; the raw corpus is touched by exactly one
    explode + two aggregates + one broadcast join.
    """
    rg = hashed_grams(raw, id_col, text_col, buckets, seed)
    tg = hashed_grams(target, id_col, text_col, buckets, seed)
    # The bucket-count models are <= `buckets` rows — eagerly checkpoint
    # them so the totals / ratio / broadcast below reuse the one model
    # scan per corpus instead of re-running the gram explode (the only
    # expensive part) once per consumer.  Corpus scans total exactly
    # two on the raw side (model + scoring) and one on the target side
    # — the published DSIR cost shape.
    rc = _bucket_counts(rg).withColumnRenamed("n", "rn").localCheckpoint(eager=True)
    tc = _bucket_counts(tg).withColumnRenamed("n", "tn").localCheckpoint(eager=True)
    # totals as 1-row frames, cross-joined (lazy, no driver collect)
    rtot = rc.agg(F.sum("rn").alias("rtot"))
    ttot = tc.agg(F.sum("tn").alias("ttot"))
    ratio = (
        rc.join(tc, "bucket", "full")
        .crossJoin(F.broadcast(rtot))
        .crossJoin(F.broadcast(ttot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("tn", F.lit(0)) + 1)
                    / (F.col("ttot") + F.lit(buckets))
                )
                - F.log(
                    (F.coalesce("rn", F.lit(0)) + 1)
                    / (F.col("rtot") + F.lit(buckets))
                )
            ).alias("log_ratio"),
        )
    )
    doc_counts = rg.groupBy(id_col, "bucket").agg(F.count("*").alias("c"))
    return (
        doc_counts.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("c") * F.col("log_ratio")), 6).alias("dsir_logweight"))
    )
