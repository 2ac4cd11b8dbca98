"""CCNet-style language-model perplexity filtering.

CCNet (Wenzek et al., LREC 2020 — public) scores every web document
with a language model trained on a clean target corpus (Wikipedia) and
keeps/weights documents by perplexity bucket: the classic model-based
quality filter (GPT-3's data work used the same shape with a linear
classifier).  This module implements the Spark-native version with the
repo's replayable primitives:

* model     = hashed unigram+bigram bag-of-buckets over the TARGET
  corpus with Laplace (+1) smoothing — the same B-row broadcastable
  model family as DSIR (operators/importance.py); CCNet's 5-gram
  Kneser-Ney is a quality refinement of the same cost shape, not a
  different distributed plan (the model stays a broadcast table; only
  its entries change);
* score(d)  = average negative log-likelihood of d's gram buckets
  under the model (lower = more target-like, as in CCNet);
* buckets   = head / middle / tail by exact score tertiles over the
  scored corpus (CCNet §4.3's head/middle/tail split).

Scale shape (100 TB corpus, GB-scale target): the target model is ONE
hash aggregate reduced to <= B rows and broadcast; the corpus pays the
standard gram explode -> (doc, bucket) partial-agg reduce -> broadcast
join -> per-doc sum.  The tertile cutoffs are two scalars from an
exact-percentile aggregate over the per-doc scores (one row per doc —
already tiny relative to the corpus; at 10^12 docs swap in
approx_percentile, documented trade).  No corpus shuffle keys hotter
than (doc, bucket), which is uniform.

Reference scope: the reference importer has no quality stage; this is
"beyond the reference" training-pipeline surface (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_importer_spark.operators.importance import hashed_grams


def lm_model(
    target: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 4096,
    seed: int = 0,
) -> DataFrame:
    """Train the hashed-gram LM: (bucket, logp) with Laplace smoothing,
    logp = ln((n_bucket + 1) / (N + B)).  <= B rows; broadcast it."""
    counts = (
        hashed_grams(target, id_col, text_col, buckets, seed)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("ntot"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.log((F.col("n") + 1) / (F.col("ntot") + F.lit(buckets))).alias("logp"),
        F.col("ntot"),
    )


def perplexity_scores(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 4096,
    seed: int = 0,
) -> DataFrame:
    """Per-document average negative log-likelihood under the target LM:
    (id, n_grams, avg_neglogp) — lower is more target-like.

    Buckets absent from the model still have Laplace mass
    ln(1 / (N + B)), so every document scores finite."""
    model = lm_model(target, id_col, text_col, buckets, seed)
    ntot = model.select("ntot").limit(1)
    doc_counts = (
        hashed_grams(corpus, id_col, text_col, buckets, seed)
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("c"))
    )
    scored = (
        doc_counts.join(F.broadcast(model.select("bucket", "logp")), "bucket", "left")
        .crossJoin(F.broadcast(ntot))
        .select(
            id_col,
            "c",
            F.coalesce(
                "logp", F.log(F.lit(1.0) / (F.col("ntot") + F.lit(buckets)))
            ).alias("logp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("c").alias("n_grams"),
        F.round(-F.sum(F.col("c") * F.col("logp")) / F.sum("c"), 6).alias(
            "avg_neglogp"
        ),
    )


def perplexity_buckets(scores: DataFrame, score_col: str = "avg_neglogp") -> DataFrame:
    """CCNet head/middle/tail split by exact score tertiles: adds
    ``ppl_bucket``.  head = lowest-perplexity third (most target-like).
    Exact percentile is fine at one-row-per-doc scale; at 10^12 docs
    use approx_percentile (documented trade)."""
    cuts = scores.agg(
        F.expr(f"percentile({score_col}, 0.3333333333333333)").alias("c1"),
        F.expr(f"percentile({score_col}, 0.6666666666666666)").alias("c2"),
    )
    return scores.crossJoin(F.broadcast(cuts)).select(
        *scores.columns,
        F.when(F.col(score_col) <= F.col("c1"), F.lit("head"))
        .when(F.col(score_col) <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )
