"""GPT-3-style quality-classifier filtering with Pareto-threshold
sampling.

Brown et al. 2020 (GPT-3), Appendix A: a linear classifier scores every
Common-Crawl document against a high-quality reference corpus, and a
document is KEPT iff ``score > 1 - X`` with ``X ~ Pareto(alpha)`` — the
noisy threshold keeps mostly high-scoring documents while sampling some
low-scoring tail (avoids the hard-cutoff monoculture).

Spark-native, replayable rendering:

* features   = the repo's existing quality signals (stopword ratio,
  mean word length, punctuation ratio, log-ish length), all codegen
  column expressions;
* classifier = fixed linear weights + a HARD sigmoid
  ``clamp(0.5 + z/4, 0, 1)`` — piecewise-linear, so every score is a
  short chain of IEEE-exact ops (a trained logistic head changes the
  weights, not the plan; exp() is avoided because its libm rounding is
  not bit-identical across engines);
* Pareto draw = inverse CDF from the deterministic congruential coin:
  ``X = 1/sqrt(1 - u) - 1`` is Pareto(alpha=2) exactly, using only
  sqrt/divide (IEEE correctly-rounded everywhere).  GPT-3 used
  alpha=9; alpha is a parameter here and the contract pins 2 so the
  oracle replays the draw bit-for-bit (the alpha=9 inverse CDF needs
  pow(), the one libm call with cross-engine ulp drift).

Scale shape (100 TB): one pure-projection scan — features, score, coin
and keep-decision are all narrow column expressions; the filter
predicate is partition-invariant and pushes down with the scan.  No
shuffle, no state, no model table (weights are plan constants; a
10^5-feature hashed-ngram classifier head would instead broadcast its
weight table and reuse the DSIR gram machinery).

Reference scope: no quality stage exists in the reference importer —
"beyond the reference" surface (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graph_importer_spark.operators.sampling import hash_unit
from graph_importer_spark.operators.textstats import (
    mean_word_len,
    punct_ratio,
    stopword_ratio,
    token_count,
)

#: fixed linear head: (weight, feature) — stands in for a trained
#: logistic regression; the plan is identical for any weights.
_WEIGHTS = {
    "stopword_ratio": 4.0,   # more stopwords -> more natural prose
    "mean_word_len": 0.3,    # longer words -> more lexical content
    "punct_ratio": -6.0,     # symbol soup -> boilerplate/code
    "log_tokens": 0.25,      # longer docs mildly favored
}


def classifier_score(text: Column, lang: str = "en") -> Column:
    """Hard-sigmoid linear quality score in [0, 1] (exact arithmetic,
    multiplication order pinned for the SQL replay)."""
    z = (
        F.lit(_WEIGHTS["stopword_ratio"]) * stopword_ratio(text, lang)
        + F.lit(_WEIGHTS["mean_word_len"]) * mean_word_len(text)
        + F.lit(_WEIGHTS["punct_ratio"]) * punct_ratio(text)
        + F.lit(_WEIGHTS["log_tokens"])
        * F.log(F.lit(1.0) + token_count(text).cast("double"))
        - F.lit(2.0)
    )
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.lit(0.5) + z / F.lit(4.0)))


def pareto_keep(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang: str = "en",
    seed: int = 23,
) -> DataFrame:
    """Adds ``quality_score``, ``pareto_x`` and ``kept`` (GPT-3's
    ``score > 1 - X`` rule, X ~ Pareto(2) from the deterministic coin).
    Filter on ``kept`` to materialize the sampled corpus; membership is
    partition-invariant and rerun-stable."""
    u = hash_unit(id_col, seed)
    x = F.lit(1.0) / F.sqrt(F.lit(1.0) - u) - F.lit(1.0)
    score = classifier_score(F.col(text_col), lang)
    return df.select(
        id_col,
        F.round(score, 6).alias("quality_score"),
        F.round(x, 6).alias("pareto_x"),
        (score > (F.lit(1.0) - x)).alias("kept"),
    )
