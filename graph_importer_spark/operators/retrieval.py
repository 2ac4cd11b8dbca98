"""BM25 ranked keyword retrieval over a document corpus.

The reference has no search surface (its closest analogue is the AQL
filter predicates it emits for conditional inserts,
/root/reference/edge_list_importer.py:28-34); corpus-scale keyword
retrieval is part of this graft's training-data toolkit (SURVEY §2.11):
curation queries ("which documents score highest for these terms"),
seed selection for quality classifiers, and decontamination-style
audits all start from exactly this operator.

Scale shape (the part that matters at 100 TB):

* ONE corpus scan.  Document length and the per-term hits are computed
  in the same projection; non-query tokens are filtered out with an
  ``array``-level lambda BEFORE the explode, so the generator emits
  ``O(docs x |query|)`` rows, not ``O(total tokens)``.
* The query-term list is a broadcast literal baked into the filter —
  no join for the probe.
* Corpus statistics (N, avgdl) are one scalar aggregate crossed back
  in as a broadcast single row.
* Both aggregations (tf per (doc, term), df per term) are hash
  aggregates with map-side partials; the final top-k is
  ``TakeOrderedAndProject`` (orderBy + limit) — no full sort, no
  window.

Scoring is classic Robertson BM25 with the Lucene-style non-negative
idf: ``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_importer_spark.operators.textstats import normalize_text


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag of ``query_terms``.

    Terms are matched against whitespace tokens of the md5-fingerprint
    normal form (lowercase, collapsed whitespace — the same
    tokenization the dedup operators use, so "the same word" means the
    same thing across the toolkit).  Returns
    ``(id_col, n_terms, score)`` sorted by ``(score desc, id)``;
    ``score`` is rounded to 4 decimals so it is stable across
    summation orders (the per-doc sum has at most ``len(query_terms)``
    addends).

    Documents matching none of the terms are not returned (their score
    is 0 and at web scale they are almost the whole corpus).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(t.lower() for t in query_terms))

    toks = F.split(normalize_text(F.col(text_col)), " ")
    hits_arr = F.filter(toks, lambda t: t.isin(terms) & (t != F.lit("")))
    base = docs.select(
        F.col(id_col),
        F.size(F.filter(toks, lambda t: t != F.lit(""))).alias("dl"),
        hits_arr.alias("hits"),
    )

    # One scalar row: corpus size + average document length.  Broadcast
    # back over the hit rows (never over the corpus).
    stats = base.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    # tf feeds both the scoring join and the document-frequency
    # aggregate; persist it (lazily — no job runs until first use) so
    # the corpus is not scanned once per consumer.  It holds at most
    # (docs-with-hits x |query|) short rows.
    tf = (
        base.select(id_col, "dl", F.explode("hits").alias("term"))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
        .persist()
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_terms"),
            F.round(F.sum(idf * tf_norm), 4).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
