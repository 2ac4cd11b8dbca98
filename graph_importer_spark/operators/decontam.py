"""Test-set decontamination for training corpora.

A training-data pipeline must drop (or flag) documents that overlap the
evaluation sets it will later be judged on; the standard public recipe
is k-gram overlap (GPT-3, Brown et al. 2020 appendix C; Gopher, Rae et
al. 2021: 13-gram collisions with any benchmark document mark a
training document as contaminated).

Reference scope note: the reference importer (arangodb/graph-importer)
has no corpus-hygiene stage at all — this operator is part of the
"beyond the reference" training-pipeline surface, like dedup and
quality filtering.

Scale shape (100 TB corpus, benchmark sets ~MBs):
* The benchmark k-gram set is built once and is tiny relative to the
  corpus (test sets are thousands of documents, not billions) — it is
  broadcast, so the corpus side never shuffles for the probe.
* The corpus side explodes each document into its distinct k-grams
  (O(len) per doc, same explode the MinHash path already pays) and
  inner-joins the broadcast gram set FIRST — rows surviving to the
  per-doc aggregate are only the actual collisions, typically a
  vanishing fraction of the corpus.
* The per-doc hit count aggregates on doc id (uniform key, map-side
  partials); flags re-attach to the id spine with one left join.

Grams reuse :func:`dedup.shingles`' normal form (lower, collapsed
whitespace) so the DuckDB oracle replays the formula bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_importer_spark.operators.dedup import shingles


def benchmark_grams(
    bench: DataFrame, text_col: str, k: int = 13
) -> DataFrame:
    """Distinct k-gram set of a benchmark/eval table: one column
    ``shingle``. Built once per benchmark; small enough to broadcast."""
    tagged = bench.select(F.monotonically_increasing_id().alias("__bid"), text_col)
    return shingles(tagged, "__bid", text_col, k).select("shingle").distinct()


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 13,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Per-document benchmark-overlap flags: (id, n_gram_hits,
    contaminated).

    ``n_gram_hits`` counts the document's DISTINCT k-grams that appear
    anywhere in ``bench``; ``contaminated`` is true when >= 1 gram
    collides (the published Gopher/GPT-3 rule). Every input document
    gets a row (zero hits included), so a filter join drops exactly the
    flagged ids. The benchmark gram set is broadcast — see the module
    docstring for why that is the 100 TB shape.
    """
    grams = benchmark_grams(bench, bench_text_col or text_col, k)
    doc_grams = shingles(docs, id_col, text_col, k)
    hits = (
        doc_grams.join(F.broadcast(grams), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_gram_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_gram_hits", F.lit(0)).alias("n_gram_hits"),
            (F.coalesce("n_gram_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
