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


def semantic_overlap(
    corpus_emb,
    bench_emb,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "vec_id",
    bench_vec_col: str = "embedding",
    threshold: float = 0.95,
    n_centroids: int | None = None,
    seed: int = 42,
):
    """Semantic (embedding-space) benchmark decontamination — the
    companion to the 13-gram exact rule above: a corpus document is
    contaminated when its embedding lies within ``threshold`` cosine
    of ANY benchmark item (the paraphrase leak the n-gram probe
    misses).

    -> (id, n_bench_hits, max_cosine, bench_id) — corpus rows with at
    least one benchmark neighbor; ``bench_id`` is the strongest match
    (ties to the smaller id).

    Scale shape: centroids come from the CORPUS (the big side, same
    deterministic quantizer as the SemDeDup path); both sides assign
    with one broadcast-centroid max_by scan each; the probe is an
    equi-join on list_id with the BENCHMARK side broadcast (benchmark
    suites are 10^3-10^5 rows — dimension-table territory), so the
    corpus never shuffles.  The cross-cluster miss is the published
    IVF approximation, stated not silent; raise n_centroids' nprobe
    analog by unioning bench assignments under the 2nd-best centroid
    if tighter recall is needed.
    """
    from graph_importer_spark.operators.similarity import (
        cosine,
        default_n_centroids,
        ivf_assign,
        ivf_centroids,
        with_norm,
    )

    c = with_norm(corpus_emb, id_col, vec_col, "neighbor_id", "cv", "cn")
    if n_centroids is None:
        c = c.persist()
        n_centroids = default_n_centroids(c.count())
    cents = ivf_centroids(c, n_centroids, seed)
    ca = ivf_assign(c, cents)
    b = with_norm(
        bench_emb, bench_id_col, bench_vec_col, "neighbor_id", "cv", "cn"
    )
    ba = ivf_assign(b, cents)
    left = ca.select(
        "list_id",
        F.col("neighbor_id").alias("id"),
        F.col("cv").alias("v1"),
        F.col("cn").alias("n1"),
    )
    right = ba.select(
        "list_id",
        F.col("neighbor_id").alias("bid"),
        F.col("cv").alias("v2"),
        F.col("cn").alias("n2"),
    )
    hits = (
        left.join(F.broadcast(right), "list_id")
        .select(
            "id",
            "bid",
            F.round(cosine("v1", "v2", "n1", "n2"), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
    return hits.groupBy("id").agg(
        F.count("*").alias("n_bench_hits"),
        F.max("cos").alias("max_cosine"),
        F.expr("max_by(bid, struct(cos, -bid))").alias("bench_id"),
    )
