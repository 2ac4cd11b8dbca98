"""Sequence packing for LLM pretraining batches.

Documents are concatenated into fixed-capacity context windows ("packs")
so training sees dense token streams instead of per-document padding
(the packing step of T5/GPT-style data loaders; Raffel et al. 2020 §3.1.2
describes the concatenate-and-split regime this approximates while
keeping document boundaries intact).

Algorithm: NEXT-FIT per shard — walk documents in deterministic id
order; if the current pack cannot take the next document, seal it and
start a new one.  Next-fit is the streaming-friendly choice (O(1) state,
one pass, order-stable) and is what replayable SQL can verify; first-fit
-decreasing packs ~10-20% denser but is order-unstable under ties and
needs random access.

Scale shape (100 TB): packing is inherently sequential WITHIN a pack
stream, so the parallel unit is a hash shard — documents are
hash-assigned to ``shards`` independent streams and each stream packs
alone inside one ``applyInPandas`` group.  With shards >> executors the
work distributes like any other keyed aggregate; state per group is two
scalars.  This is the one operator family in the repo where per-group
sequential logic is genuinely required (the running-capacity recurrence
has no closed form), i.e. the documented applyInPandas escape hatch of
SURVEY §2.8 — the per-group loop is a numpy pass over Arrow batches,
not per-row Python in a hot path.

The pack id is globally unique and deterministic: shard * 2^40 + seq.
Documents longer than ``capacity`` get a pack of their own (real loaders
then split them across windows; the boundary bookkeeping here is the
same either way).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("pack_id", T.LongType()),
        T.StructField("offset", T.LongType()),
    ]
)


def _pack_group(pdf: pd.DataFrame, capacity: int) -> pd.DataFrame:
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    shard = int(pdf["shard"].iloc[0]) if len(pdf) else 0
    toks = pdf["n_tokens"].to_numpy()
    packs = []
    offsets = []
    seq = 0
    used = 0
    for t in toks:
        t = int(min(t, capacity))
        if used + t > capacity and used > 0:
            seq += 1
            used = 0
        packs.append(shard * (1 << 40) + seq)
        offsets.append(used)
        used += t
    pdf["pack_id"] = pd.Series(packs, dtype="int64")
    pdf["offset"] = pd.Series(offsets, dtype="int64")
    return pdf[["doc_id", "shard", "n_tokens", "pack_id", "offset"]]


def pack_next_fit(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    capacity: int = 256,
    shards: int = 16,
) -> DataFrame:
    """Assign each document to a training pack: returns
    ``(doc_id, shard, n_tokens, pack_id, offset)``.

    ``shard = id % shards`` (id-derived so the DuckDB oracle can replay
    the assignment; a production run would use ``pmod(xxhash64(id))`` —
    same shape, different coin).  Within a shard documents are packed in
    id order by next-fit; ``offset`` is the document's token start
    within its pack (oversize docs are counted at ``capacity``).
    """
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.pmod(F.col(id_col).cast("long"), F.lit(shards)).alias("shard"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    return base.groupBy("shard").applyInPandas(
        lambda pdf: _pack_group(pdf, capacity), schema=_PACK_SCHEMA
    )


def chunk_text(
    df,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 256,
    overlap: int = 32,
):
    """Overlapping fixed-size window chunking: split each document into
    ``chunk_tokens``-token chunks advancing by ``chunk_tokens -
    overlap`` — the sliding-window regime of RAG indexing and of
    pretraining loaders that split over-long documents across context
    windows (the complement of ``pack_next_fit``, which PACKS short
    docs; this SPLITS long ones).

    Tokens are whitespace tokens of the raw text (chunking must
    round-trip the original surface, so no normalization here).
    Returns ``(id_col, chunk_id, n_tokens, chunk)`` with ``chunk_id``
    0-based; a document shorter than ``chunk_tokens`` yields exactly
    one chunk.  The final chunk is the tail remainder (≥1 token,
    possibly shorter than ``chunk_tokens``); stride arithmetic
    guarantees every token appears in at least one chunk and
    consecutive chunks share exactly ``overlap`` tokens.

    Scale shape: pure per-row array expressions (split / sequence /
    slice / array_join) — zero shuffle, whole-stage codegen, fan-out
    ~len/stride per document.  The token array is let-bound through a
    lateral-style explode of precomputed slices so the plan does not
    re-split the text once per chunk (the CollapseProject O(len²) trap
    the winnowing operator documents).
    """
    if chunk_tokens <= 0 or overlap < 0 or overlap >= chunk_tokens:
        raise ValueError("need chunk_tokens > 0 and 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    # let-bind the token array once per row (explode of a 1-element
    # wrapper defeats CollapseProject's expression duplication)
    bound = df.select(
        F.col(id_col), F.explode(F.array(toks)).alias("_toks")
    )
    n = F.size(F.col("_toks"))
    # number of chunks: 1 + ceil(max(0, n - chunk_tokens) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.slice(
                F.col("_toks"), i * F.lit(stride) + F.lit(1), F.lit(chunk_tokens)
            ).alias("toks"),
        ),
    )
    out = bound.select(
        id_col, F.explode(chunks).alias("c")
    ).select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.size("c.toks").alias("n_tokens"),
        F.array_join("c.toks", " ").alias("chunk"),
    )
    return out.filter(F.col("n_tokens") > 0)


def contrastive_pairs(
    df,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 0,
):
    """Adjacent-chunk positive pairs for contrastive embedding
    training: chunk each document with :func:`chunk_text`, then pair
    every chunk with its successor inside the same document ->
    ``(id_col, chunk_id, anchor, positive)``.  Neighboring spans of
    one document are the canonical weak-supervision positive
    (inverse-cloze / cropping objectives of dense-retriever and
    sentence-embedding pretraining); in-batch negatives come free at
    training time, so the pipeline only has to emit the positives.

    Scale shape: the chunker is zero-shuffle codegen; the successor
    pairing is ONE self-equi-join on (id, chunk_id+1) — doc-keyed, so
    chunk counts per key are bounded by document length, and the join
    is AQE-splittable if a pathological document slips through.
    """
    chunks = chunk_text(
        df, id_col, text_col, chunk_tokens=chunk_tokens, overlap=overlap
    )
    left = chunks.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.col("chunk").alias("anchor"),
    )
    right = chunks.select(
        F.col(id_col),
        (F.col("chunk_id") - 1).alias("chunk_id"),
        F.col("chunk").alias("positive"),
    )
    return left.join(right, [id_col, "chunk_id"], "inner")


def fim_split(
    df,
    id_col: str,
    text_col: str,
    seed: int = 42,
):
    """Fill-in-the-middle training transform (Bavarian et al. 2022):
    split each document's token sequence at two deterministic points
    into (prefix, middle, suffix) so the loader can emit the
    PSM/SPM-reordered sequence.  The split points are pure functions
    of the document id (two :func:`~graph_importer_spark.operators.
    sampling.hash_unit` coins), not Spark randomness: the corpus
    transform is partition-invariant, resumable, and SQL-replayable.

    With n tokens: a = floor(u1 * (n+1)) in [0, n], b = a +
    floor(u2 * (n-a+1)) in [a, n]; prefix = tokens[:a], middle =
    tokens[a:b], suffix = tokens[b:].  Returns
    (id, n_tokens, prefix, middle, suffix) as space-joined strings
    (empty string for an empty segment).

    The two coins fold the seed into the HASH KEY (id + seed), not the
    congruential offset — an offset-only seed shifts every coin by
    seed/M, so nearby seeds would give identical cuts; and the second
    coin re-scales the key by a distinct prime so (u1, u2) are not a
    fixed rotation of each other.  Requires id + seed below ~1.1e15
    (the 7919 re-scale must not overflow int64).

    Scale shape: zero shuffle — split/slice/join array expressions in
    whole-stage codegen; the token array is let-bound once per row
    (the CollapseProject discipline of chunk_text)."""
    from graph_importer_spark.operators.sampling import hash_unit

    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    bound = df.select(
        F.col(id_col), F.explode(F.array(toks)).alias("_toks")
    )
    n = F.size(F.col("_toks"))
    k = F.col(id_col) + F.lit(seed)
    u1 = hash_unit(k, 1)
    u2 = hash_unit(k * F.lit(7919), 2)
    a = F.floor(u1 * (n + F.lit(1)).cast("double")).cast("int")
    b = a + F.floor(
        u2 * (n - a + F.lit(1)).cast("double")
    ).cast("int")
    return bound.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.array_join(F.slice(F.col("_toks"), 1, a), " ").alias("prefix"),
        F.array_join(
            F.when(b - a > 0, F.slice(F.col("_toks"), a + 1, b - a))
            .otherwise(F.array().cast("array<string>")),
            " ",
        ).alias("middle"),
        F.array_join(
            F.when(n - b > 0, F.slice(F.col("_toks"), b + 1, n - b))
            .otherwise(F.array().cast("array<string>")),
            " ",
        ).alias("suffix"),
    )
