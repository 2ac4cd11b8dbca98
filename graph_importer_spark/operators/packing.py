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
