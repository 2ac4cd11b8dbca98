"""Structured Streaming surface: incremental KG ingestion.

The reference is batch-only (files -> DB; SURVEY §2.7 '—absent—'); its
incremental story is exists-then-skip resume. The graft keeps that
snapshot-based resume for batch AND adds a true streaming path for the
'new WARC slices keep arriving' shape of a Common-Crawl pipeline:

* ``read_pages_stream`` — file-source ``readStream`` over a directory
  of page parquet files (each new file = one micro-batch of pages);
* ``extract_stream`` — the SAME Arrow UDF extraction stage, applied to
  the streaming frame (narrow, no state);
* ``windowed_event_counts`` — watermarked tumbling-window aggregation
  (late rows beyond the watermark dropped by the engine);
* ``streaming_dedup`` — exact content dedup with watermark-bounded
  state (dropDuplicatesWithinWatermark over the batch fingerprint
  normal form);
* ``incremental_triples`` — foreachBatch driver: runs the batch
  extract->mentions->link->triples chain on each micro-batch and
  appends to the catalog; the stream checkpoint gives exactly-once per
  input file, so this is the streaming analogue of the pipeline's
  per-stage snapshot resume.

All transformations reuse the batch operators — one definition of the
semantics, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from graph_importer_spark import extract as _extract
from graph_importer_spark import linking as _linking
from graph_importer_spark import mentions as _mentions
from graph_importer_spark import triples as _triples
from graph_importer_spark.tables import GraphCatalog

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of pages (BASELINE input_hint schema)."""
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def extract_stream(pages: DataFrame) -> DataFrame:
    """Stateless extraction on a streaming frame — identical semantics
    to the batch stage (same pinned UDF => byte-identical text)."""
    return _extract.with_text(pages)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (the streaming
    form of contract.q_events_hourly)."""
    return (
        events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def streaming_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup of incoming documents by content
    fingerprint with WATERMARK-BOUNDED state.

    ``dropDuplicatesWithinWatermark`` keeps one row per fingerprint and
    — the part that matters at 10^12 documents — EVICTS a fingerprint
    from the state store once the watermark passes it, so state is
    bounded by the dedup horizon (arrival-time duplicate window) instead
    of growing with the full corpus like plain streaming
    ``dropDuplicates``.  The fingerprint is the batch dedup normal form
    ([[fingerprint]]: md5 of lower/ws-collapsed text) — one definition
    of "duplicate" across the batch and streaming paths.

    Output is restricted to (fp, event time): WHICH duplicate row
    survives is a first-arrival race under parallelism, so only the
    deterministic columns leave the operator.
    """
    from graph_importer_spark.operators.textstats import fingerprint as _fp

    keyed = docs.select(
        _fp(F.col(text_col)).alias("fp"), F.col(ts_col).cast("timestamp")
    ).withWatermark(ts_col, watermark)
    return keyed.dropDuplicatesWithinWatermark(["fp"]).select("fp")


def _batch_triples(
    pages: DataFrame,
    aliases: DataFrame,
    default_pred: str | None = None,
    max_alias_tokens: int | None = None,
) -> DataFrame:
    pt = _extract.with_text(pages)
    kw = {} if max_alias_tokens is None else {"max_alias_tokens": max_alias_tokens}
    m = _mentions.detect_mentions(pt, aliases, **kw)
    linked = _linking.link_mentions(m, aliases)
    sents = _mentions.split_sentences(pt)
    return _triples.extract_triples(linked, sents, pt, default_pred=default_pred)


def incremental_triples(
    spark: SparkSession,
    pages_path: str,
    aliases: DataFrame,
    catalog: GraphCatalog,
    table: str,
    checkpoint_dir: str,
    available_now: bool = True,
    default_pred: str | None = None,
    max_alias_tokens: int | None = None,
    max_files_per_trigger: int | None = None,
):
    """foreachBatch incremental pipeline: each micro-batch of new page
    files runs the full extract->link->triples chain and APPENDS to
    ``table``. The stream checkpoint records consumed files, so
    restarts never reprocess a file (exactly-once per file — the
    streaming analogue of the reference's exists-then-skip,
    graphalytics_importer.py:168-175).

    Returns the StreamingQuery; with ``available_now`` the caller can
    ``awaitTermination()`` for drain-and-stop semantics.
    """
    stream = read_pages_stream(spark, pages_path, max_files_per_trigger)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a crash after the catalog append
        # commits but before the stream checkpoint commits replays the
        # batch on restart.  The per-batch snapshot tag makes the body
        # idempotent — a replayed batch_id is skipped.  This relies on
        # the catalog's append being ATOMIC (tables.GraphCatalog.append:
        # data visibility and the tag land in one meta swap — a crash
        # mid-append leaves an invisible orphan dir, never untagged
        # visible rows), so the exactly-once-per-file claim holds end
        # to end.
        tag = f"stream_batch_{batch_id}"
        if catalog.exists(table) and catalog.has_tag(table, tag):
            return
        out = _batch_triples(batch_df, aliases, default_pred, max_alias_tokens).withColumn(
            "batch_id", F.lit(batch_id)
        )
        catalog.append(table, out, tag=tag)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_sessions(
    events: DataFrame, gap_us: int = 1800 * 1_000_000, ts_col: str = "ts"
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState —
    SURVEY §2.7): gap-based sessionization with per-user state carried
    across micro-batches.  Emits the user's CUMULATIVE
    (n_sessions, n_events) each time a batch touches them (update
    mode); both counters are monotone, so the final value per user is
    the row with the largest counts — and it equals the batch
    sessionization (contract.q_events_sessions) when batches arrive in
    time order (the file-source contract here; late data would need the
    watermark + timeout variant).

    State is 3 int64s per user (last event time, session count, event
    count); the per-batch work inside the pandas function is numpy
    (sort + diff > gap), no per-row Python.  At 10^9 users this is a
    keyed state store partitioned by user hash — the exact shape
    Structured Streaming shards state by.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    sentinel = -(2**62)

    def update(key, pdfs, state: GroupState):
        chunks = [pdf["us"].to_numpy(dtype="int64") for pdf in pdfs]
        us = np.sort(np.concatenate(chunks)) if chunks else np.array([], dtype="int64")
        last, ns, ne = state.get if state.exists else (sentinel, 0, 0)
        if len(us):
            prev = np.concatenate(([last], us[:-1]))
            ns += int(((us - prev) > gap_us).sum())
            ne += len(us)
            state.update((int(us[-1]), ns, ne))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [ns], "n_events": [ne]}
        )

    prepared = events.select(
        "user_id", F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_sessions long, n_events long",
        stateStructType="last_us long, n_sessions long, n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def incremental_canonical_stream(
    spark: SparkSession,
    pages_path: str,
    aliases: DataFrame,
    catalog: GraphCatalog,
    map_table: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """foreachBatch maintenance of the entity canonical map: each
    micro-batch of new pages runs extract->mentions->link, turns the
    (surface, entity) pairs into delta edges, and folds them into the
    stored map with operators.incremental.incremental_canonicalize —
    previously assigned entity ids stay stable across batches, merges
    resolve to the smaller OLD id, and per-batch work is proportional
    to the DELTA (the streaming analogue of the batch pipeline's
    canonicalize stage; SCALE.md "incremental canonicalization").

    Replay safety: foreachBatch is at-least-once; re-folding a batch's
    edges into a map that already contains them is a NO-OP by
    construction (every component already carries its anchor, so the
    stable-id choice is unchanged) — the operator is idempotent under
    replay, with the snapshot tag as a fast-path skip where the catalog
    retains tag history.

    Returns the StreamingQuery (``available_now`` for drain-and-stop).
    """
    from graph_importer_spark.operators.incremental import incremental_canonicalize

    stream = read_pages_stream(spark, pages_path, max_files_per_trigger)
    empty_map = spark.createDataFrame([], "name string, canonical string")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"stream_batch_{batch_id}"
        if catalog.exists(map_table) and catalog.has_tag(map_table, tag):
            return
        pt = _extract.with_text(batch_df)
        m = _mentions.detect_mentions(pt, aliases)
        linked = _linking.link_mentions(m, aliases)
        edges = (
            linked.select("surface", "entity")
            .distinct()
            .select(
                F.concat(F.lit("s:"), "surface").alias("src"),
                F.concat(F.lit("e:"), "entity").alias("dst"),
            )
        )
        existing = catalog.read(map_table) if catalog.exists(map_table) else empty_map
        # localCheckpoint: the update must not lazily re-read map_table
        # while create_or_replace rewrites it underneath the plan.
        updated = incremental_canonicalize(existing, edges).localCheckpoint(eager=True)
        catalog.create_or_replace(map_table, updated, tag=tag)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def canonical_entities(map_df: DataFrame) -> DataFrame:
    """(entity, canonical) view of a tagged canonical map (strip the
    's:'/'e:' vertex tags; every component's canonical is an entity
    because 'e:' < 's:' — same convention as Pipeline._canonical_map)."""
    return map_df.filter(F.col("name").startswith("e:")).select(
        F.substring("name", 3, 2**31 - 1).alias("entity"),
        F.substring("canonical", 3, 2**31 - 1).alias("canonical"),
    )


def streaming_fuzzy_dedup(
    spark: SparkSession,
    docs_path: str,
    catalog: GraphCatalog,
    checkpoint_dir: str,
    schema,
    id_col: str = "doc_id",
    text_col: str = "text",
    index_table: str = "lsh_index",
    counts_table: str = "lsh_counts",
    dups_table: str = "near_dups",
    k: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    max_bucket: int = 1000,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming incremental near-dup detection: each micro-batch of
    documents PROBES the stored LSH band index (``dedup.lsh_probe``
    semantics — links against all PRIOR documents), appends its links
    to ``dups_table``, then folds its own band keys into the index —
    the streaming regime of the batch ``lsh_band_index``/``lsh_probe``
    pair, with the same first-arrival-keeps contract as
    ``streaming_dedup``.

    State lives in catalog tables, not the state store: the band index
    grows with the corpus by design (fuzzy dedup has no watermark-
    bounded analogue — a near-dup may arrive years later), and a
    catalog table is exactly the storage that scales there; the
    hot-bucket counts are maintained incrementally (old counts merged
    with the batch's key counts — the index is never recounted).
    Within-batch duplicates are NOT linked to each other (run
    ``lsh_candidate_pairs`` on a batch if intra-batch links matter);
    replay safety via per-batch tags, same as the canonical-map stream.

    Returns the StreamingQuery.  Hash/band parameters are part of the
    index contract (see ``lsh_probe``).
    """
    from graph_importer_spark.operators.dedup import lsh_band_keys

    stream = spark.readStream.schema(schema).parquet(docs_path)
    if max_files_per_trigger is not None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(docs_path)
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"fuzzy_batch_{batch_id}"
        if catalog.exists(dups_table) and catalog.has_tag(dups_table, tag):
            return
        bk = lsh_band_keys(
            batch_df, id_col, text_col, k, n_hashes, bands
        ).localCheckpoint(eager=True)
        if catalog.exists(index_table):
            keys = catalog.read(index_table)
            counts = catalog.read(counts_table)
            ok = counts.filter(F.col("bucket_n") <= max_bucket).select(
                "band", "bkey"
            )
            links = (
                bk.select(F.col(id_col).alias("new_id"), "band", "bkey")
                .join(keys.join(ok, ["band", "bkey"]), ["band", "bkey"])
                .filter(F.col("new_id") != F.col(id_col))
                .select("new_id", F.col(id_col).alias("corpus_id"))
                .distinct()
            )
            new_counts = (
                counts.unionByName(
                    bk.groupBy("band", "bkey").agg(
                        F.count("*").alias("bucket_n")
                    )
                )
                .groupBy("band", "bkey")
                .agg(F.sum("bucket_n").alias("bucket_n"))
            )
        else:
            # type-correct empty links for any id type
            links = bk.select(
                F.col(id_col).alias("new_id"),
                F.col(id_col).alias("corpus_id"),
            ).limit(0)
            new_counts = bk.groupBy("band", "bkey").agg(
                F.count("*").alias("bucket_n")
            )
        # materialize BEFORE the writes below rewrite their inputs
        links = links.localCheckpoint(eager=True)
        new_counts = new_counts.localCheckpoint(eager=True)
        if catalog.exists(index_table):
            catalog.append(index_table, bk)
        else:
            catalog.create_or_replace(index_table, bk)
        catalog.create_or_replace(counts_table, new_counts)
        if catalog.exists(dups_table):
            catalog.append(dups_table, links, tag=tag)
        else:
            catalog.create_or_replace(dups_table, links, tag=tag)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
    right_id: str,
    horizon_seconds: int = 600,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join — the attribution shape
    (impression joined to every click by the same key within
    ``horizon_seconds`` after it) as a true Structured Streaming join,
    not a batch twin.

    -> (key, left_id, right_id, lag_s) with
    0 <= right.ts - left.ts <= horizon.

    State-bound mechanics (the part that matters on an unbounded
    stream): BOTH sides carry a watermark and the join condition is a
    closed time range on the two event times, so Spark derives state
    eviction for each side — a buffered left row is dropped once the
    right watermark passes left_ts + horizon, and vice versa; state is
    O(traffic within watermark + horizon), never the full history.
    Without the range condition the state store grows without bound —
    that misconfiguration is exactly what this operator exists to
    encapsulate.  Join keys are user-grained (uniform-ish); a Zipf-hot
    key (bot traffic) is AQE territory in batch but in streaming must
    be rate-limited upstream — documented, not hidden.

    Equality on ``key`` plus the range predicate makes this a
    hash-partitioned stream join (both sides shuffle on key once); the
    lag is computed post-join in codegen.
    """
    l = left.select(
        F.col(key).alias("k"),
        F.col(left_ts).cast("timestamp").alias("l_ts"),
        F.col(left_id).alias("left_id"),
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key).alias("rk"),
        F.col(right_ts).cast("timestamp").alias("r_ts"),
        F.col(right_id).alias("right_id"),
    ).withWatermark("r_ts", watermark)
    joined = l.join(
        r,
        (F.col("k") == F.col("rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (
            F.col("r_ts")
            <= F.col("l_ts") + F.expr(f"INTERVAL {horizon_seconds} SECONDS")
        ),
    )
    return joined.select(
        F.col("k").alias(key),
        "left_id",
        "right_id",
        (
            F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts")
        ).alias("lag_s"),
    )


def streaming_cdc_apply(
    spark: SparkSession,
    changes_path: str,
    catalog: GraphCatalog,
    checkpoint_dir: str,
    schema,
    key: str,
    data_cols: list[str],
    version_col: str = "version",
    op_col: str = "op",
    snapshot_table: str = "current",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming lakehouse MERGE: each micro-batch of CDC rows
    (op in {'I','U','D'}, strictly ordered ``version``) folds into a
    catalog-backed ``current`` snapshot via ``scd2.apply_cdc`` —
    the continuously-maintained serving table over a change stream.

    Cross-batch contract: the log must arrive version-ordered ACROSS
    micro-batches (the per-key-ordered reality of a CDC source);
    within a batch any order — apply_cdc's max_by picks the winner.
    Under that contract the sequentially-folded snapshot equals the
    one-shot batch apply over the whole log, which is exactly what
    the driver oracle checks.

    State is the snapshot itself (catalog table, replay-tagged) —
    per-batch work is one key-keyed max_by over the BATCH plus one
    key join against the snapshot; the change history is never
    re-read.
    """
    from graph_importer_spark.operators.scd2 import apply_cdc

    stream = spark.readStream.schema(schema).parquet(changes_path)
    if max_files_per_trigger is not None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(changes_path)
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"cdc_batch_{batch_id}"
        if catalog.exists(snapshot_table) and catalog.has_tag(
            snapshot_table, tag
        ):
            return
        if catalog.exists(snapshot_table):
            cur = catalog.read(snapshot_table)
        else:
            cur = batch_df.select(key, *data_cols).limit(0)
        new = apply_cdc(
            cur, batch_df, key, version_col, op_col
        ).localCheckpoint(eager=True)
        catalog.create_or_replace(snapshot_table, new, tag=tag)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
