"""End-to-end staged KG-construction pipeline with lineage + resume.

Stage graph (each stage = one Spark job writing one catalog table):

  pages ──extract──> pages_text ──mentions──> mentions ──link──> linked
        ──triples──> triples_raw ──canonicalize──> canonical_map, triples
        ──materialize──> <g>_vertices, <g>_edges

Per north rule: every stage writes per-partition lineage rows
(_lineage) and stage metrics (_metrics); stage completion is a snapshot
tag so ``run_pipeline(resume=True)`` skips finished stages — the Spark
restatement of the reference's exists-and-not-overwrite => skip guard
(graphalytics_importer.py:168-175; observability analogue of its tqdm +
wall-clock prints, importer.py:61-71, and Pregel status polling,
start_Pregel.py:123-164).

Resume is idempotent by construction: every stage output is written
create_or_replace (never blind append), so a re-run after a mid-stage
kill rewrites that stage atomically (SURVEY.md §7 hard part 5).

Skew handling (north rule: explicit): the corpus is repartitioned by
xxhash64(url) up front — provenance keys are uniform even when entity
keys are power-law — and every entity-keyed stage downstream relies on
map-side partial aggregation + AQE skew-join (see cc.py docstring).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_importer_spark import cc as _cc
from graph_importer_spark.operators import ids as _ids
from graph_importer_spark import extract as _extract
from graph_importer_spark import linking as _linking
from graph_importer_spark import mentions as _mentions
from graph_importer_spark import triples as _triples
from graph_importer_spark.materialize import GraphSpec, materialize_graph, triples_to_graph
from graph_importer_spark.tables import GraphCatalog

LINEAGE_TABLE = "_lineage"
METRICS_TABLE = "_metrics"


@dataclass
class PipelineConfig:
    warehouse: str
    graph: GraphSpec = field(default_factory=lambda: GraphSpec(name="kg", overwrite=True))
    lang: str = "en"
    max_cc_iter: int = 30
    url_partitions: int | None = None  # default: spark.sql.shuffle.partitions
    # above this many distinct (surface, entity) pairs, canonicalization
    # switches from xxhash64 node ids (zero extra shuffles, collision
    # budget n^2/2^65) to the collision-free dense-id dictionary
    # (operators/ids.py) — the 10^12 design point of SCALE.md
    dense_id_threshold: int = 50_000_000
    # above this many canonical-map rows the triples rewrite joins
    # plainly (AQE skew-join) instead of force-broadcasting the map:
    # at the 10^12 design point the entity dictionary is 10^8-10^9 rows,
    # far over any broadcast threshold
    broadcast_map_rows: int = 2_000_000
    # at or below this many (surface, entity) pairs the CC loop runs on
    # ONE partition: each large/small-star round becomes two single-task
    # stages instead of fanning a few thousand rows across the full
    # shuffle width — the per-round scheduling latency dominates small
    # graphs (same gate as dedup.dup_clusters).  At real scale the gate
    # never fires; it exists because alias dictionaries, not corpora,
    # bound this graph's size in many deployments
    small_cc_rows: int = 200_000


class Pipeline:
    def __init__(self, spark: SparkSession, cfg: PipelineConfig):
        self.spark = spark
        self.cfg = cfg
        self.cat = GraphCatalog(spark, cfg.warehouse)
        self._metric_buf: list[tuple[str, str, float]] = []
        self._lineage_buf: list[tuple[str, int, int]] = []

    # -- observability ---------------------------------------------------
    # Buffered: per-stage rows accumulate driver-side and flush as ONE
    # append each at the end of run() — a per-metric append would cost a
    # full write job per data point (the reference pays the analogous
    # price with per-bulk HTTP progress calls; we don't).
    def _lineage(self, stage: str, table: str) -> None:
        """Per-partition row counts of the stage output (north-rule
        lineage contract; the columnar analogue of the reference's
        per-bulk progress bars, graphalytics_importer.py:83-90).
        Counts come from the parquet footers the stage just wrote —
        driver-side metadata, zero extra Spark jobs (the Iceberg
        manifest's record_count on a real catalog)."""
        for i, (_fn, n) in enumerate(self.cat.file_row_counts(table)):
            self._lineage_buf.append((stage, i, int(n)))

    def _metric(self, stage: str, name: str, value: float) -> None:
        self._metric_buf.append((stage, name, float(value)))

    def _flush_observability(self) -> None:
        if self._metric_buf:
            rows = self.spark.createDataFrame(
                self._metric_buf, "stage string, metric string, value double"
            ).withColumn("ts", F.current_timestamp())
            self.cat.append(METRICS_TABLE, rows)
            self._metric_buf = []
        if self._lineage_buf:
            rows = self.spark.createDataFrame(
                self._lineage_buf, "stage string, partition_id int, rows long"
            ).withColumn("ts", F.current_timestamp())
            self.cat.append(LINEAGE_TABLE, rows)
            self._lineage_buf = []

    def _run_stage(self, stage: str, table: str, fn, resume: bool, **write_kw) -> None:
        if resume and self.cat.exists(table) and self.cat.has_tag(table, "complete"):
            return
        t0 = time.monotonic()
        df = fn()
        self.cat.create_or_replace(table, df, tag="complete", **write_kw)
        self._metric(stage, "wall_sec", time.monotonic() - t0)
        self._lineage(stage, table)

    # -- stages ------------------------------------------------------------
    def run(self, pages: DataFrame, aliases: DataFrame, resume: bool = False) -> None:
        cfg, cat = self.cfg, self.cat
        # default url-partition count: >= 64 regardless of core count, so
        # the SAME corpus produces the SAME file layout (and therefore
        # identical downstream scan splits) at N and 4N parallelism —
        # 2x-cores here would bake the cluster size into the data layout
        # and break plan identity across scaling levels.  At real scale
        # set cfg.url_partitions so partitions are ~128-256 MB of text.
        nparts = cfg.url_partitions or max(
            64, int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        )

        def s_extract():
            # Extraction runs on the INPUT SPLITS (narrow — parquet is
            # splittable, maxPartitionBytes bounds each task), and the
            # explicit url-hash repartition (north rule) happens on the
            # EXTRACTED text: same uniform layout + write clustering,
            # but the shuffle carries ~15x less than raw html would.
            # html dies here — no downstream stage ever moves raw bytes.
            p = pages.filter(F.col("lang") == cfg.lang) if cfg.lang else pages
            return (
                _extract.with_text(p)
                .drop("html")
                .repartition(nparts, F.xxhash64("url"))
            )

        self._run_stage("extract", "pages_text", s_extract, resume)

        def s_mentions():
            return _mentions.detect_mentions(cat.read("pages_text"), aliases)

        self._run_stage("mentions", "mentions", s_mentions, resume)

        def s_link():
            return _linking.link_mentions(cat.read("mentions"), aliases)

        self._run_stage("link", "linked", s_link, resume)

        def s_triples_raw():
            pt = cat.read("pages_text")
            sents = _mentions.split_sentences(pt)
            return _triples.extract_triples(cat.read("linked"), sents, pt)

        self._run_stage("triples_raw", "triples_raw", s_triples_raw, resume)

        def s_canonical_map():
            return self._canonical_map(cat.read("linked"))

        self._run_stage("canonicalize", "canonical_map", s_canonical_map, resume)

        def s_triples():
            cmap = cat.read("canonical_map")
            t = cat.read("triples_raw")
            # size-gate the broadcast from the parquet footers the
            # canonicalize stage just wrote (driver-side metadata, no
            # job): a 10^8-row entity dictionary must NOT be broadcast —
            # fall back to a plain equi-join (AQE skew-join is on).
            n_map = sum(n for _, n in cat.file_row_counts("canonical_map"))
            hint = F.broadcast if n_map <= self.cfg.broadcast_map_rows else (lambda d: d)
            self._metric("triples", "canonical_map_rows", n_map)
            self._metric("triples", "canonical_map_broadcast", int(n_map <= self.cfg.broadcast_map_rows))
            smap = cmap.select(
                F.col("entity").alias("subj_e"), F.col("canonical").alias("subj_c")
            )
            omap = cmap.select(
                F.col("entity").alias("obj_e"), F.col("canonical").alias("obj_c")
            )
            t = (
                t.join(hint(smap), t.subj == smap.subj_e, "left")
                .join(hint(omap), t.obj == omap.obj_e, "left")
            )
            return t.select(
                F.coalesce("subj_c", "subj").alias("subj"),
                "pred",
                F.coalesce("obj_c", "obj").alias("obj"),
                "url",
                "warc_ts",
            )

        self._run_stage("triples", "triples", s_triples, resume)

        vt = f"{cfg.graph.name}_{cfg.graph.vertices_coll}"
        if not (resume and cat.exists(vt) and cat.has_tag(vt, "complete")):
            t0 = time.monotonic()
            verts, edges = triples_to_graph(cat.read("triples"), cfg.graph)
            materialize_graph(cat, cfg.graph, verts, edges)
            self._metric("materialize", "wall_sec", time.monotonic() - t0)
            self._lineage("materialize", vt)
        self._flush_observability()

    def _canonical_map(self, linked: DataFrame) -> DataFrame:
        """CC over the surface<->entity bipartite graph: alias variants
        that (transitively) link to the same entity collapse into one
        component; canonical id = min entity id in the component.

        Returns (entity, canonical). This is the reference's
        'connectedcomponents'/'wcc' Pregel surface (arguments.py:182-184)
        run natively as the canonicalization stage.

        Node-id strategy is size-gated: xxhash64 string ids (zero extra
        shuffles) up to cfg.dense_id_threshold pairs, the collision-free
        dense-id dictionary (operators/ids.connected_components_dense)
        above it — at 10^12 documents the entity vocabulary makes the
        n^2/2^65 collision budget real, and one silent hash collision
        merges two unrelated entities forever.
        """
        from pyspark.sql import Observation

        obs = Observation()
        pairs = (
            linked.select("surface", "entity")
            .distinct()
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_pairs = int(obs.get["n"])  # rides the checkpoint job — no count job
        it_metrics: list[tuple[int, int]] = []
        hook = lambda i, n: it_metrics.append((i, n))  # noqa: E731
        use_dense = n_pairs > self.cfg.dense_id_threshold
        if use_dense:
            edges = pairs.select(
                F.concat(F.lit("s:"), "surface").alias("src"),
                F.concat(F.lit("e:"), "entity").alias("dst"),
            )
            named = _ids.connected_components_dense(
                edges, max_iter=self.cfg.max_cc_iter, on_iteration=hook
            )
            # component canonical = min member name; 'e:' < 's:' and every
            # component contains >=1 entity, so the canonical name is
            # always the min ENTITY — strip the tag to get the map
            out = named.filter(F.col("name").startswith("e:")).select(
                F.substring("name", 3, 2**31 - 1).alias("entity"),
                F.substring("canonical", 3, 2**31 - 1).alias("canonical"),
            )
        else:
            edges = pairs.select(
                F.xxhash64(F.concat(F.lit("s:"), "surface")).alias("src"),
                F.xxhash64(F.concat(F.lit("e:"), "entity")).alias("dst"),
            )
            labels = _cc.connected_components(
                edges,
                max_iter=self.cfg.max_cc_iter,
                on_iteration=hook,
                single_task=n_pairs <= self.cfg.small_cc_rows,
            )
            ents = pairs.select("entity").distinct().select(
                "entity", F.xxhash64(F.concat(F.lit("e:"), "entity")).alias("id")
            )
            ent_labels = ents.join(labels, "id").select("entity", "component")
            canon = ent_labels.groupBy("component").agg(
                F.min("entity").alias("canonical")
            )
            out = ent_labels.join(canon, "component").select("entity", "canonical")
        for i, n in it_metrics:
            self._metric("canonicalize", f"cc_iter_{i}_edges", n)
        self._metric("canonicalize", "cc_iterations", len(it_metrics))
        self._metric("canonicalize", "cc_pairs", n_pairs)
        self._metric("canonicalize", "cc_dense_ids", int(use_dense))
        return out

    # -- read-back ---------------------------------------------------------
    def triples(self) -> DataFrame:
        return self.cat.read("triples")


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    aliases: DataFrame,
    warehouse: str,
    resume: bool = False,
    graph: GraphSpec | None = None,
    **cfg_overrides,
) -> Pipeline:
    cfg = PipelineConfig(warehouse=warehouse, **cfg_overrides)
    if graph is not None:
        cfg.graph = graph
    p = Pipeline(spark, cfg)
    p.run(pages, aliases, resume=resume)
    return p
