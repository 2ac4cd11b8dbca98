"""Benchmark harness: ONE JSON line on stdout.

Headline metric (BASELINE.json): triples/sec end-to-end through the KG
pipeline (extract -> mentions -> link -> canonicalize -> materialize) on
the deterministic synthetic Common-Crawl-style corpus, plus wall-clock
for each headline operator query at $SPARK_GRAFT_SF_DIR.

Env knobs:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[N] cores (default 32) — the N vs 4N scaling
                      evidence runs this same script at 8 and 32 via
                      scripts/bench_scaling.py
  SPARK_GRAFT_BENCH_PAGES  synthetic corpus size for the e2e run
                           (default 20000)
  SPARK_GRAFT_BENCH_WEIGHT page heaviness (default 4: ~8 KB html/page,
                           toward real Common-Crawl density)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from graph_importer_spark import contract as C  # noqa: E402
from graph_importer_spark import synth  # noqa: E402
from graph_importer_spark.pipeline import run_pipeline  # noqa: E402
from graph_importer_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "kg_flagship",
    "kg_extract",
    "pricing_summary",
    "region_volume",
    "window_top_orders",
    "events_sessions",
    "imp_edge_parse",
    "cc_star",
    "dedup_fingerprint",
    "dedup_minhash_lsh",
    "text_quality",
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "tri_copurchase",
    "kcore_copurchase",
    "asof_last_click",
    "asof_bucketed",
    "sample_stratified",
    "skew_salted_count",
    "skew_salted_topk",
    "dedup_winnow",
    "text_gopher",
    "text_repetition",
    "dedup_clusters",
    "text_decontam",
    "text_pii",
    "web_hosts",
    "dedup_semantic",
    "text_dsir",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "20000"))
    weight = int(os.environ.get("SPARK_GRAFT_BENCH_WEIGHT", "4"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark(app_name="graft-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}

    # -- e2e KG pipeline: the authoritative triples/sec metric ----------
    n_entities = max(200, n_pages // 100)
    pages, _, aliases = synth.corpus(
        spark, n_pages=n_pages, n_entities=n_entities, weight=weight
    )
    pages = pages.localCheckpoint(eager=True)      # materialize input first:
    aliases = aliases.localCheckpoint(eager=True)  # bench the pipeline, not the generator
    # two samples, best reported: the first run in a fresh JVM pays JIT
    # warmup + Python-UDF worker spawn (~10 s of one-time cost at this
    # corpus size) and the shared host is externally loaded — same
    # best-of-repeats methodology as scripts/bench_scaling.py.
    samples = []
    for _ in range(2):
        wh = tempfile.mkdtemp(prefix="graft_bench_")
        try:
            t0 = time.monotonic()
            p = run_pipeline(spark, pages, aliases, wh)
            n_triples = p.triples().count()
            samples.append(time.monotonic() - t0)
        finally:
            shutil.rmtree(wh, ignore_errors=True)
    e2e_sec = min(samples)
    queries["e2e_kg_pipeline"] = round(e2e_sec, 3)
    queries["e2e_kg_pipeline_samples"] = [round(s, 3) for s in samples]
    triples_per_sec = n_triples / e2e_sec if e2e_sec > 0 else 0.0

    # -- headline operator queries at sf_dir ----------------------------
    for name in HEADLINE:
        fn = C.QUERIES[name]
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        queries[name] = round(time.monotonic() - t0, 3)

    out = {
        "metric": "triples_per_sec_e2e",
        "value": round(triples_per_sec, 1),
        "unit": "triples/sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "n_pages": n_pages,
        "page_weight": weight,
        "n_triples": n_triples,
        "e2e_sec": round(e2e_sec, 3),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
