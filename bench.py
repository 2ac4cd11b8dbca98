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
    # round 4
    "dedup_lines",
    "text_dupspan",
    "sketch_bloom",
    "sample_mixture",
    "web_blocklist",
    "pack_sequences",
    "text_vocab",
    "corpus_hygiene",
    "web_hosts_psl",
    "kg_incremental_entities",
    "text_perplexity",
    "text_classifier",
    # round 4, session 2
    "sketch_cms_topk",
    "scd2_user_type",
    "layout_zorder",
    "web_link_graph",
    "sample_weighted",
    "sketch_hist_quantiles",
    "range_lookup_tiers",
    # round 4, session 3
    "text_bm25",
    "split_by_customer",
    "diff_orders",
    "web_anchor_alias",
    "web_domain_quota",
    "text_keywords",
    "text_chunks",
    "web_meta",
    "dedup_incremental",
    "kg_negative_samples",
    "graph_khop",
    "graph_walks",
    # round 4, session 4
    "graph_linkpred",
    "er_blocking",
    "emb_quantize",
    # round 4, session 5
    "graph_skipgram",
    "kg_triple_confidence",
    "emb_pq",
    # round 4, session 6
    "graph_ppr",
    "events_rolling",
    "text_rrf",
    "dedup_prefix_filter",
    "eval_auc",
    "eval_pr_at_k",
    "dedup_simhash",
    "graph_ktruss",
    "eval_ndcg",
    "events_transitions",
    "graph_assortativity",
    "graph_ppmi",
    "graph_clustering",
    "kg_predicate_stats",
    "kg_nquads",
    "events_funnel",
    "er_fellegi_sunter",
    "shard_rendezvous",
    # round 4, session 7
    "kg_closure",
    "kg_path_2hop",
    "graph_powerlaw",
    "text_c4_lines",
    "profile_orders",
    "text_postings",
    "text_bpe",
    "kg_entity_summary",
    "emb_kmeans",
    "sketch_hll",
    "graph_anf",
    "graph_bipartite",
    "er_golden_record",
    "cdc_apply",
    "events_resample",
    "er_edit_pairs",
    # round 4, session 8
    "graph_sage_sample",
    "text_mojibake",
    "kg_fusion",
    "text_curriculum",
    "kg_types",
    "text_contrastive",
    # round 4, session 9
    "sample_epochs",
    "pack_fim",
    "web_url_dedup",
    "kg_provenance",
    "kg_star_optional",
    # round 4, session 10
    "kg_constraints",
    "graph_modularity",
    "er_meta_blocking",
    "sim_cosine_join",
    "layout_compaction",
    "split_leakage",
    # round 4, session 11
    "dedup_containment",
    "web_boilerplate",
    "eval_mrr",
    "graph_butterfly",
    "graph_wl",
    "er_block_metrics",
    # round 4, session 12
    "kg_dangling",
    "schema_match",
    "kg_webtables",
    "dedup_keep_superset",
    "graph_ks",
    "dedup_lsh_plan",
    # round 4, session 13
    "er_pipeline",
    "kg_quality",
    "text_readability",
    # round 4, session 14
    "web_url_templates",
    "sample_diverse",
    "kg_inverse_preds",
    "graph_richclub",
    "kg_fact_history",
    # round 4, session 15
    "events_ngrams",
    "kg_snapshot_diff",
    "layout_compare",
    "text_quality_norm",
    # round 4, session 16
    "text_entropy",
    "kg_numeric_outliers",
    # round 4, session 17
    "graph_reciprocity",
    "kg_literal_norm",
    "kg_truthfinder",
    # round 4, session 18
    "events_retention",
    "orders_rfm",
    "text_toxicity",
    "emb_whiten",
    "events_attribution",
    "kg_transe_rank",
    "text_stem",
    "web_frontier",
    "graph_simrank",
    "graph_harmonic",
    "text_fertility",
    "kg_split_transductive",
    "mm_phash_pairs",
    "graph_mis",
    "emb_decontam",
    "orders_rules",
    "er_fs_em",
    "graph_diameter",
    "eval_ece",
    "eval_regression",
    "er_soundex",
    "kg_path_alt",
    "sim_ann_multiprobe",
    "dedup_cdc_chunks",
    "imp_quarantine",
    "drift_psi",
    "orders_ltv",
    "dedup_savings",
    "text_postings_delta",
    "text_summary",
    "events_churn",
    "events_json_schema",
    "graph_quotient",
    "graph_shortest_path",
    "eval_kappa",
    "eval_confusion",
    "text_hard_negatives",
    "graph_cc_sizes",
    "kg_redirects",
    "dedup_pr",
    "graph_cocitation",
    "events_dau",
    "graph_matching",
    "events_ab_test",
    "orders_checks",
    "text_feature_hash",
    "text_autocomplete",
    "events_did",
    "kg_motif_cycle",
    "text_topics",
    "text_augment",
    "eval_conformal",
    "events_seasonality",
    "events_ttc",
    "events_mad",
    "kg_benford",
    "events_km",
    "orders_pareto",
    "orders_ols",
    "join_card_audit",
    "emb_matryoshka",
    "orders_infogain",
    "events_cusum",
    "events_anomaly",
    "sample_kfold",
    "graph_embeddedness",
    "events_burstiness",
    "dedup_chunk_share",
    "schema_fd",
    "text_sentiment",
    "emb_label_noise",
    "orders_woe",
    "mm_frame_energy",
    "text_qlm",
    "events_forecast",
    "kg_temporal",
    "orders_bootstrap",
    "eval_map",
    "eval_fairness",
    "graph_katz",
    "dedup_bow",
    "kg_range_types",
    "events_acf",
    "text_diversity",
    "orders_corr",
    "orders_gini",
    "events_stationary",
    "sketch_kmv",
    "graph_conductance",
    "text_kwic",
    "events_alerts",
    "emb_drift",
    "eval_ips",
    "eval_rouge",
    "graph_centralization",
    "events_hhi",
    # round 5
    "graph_mincut",
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
    # three samples, best reported: the first run in a fresh JVM pays
    # JIT warmup + Python-UDF worker spawn (~10 s of one-time cost at
    # this corpus size) and the shared host swings 30%+ window to
    # window (same code measured 12.6-17.1 s across one afternoon) —
    # same best-of-repeats methodology as scripts/bench_scaling.py.
    samples = []
    for _ in range(3):
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
    # best-of-2 per query, same methodology as the e2e samples: a single
    # cold run conflates the operator with residual JIT warmup (measured
    # 18.7 s cold vs 5.5 s warm for cc_star in one session) and the
    # shared host's window-to-window variance.
    for name in HEADLINE:
        fn = C.QUERIES[name]
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)
        # queries that persist() intermediates (hygiene, semantic dedup)
        # would otherwise accumulate cached blocks across the run and
        # tax every later query's GC
        spark.catalog.clearCache()

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
    write_bench_section(out)
    return 0


_BENCH_BEGIN = "<!-- BENCH-LATEST-BEGIN (generated by bench.py) -->"
_BENCH_END = "<!-- BENCH-LATEST-END -->"


def write_bench_section(out: dict) -> None:
    """Write the latest bench JSON straight into BENCH.md between the
    BENCH-LATEST markers, so reported numbers can't drift from what the
    script measured (hand-merged reporting stalled once in round 3)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md")
    try:
        text = open(path).read()
    except OSError:
        return
    slow = sorted(
        ((k, v) for k, v in out["queries"].items()
         if isinstance(v, (int, float))),
        key=lambda kv: -kv[1],
    )[:8]
    block = "\n".join([
        _BENCH_BEGIN,
        "",
        f"`python bench.py` (local[{out['cpus']}], sf{out['sf']}, "
        f"{out['n_pages']} pages, best-of-2 e2e): "
        f"**{out['e2e_sec']} s / {out['value']} triples/s** "
        f"({out['n_triples']} triples).",
        "",
        "Slowest queries (sec): "
        + ", ".join(f"{k} {v}" for k, v in slow) + ".",
        "",
        "```json",
        json.dumps(out),
        "```",
        "",
        _BENCH_END,
    ])
    if _BENCH_BEGIN in text and _BENCH_END in text:
        head, _, rest = text.partition(_BENCH_BEGIN)
        _, _, tail = rest.partition(_BENCH_END)
        text = head + block + tail
    else:
        text = text.rstrip() + "\n\n## Latest bench (script-written)\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(text)


if __name__ == "__main__":
    raise SystemExit(main())
