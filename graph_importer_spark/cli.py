"""Command-line surface mirroring the reference's entry points
(importer.py, generator.py, start_Pregel.py — SURVEY.md §3), runnable
via ``spark-submit --py-files graph_importer_spark.zip -m`` or plain
``python -m graph_importer_spark.cli``.

Subcommands:
  pipeline            synthetic-corpus or parquet pages -> staged KG build
  import-graphalytics <dir with base.v/.e/.properties> -> vertex/edge tables
  import-edge-list    <file> -> vertex/edge tables
  generate            clique | cliques-graph | k-partite | tournament
  analytics           pagerank | wcc | sssp | labelpropagation

Argument names/defaults follow the reference's arguments.py where a
counterpart exists (bulk batching and DB endpoints have no analogue:
batching is Spark partitions, the sink is the table catalog).
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import functions as F


def _add_db_args(p: argparse.ArgumentParser) -> None:
    # reference arguments.py:15,32-34,40-43 defaults
    p.add_argument("--warehouse", required=True, help="catalog/warehouse dir")
    p.add_argument("--graph_name", default="importedGraph")
    p.add_argument("--vertices", default="vertices")
    p.add_argument("--edges", default="edges")
    p.add_argument("--num_shards", type=int, default=5)
    p.add_argument("--repl_factor", type=int, default=2)
    p.add_argument("--smart", action="store_true", dest="make_smart")
    p.add_argument("--smart_attribute", default="smartProp")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--cores", type=int, default=None)


def _spec(args):
    from graph_importer_spark.materialize import GraphSpec

    return GraphSpec(
        name=args.graph_name,
        vertices_coll=args.vertices,
        edges_coll=args.edges,
        num_shards=args.num_shards,
        replication_factor=args.repl_factor,
        smart=args.make_smart,
        smart_attribute=args.smart_attribute,
        overwrite=args.overwrite,
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="graph_importer_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("pipeline", help="end-to-end KG construction")
    _add_db_args(pp)
    pp.add_argument("--pages", default=None, help="parquet dir of pages; default: synthetic corpus")
    pp.add_argument("--n_pages", type=int, default=10000)
    pp.add_argument("--n_entities", type=int, default=500)
    pp.add_argument("--resume", action="store_true")

    pg = sub.add_parser("import-graphalytics")
    _add_db_args(pg)
    pg.add_argument("directory")

    pe = sub.add_parser("import-edge-list")
    _add_db_args(pe)
    pe.add_argument("filename")

    gen = sub.add_parser("generate")
    _add_db_args(gen)
    gen.add_argument("--graphtype", choices=["clique", "cliques-graph", "k-partite", "tournament"], default="clique")
    gen.add_argument("--num_vertices", type=int, default=100)
    gen.add_argument("--num_parts", type=int, default=5)  # cliques / k
    gen.add_argument("--min_size", type=int, default=3)
    gen.add_argument("--max_size", type=int, default=8)
    gen.add_argument("--prob_missing_one", type=float, default=0.0)
    gen.add_argument("--prob_missing_all", type=float, default=0.0)
    gen.add_argument("--seed", type=int, default=42)

    an = sub.add_parser("analytics")
    _add_db_args(an)
    # reference start_Pregel.py params: algorithm, maxGSS, threshold, source
    # full reference catalog (arguments.py:176-188): every algorithm the
    # reference can launch server-side runs natively here
    an.add_argument(
        "--algorithm",
        choices=[
            "pagerank", "wcc", "connectedcomponents", "scc", "sssp",
            "labelpropagation", "hits", "linerank", "effectivecloseness", "slpa",
            "trianglecount", "kcore",
        ],
        required=True,
    )
    an.add_argument("--max_gss", type=int, default=20)
    an.add_argument("--threshold", type=float, default=1e-4)
    an.add_argument("--source", type=int, default=0)
    an.add_argument("--k", type=int, default=2, help="k for --algorithm kcore")
    an.add_argument("--result_field", default="result")
    an.add_argument(
        "--store",
        action="store_true",
        help="write the result back as a field on the vertex documents "
        "(reference store/resultField semantics, start_Pregel.py:179-192), "
        "in addition to the <graph>_<algorithm> result table",
    )

    args = ap.parse_args(argv)

    from graph_importer_spark.session import get_spark
    from graph_importer_spark.tables import GraphCatalog

    spark = get_spark(cores=args.cores)
    cat = GraphCatalog(spark, args.warehouse)
    t0 = time.monotonic()

    if args.cmd == "pipeline":
        from graph_importer_spark import synth
        from graph_importer_spark.pipeline import run_pipeline

        if args.pages:
            pages = spark.read.parquet(args.pages)
            _, _, aliases = synth.corpus(spark, n_pages=1, n_entities=args.n_entities)
        else:
            pages, _, aliases = synth.corpus(
                spark, n_pages=args.n_pages, n_entities=args.n_entities
            )
        p = run_pipeline(
            spark, pages, aliases, args.warehouse, resume=args.resume, graph=_spec(args)
        )
        n = p.triples().count()
        print(f"triples: {n}  ({n / (time.monotonic() - t0):.1f}/s)")

    elif args.cmd == "import-graphalytics":
        from graph_importer_spark.importer.graphalytics import import_graphalytics

        done = import_graphalytics(spark, cat, args.directory, _spec(args))
        print("imported" if done else "skipped (exists, no --overwrite)")

    elif args.cmd == "import-edge-list":
        from graph_importer_spark.importer.edge_list import import_edge_list

        done = import_edge_list(spark, cat, args.filename, _spec(args))
        print("imported" if done else "skipped (exists, no --overwrite)")

    elif args.cmd == "generate":
        from graph_importer_spark.materialize import materialize_graph
        from graph_importer_spark.operators import generators as G

        if args.graphtype == "clique":
            edges = G.clique_edges(spark, args.num_vertices, args.prob_missing_one, args.seed)
            verts = G.prepare_vertices(spark, args.num_vertices, smart=args.make_smart,
                                       smart_attribute=args.smart_attribute)
        elif args.graphtype == "tournament":
            edges = G.tournament_edges(spark, args.num_vertices, args.seed)
            verts = G.prepare_vertices(spark, args.num_vertices, smart=args.make_smart,
                                       smart_attribute=args.smart_attribute)
        elif args.graphtype == "cliques-graph":
            vdf, edges = G.cliques_graph_edges(
                spark, args.num_parts, args.min_size, args.max_size,
                args.prob_missing_one, args.prob_missing_all, args.seed,
            )
            verts = vdf.select(F.col("id").cast("string").alias("_key"),
                               F.col("part").cast("string").alias("part"))
        else:
            vdf, edges = G.k_partite_edges(
                spark, args.num_parts, args.min_size, args.max_size, args.seed
            )
            verts = vdf.select(F.col("id").cast("string").alias("_key"),
                               F.col("part").cast("string").alias("part"))
        edges_doc = edges.select(
            F.concat(F.lit(args.vertices + "/"), F.col("src").cast("string")).alias("_from"),
            F.concat(F.lit(args.vertices + "/"), F.col("dst").cast("string")).alias("_to"),
        )
        done = materialize_graph(cat, _spec(args), verts, edges_doc)
        print("generated" if done else "skipped (exists, no --overwrite)")

    elif args.cmd == "analytics":
        # the reference POSTs these to server-side Pregel and polls
        # (start_Pregel.py:28-80); here they run natively and the result
        # is stored as a column table next to the graph (store/resultField
        # semantics, arguments.py:156-171)
        from graph_importer_spark.operators import analytics as A

        et = f"{args.graph_name}_{args.edges}"
        e = cat.read(et).select(
            F.xxhash64("_from").alias("src"), F.xxhash64("_to").alias("dst")
        )
        if args.algorithm == "pagerank":
            res = A.pagerank(e, tol=args.threshold, max_iter=args.max_gss)
        elif args.algorithm in ("wcc", "connectedcomponents"):
            res = A.connected_components(e, max_iter=args.max_gss).withColumnRenamed(
                "component", args.result_field
            )
        elif args.algorithm == "scc":
            res = A.strongly_connected_components(
                e, max_iter=args.max_gss
            ).withColumnRenamed("scc", args.result_field)
        elif args.algorithm == "sssp":
            # edges were rekeyed as xxhash64(_from/_to) document ids above,
            # so the raw --source integer must be resolved through the SAME
            # keying: look its _key up in the vertex table (plain or smart
            # form) and hash the resulting '<coll>/<key>' document id —
            # otherwise the source can never match a vertex and sssp
            # "converges" instantly to a single row.
            vt = f"{args.graph_name}_{args.vertices}"
            # smart keys are '<smart-value>:<id>' where the smart value
            # need not equal the id (e.g. smart_attribute='part' stores
            # '<part>:<id>', materialize.smart_key) — so besides the
            # plain and self-prefixed forms, match any key whose suffix
            # is ':<source>'
            hit = (
                cat.read(vt)
                .filter(
                    F.col("_key").isin(
                        str(args.source), f"{args.source}:{args.source}"
                    )
                    | F.col("_key").endswith(f":{args.source}")
                )
                .select("_key")
                .limit(1)
                .collect()
            )
            if not hit:
                raise SystemExit(
                    f"--source {args.source} not found as a _key in {vt}"
                )
            src_id = f"{args.vertices}/{hit[0]['_key']}"
            src_hash = (
                spark.range(1)
                .select(F.xxhash64(F.lit(src_id)).alias("h"))
                .collect()[0]["h"]
            )
            res = A.sssp(e, source=src_hash, max_iter=args.max_gss)
        elif args.algorithm == "hits":
            res = A.hits(e, max_iter=args.max_gss)
        elif args.algorithm == "linerank":
            res = A.linerank(e, max_iter=args.max_gss).withColumnRenamed(
                "linerank", args.result_field
            )
        elif args.algorithm == "effectivecloseness":
            res = A.effective_closeness(e, max_iter=args.max_gss).withColumnRenamed(
                "closeness", args.result_field
            )
        elif args.algorithm == "slpa":
            res = A.slpa(e, max_iter=args.max_gss)
        elif args.algorithm == "trianglecount":
            res = A.triangle_count(e)
        elif args.algorithm == "kcore":
            res = A.kcore(e, k=args.k, max_iter=args.max_gss)
        else:
            res = A.label_propagation(e, max_iter=args.max_gss)
        out = f"{args.graph_name}_{args.algorithm}"
        cat.create_or_replace(out, res, tag="complete")
        if args.store:
            # reference store/resultField parity (start_Pregel.py:179-192):
            # the Pregel result lands ON the vertex documents.  Vertex ids
            # in `res` are xxhash64('<coll>/<_key>') (the same keying the
            # edge frame uses above), so the join key is recomputed from
            # _key; single-column results take --result_field as the
            # stored field name, multi-column results (hits) keep theirs.
            vt = f"{args.graph_name}_{args.vertices}"
            stored = cat.read(out)
            val_cols = [c for c in stored.columns if c != "id"]
            if len(val_cols) == 1 and val_cols[0] != args.result_field:
                stored = stored.withColumnRenamed(val_cols[0], args.result_field)
            verts = cat.read(vt).withColumn(
                "__vid",
                F.xxhash64(F.concat(F.lit(args.vertices + "/"), F.col("_key"))),
            )
            merged = verts.join(
                stored.withColumnRenamed("id", "__vid"), "__vid", "left"
            ).drop("__vid")
            cat.create_or_replace(vt, merged, tag=f"store_{args.algorithm}")
        print(f"{args.algorithm}: {cat.read(out).count()} rows -> {out} "
              f"({time.monotonic() - t0:.1f}s)")

    return 0


if __name__ == "__main__":
    sys.exit(main())
