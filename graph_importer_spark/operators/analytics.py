"""Graph analytics, natively on DataFrames.

The reference only launches/monitors these server-side
(start_Pregel.py:28-57 POST _api/control_pregel, catalog
arguments.py:176-188: pagerank, sssp, connectedcomponents, wcc, ...).
Here the ones the north star needs run as driver-orchestrated iterative
DataFrame jobs — each superstep is a join + aggregate, lineage truncated
per iteration with localCheckpoint (same discipline as cc.py).

Parameter mapping (reference G3/G4/G5, SURVEY.md §2.9):
  maxGSS -> max_iter; 'threshold' -> tol (PageRank convergence on the
  L-inf delta); 'source'/'resultField' -> source / the returned column;
  parallelism -> spark.sql.shuffle.partitions (session-level).

Scale notes: ranks/dists are keyed by vertex id — power-law in-degree
makes the contribution aggregation skewed; it is a groupBy().sum(),
i.e. map-side partial aggregation absorbs hot keys before the shuffle.
The join of contribs back to the vertex frame is equi-join under AQE
(skew-join splitting on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_importer_spark.cc import connected_components, connected_components_str  # noqa: F401  (wcc surface)


def _vertices_of(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-4,
    max_iter: int = 20,
    on_iteration=None,
) -> DataFrame:
    """edges(src, dst) -> (id, rank); sum(rank) == n (Pregel convention).

    Dangling mass is redistributed uniformly each superstep, so ranks
    match the reference's Pregel PageRank semantics
    (start_Pregel.py:195-199 threshold convergence).
    """
    from pyspark.sql import Observation

    spark = edges.sparkSession
    deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # static vertex frame with the dangling flag baked in: membership in
    # the no-out-edges set never changes, so the per-superstep dangling
    # mass is just a conditional sum over the rank frame — no anti-join
    # in the loop.
    verts = (
        _vertices_of(edges)
        .join(deg.withColumnRenamed("src", "id"), "id", "left")
        .select("id", F.col("out_deg").isNull().alias("is_dangling"))
        .localCheckpoint(eager=True)
    )
    head = verts.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("is_dangling"), 1).otherwise(0)).alias("nd"),
    ).collect()[0]
    n = int(head["n"])
    if n == 0:
        return spark.createDataFrame([], "id long, rank double")
    # static frame reused every superstep: (src, dst, out_deg)
    links = (
        edges.join(deg, "src")
        .select("src", "dst", "out_deg")
        .localCheckpoint(eager=True)
    )
    ranks = verts.select("id", "is_dangling", F.lit(1.0).alias("rank"))
    dangling = float(head["nd"])  # every dangling vertex starts at rank 1.0
    for i in range(max_iter):
        contribs = (
            links.join(ranks.select(F.col("id").alias("src"), "rank"), "src")
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        new_ranks = (
            verts.join(contribs.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                "is_dangling",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
        )
        # ONE action per superstep: the convergence delta and the NEXT
        # iteration's dangling mass ride the checkpoint job as an
        # Observation (same discipline as cc._checkpoint_fp) instead of
        # two extra scalar collects.
        obs = Observation()
        joined = (
            new_ranks.join(ranks.select("id", F.col("rank").alias("old")), "id")
            .observe(
                obs,
                F.max(F.abs(F.col("rank") - F.col("old"))).alias("delta"),
                F.coalesce(
                    F.sum(F.when(F.col("is_dangling"), F.col("rank"))), F.lit(0.0)
                ).alias("dangling"),
            )
            .select("id", "is_dangling", "rank")
            .localCheckpoint(eager=True)
        )
        got = obs.get
        delta, dangling = float(got["delta"]), float(got["dangling"])
        ranks = joined
        if on_iteration is not None:
            on_iteration(i, delta)
        if delta < tol:
            break
    return ranks.select("id", "rank")


def sssp(
    edges: DataFrame,
    source,
    weight_col: str | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """Single-source shortest paths (reference G5 surface,
    start_Pregel.py:202-206): edges(src, dst[, weight]) -> (id, dist).

    Bellman-Ford supersteps: relax all edges, keep the min per vertex.
    Unreachable vertices are absent from the result (the reference's
    Pregel stores +inf; filter semantics are cleaner relationally).
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("w")).localCheckpoint(eager=True)
    spark = edges.sparkSession

    def fp(df) -> tuple[int, int]:
        # cheap convergence fingerprint (count + xor of row hashes):
        # one aggregate per superstep instead of a join + count
        r = df.agg(
            F.count("*").alias("c"),
            F.coalesce(F.expr("bit_xor(xxhash64(id, dist))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(r["c"]), int(r["h"])

    dists = spark.createDataFrame([(source, 0.0)], "id long, dist double")
    prev = fp(dists)
    for _ in range(max_iter):
        relaxed = (
            e.join(dists.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        new_dists = (
            dists.unionByName(relaxed)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        cur = fp(new_dists)
        dists = new_dists
        if cur == prev:
            break
        prev = cur
    return dists


def _fp(df: DataFrame, cols: list[str]) -> tuple[DataFrame, tuple[int, int]]:
    """Eager localCheckpoint + (count, xor-hash) fingerprint in one job
    (cc._checkpoint_fp generalized to arbitrary key columns)."""
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("c"),
        F.coalesce(F.expr(f"bit_xor(xxhash64({', '.join(cols)}))"), F.lit(0)).alias("h"),
    )
    out = observed.localCheckpoint(eager=True)
    got = obs.get
    return out, (int(got["c"]), int(got["h"]))


def strongly_connected_components(edges: DataFrame, max_iter: int = 30) -> DataFrame:
    """SCC on a directed edges(src, dst) frame -> (id, scc); scc = min
    member id (the same canonical-id convention as connected_components).

    Completes the reference's Pregel algorithm catalog
    (arguments.py:176-188 lists 'scc'; the reference only launches it
    server-side — here it runs natively as the coloring algorithm of
    Orzan / FW-BW-style partitioning on DataFrames):

    per outer round over the not-yet-assigned subgraph:
      1. min-label FORWARD propagation to a fixpoint: color(v) = min id
         that reaches v (CC-shaped join+groupBy-min supersteps, map-side
         partial agg absorbs hot heads);
      2. roots = {v : color(v) = v}; SCC(root) = BACKWARD closure of the
         root along edges whose tail has the same color (a vertex both
         reached-by and reaching the root within its color class);
      3. assign, remove those vertices, repeat — each round settles at
         least every root's SCC, so rounds <= the longest SCC chain.

    Every superstep localCheckpoints with an Observation-fused
    convergence fingerprint (one job per superstep, lineage truncated) —
    the same scale discipline as cc.py.
    """
    e0 = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    verts = _vertices_of(edges).localCheckpoint(eager=True)
    spark = edges.sparkSession
    assigned = spark.createDataFrame([], "id long, scc long")
    remaining = verts
    e = e0
    for _outer in range(max_iter):
        if remaining.isEmpty():
            break
        # 1) forward min-color propagation on the remaining subgraph
        colors, prev = _fp(remaining.select("id", F.col("id").alias("color")), ["id", "color"])
        for _ in range(max_iter):
            contribs = (
                e.join(colors.select(F.col("id").alias("src"), "color"), "src")
                .groupBy("dst")
                .agg(F.min("color").alias("in_color"))
                .withColumnRenamed("dst", "id")
            )
            colors, cur = _fp(
                colors.join(contribs, "id", "left").select(
                    "id", F.least("color", F.coalesce("in_color", "color")).alias("color")
                ),
                ["id", "color"],
            )
            if cur == prev:
                break
            prev = cur
        # 2) backward closure of each root within its color class
        closure, prev = _fp(
            colors.filter(F.col("color") == F.col("id")).select("id", F.col("id").alias("root")),
            ["id", "root"],
        )
        tails = e.join(colors.select(F.col("id").alias("src"), F.col("color").alias("src_color")), "src")
        for _ in range(max_iter):
            preds = (
                tails.join(closure.select(F.col("id").alias("dst"), "root"), "dst")
                .filter(F.col("src_color") == F.col("root"))
                .select(F.col("src").alias("id"), "root")
            )
            closure, cur = _fp(closure.unionByName(preds).distinct(), ["id", "root"])
            if cur == prev:
                break
            prev = cur
        assigned = assigned.unionByName(
            closure.select("id", F.col("root").alias("scc"))
        ).localCheckpoint(eager=True)
        remaining = remaining.join(closure, "id", "left_anti").localCheckpoint(eager=True)
        done = closure.select(F.col("id").alias("gone"))
        e = (
            e.join(done.withColumnRenamed("gone", "src"), "src", "left_anti")
            .join(done.withColumnRenamed("gone", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    else:
        if not remaining.isEmpty():
            raise RuntimeError(f"scc did not settle within {max_iter} rounds")
    return assigned


def hits(edges: DataFrame, max_iter: int = 10) -> DataFrame:
    """HITS hubs/authorities (reference catalog 'hits',
    arguments.py:176-188) -> (id, hub, authority), L1-normalized
    (sum(hub) == sum(authority) == 1 each superstep).

    Power iteration: authority(v) = sum of hub over in-neighbors,
    hub(v) = sum of authority over out-neighbors, then L1 normalize —
    chosen over the usual L2 because plain sums replay exactly in the
    SQL oracle (no sqrt of a sum under reordered float addition).
    Fixed ``max_iter`` supersteps (no early exit) so the chained-CTE
    oracle replays the identical computation.  Each superstep is two
    join+groupBy-sum pairs (map-side partials absorb hub pages) and one
    Observation-fused checkpoint.
    """
    from pyspark.sql import Observation

    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    verts = _vertices_of(e).localCheckpoint(eager=True)
    n = verts.count()
    spark = edges.sparkSession
    if n == 0:
        return spark.createDataFrame([], "id long, hub double, authority double")
    scores = verts.select(
        "id", (F.lit(1.0) / n).alias("hub"), (F.lit(1.0) / n).alias("authority")
    )
    for _ in range(max_iter):
        auth = (
            e.join(scores.select(F.col("id").alias("src"), "hub"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("a_raw"))
            .withColumnRenamed("dst", "id")
        )
        hub = (
            e.join(auth.select(F.col("id").alias("dst"), "a_raw"), "dst")
            .groupBy("src")
            .agg(F.sum("a_raw").alias("h_raw"))
            .withColumnRenamed("src", "id")
        )
        raw = (
            verts.join(auth, "id", "left")
            .join(hub, "id", "left")
            .select(
                "id",
                F.coalesce("h_raw", F.lit(0.0)).alias("h_raw"),
                F.coalesce("a_raw", F.lit(0.0)).alias("a_raw"),
            )
        )
        obs = Observation()
        raw = raw.observe(
            obs, F.sum("h_raw").alias("hs"), F.sum("a_raw").alias("as_")
        ).localCheckpoint(eager=True)
        got = obs.get
        hs, as_ = float(got["hs"]), float(got["as_"])
        if hs == 0.0 or as_ == 0.0:
            break  # no edges touched: scores are already the fixpoint
        scores = raw.select(
            "id",
            (F.col("h_raw") / F.lit(hs)).alias("hub"),
            (F.col("a_raw") / F.lit(as_)).alias("authority"),
        )
    return scores.select("id", "hub", "authority")


def label_propagation(edges: DataFrame, max_iter: int = 10) -> DataFrame:
    """Synchronous LPA (reference catalog 'labelpropagation',
    arguments.py:176-188): each vertex adopts the min most-frequent
    neighbor label. Deterministic tie-break -> reproducible. Returns
    (id, label)."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    labels = _vertices_of(edges).select("id", F.col("id").alias("label"))
    for _ in range(max_iter):
        freq = (
            sym.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src", "label")
            .agg(F.count("*").alias("cnt"))
        )
        new_labels = (
            freq.groupBy("src")
            .agg(F.expr("min_by(label, struct(-cnt, label))").alias("label"))
            .withColumnRenamed("src", "id")
            .localCheckpoint(eager=True)
        )
        same = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "id")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if same == 0:
            break
    return labels
