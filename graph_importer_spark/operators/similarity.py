"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the correctness baseline: cross join of
  queries x corpus with JVM higher-order functions (zip_with +
  aggregate) for the dot product, window top-k.  Queries side is small
  and broadcast, so the 'cross' is a broadcast nested loop over one
  corpus scan — linear in corpus size, embarrassingly parallel.
* LSH-bucketed ANN — a scale path: random-hyperplane signatures
  (deterministic LCG hyperplanes, replayable in SQL), candidates from
  same-bucket equi-join, exact re-rank inside buckets.  Recall traded
  for touching ~1/2^bits of the corpus per query.
* IVF-bucketed ANN — the second scale path (coarse-quantizer inverted
  lists, the FAISS IVF-Flat shape): centroids are a deterministic
  hash-sample of corpus vectors (k-means float averaging is not
  cross-engine replayable and a sampled coarse quantizer is the
  standard bootstrap at scale), each corpus vector is assigned to its
  nearest centroid in ONE broadcast aggregate pass, and a query probes
  its ``nprobe`` nearest lists — touching ~nprobe/n_centroids of the
  corpus via a plain equi-join on list id.

No Python UDFs anywhere: at 10^9 vectors the dot product must stay in
codegen; a Pandas-UDF variant benched ~6x slower at 64 dims (Arrow
serialization dominates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_M = 1000003
_A = 2654435761


def dot(v1: str | Column, v2: str | Column) -> Column:
    return F.aggregate(
        F.zip_with(v1, v2, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(v: str | Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: (x * x).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def with_norm(
    emb: DataFrame, id_col: str, vec_col: str, id_as: str, vec_as: str, norm_as: str
) -> DataFrame:
    return emb.select(
        F.col(id_col).alias(id_as),
        F.col(vec_col).alias(vec_as),
        norm(F.col(vec_col)).alias(norm_as),
    )


def cosine(v1, v2, n1, n2) -> Column:
    d = dot(v1, v2)
    denom = F.col(n1) * F.col(n2)
    return F.when(denom == 0, F.lit(0.0)).otherwise(d / denom)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For each query vector: top-k corpus neighbors by cosine
    (excluding self). Returns (query_id, neighbor_id, cosine, rank).

    Ties broken by neighbor id (deterministic)."""
    c = with_norm(corpus, id_col, vec_col, "neighbor_id", "cv", "cn")
    q = with_norm(queries, id_col, vec_col, "query_id", "qv", "qn")
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("qv", "cv", "qn", "cn"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane(bit: int, dim_idx: Column, seed: int) -> Column:
    """Deterministic pseudo-random hyperplane component in {-1, +1}."""
    u = F.pmod(
        F.pmod(dim_idx + F.lit(bit * 7919), F.lit(_M)) * F.lit(_A) + F.lit(seed),
        F.lit(_M),
    )
    return F.when(u < _M // 2, F.lit(-1.0)).otherwise(F.lit(1.0))


def lsh_signature(vec_col: str | Column, n_bits: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane signature: bit b = sign(v . h_b). Returns int."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    sig = F.lit(0)
    for b in range(n_bits):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(F.sequence(F.lit(0), F.size(v) - 1), lambda i: _hyperplane(b, i, seed)),
                lambda x, h: (x * h).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig


def default_n_centroids(n_vectors: int) -> int:
    """The FAISS IVF rule of thumb as code: C = max(8, floor(sqrt(n))).

    Keeps expected inverted-list size ~sqrt(n), so the within-list work
    (SemDeDup pair join, ANN probe re-rank) grows as n^1.5 rather than
    collapsing to all-pairs when a fixed small C meets a large corpus."""
    return max(8, int(n_vectors**0.5))


def ivf_centroids(
    corpus_normed: DataFrame, n_centroids: int = 8, seed: int = 42
) -> DataFrame:
    """Deterministic coarse quantizer: the ``n_centroids`` corpus
    vectors whose congruential id-hash is smallest (ties by id).

    At 10^9 rows this is a TakeOrderedAndProject (per-partition top-n,
    driver merge) — no global sort shuffle.  Expects the
    (neighbor_id, cv, cn) frame produced by ``with_norm``."""
    h = F.pmod(
        F.pmod("neighbor_id", F.lit(_M)) * F.lit(_A) + F.lit(seed), F.lit(_M)
    )
    return (
        corpus_normed.orderBy(h.asc(), F.col("neighbor_id").asc())
        .limit(n_centroids)
        .select(
            F.col("neighbor_id").alias("centroid_id"),
            F.col("cv").alias("pv"),
            F.col("cn").alias("pn"),
        )
    )


def ivf_assign(corpus_normed: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign each corpus vector to its nearest centroid's inverted
    list: (neighbor_id, cv, cn, list_id).

    One corpus scan + one hash aggregate: the centroid set is broadcast
    and ``max_by`` is algebraic (map-side partials), so there is no
    window sort-shuffle over the corpus.  Assignment similarity rounds
    to 6dp with centroid-id tie-break — bit-replayable in SQL."""
    sim = F.round(cosine("cv", "pv", "cn", "pn"), 6)
    return (
        corpus_normed.crossJoin(F.broadcast(cents))
        .withColumn("sim", sim)
        .groupBy("neighbor_id")
        .agg(
            F.first("cv").alias("cv"),
            F.first("cn").alias("cn"),
            F.expr("max_by(centroid_id, struct(sim, -centroid_id))").alias("list_id"),
        )
    )


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int | None = None,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-Flat ANN: assign corpus vectors to inverted lists by nearest
    centroid, probe the query's ``nprobe`` nearest lists, exact cosine
    re-rank inside.  Returns (query_id, neighbor_id, cosine, rank).

    Scale shape at 10^9 vectors: the centroid set is tiny and
    broadcast; assignment is one corpus scan + one hash aggregate
    (max_by is algebraic -> map-side partials, no window sort-shuffle
    over the corpus); probing touches ~nprobe/n_centroids of the corpus
    through a broadcast equi-join on list id.  Each corpus vector lives
    in exactly one list, so probed candidates are never duplicated.
    Assignment similarity is rounded to 6dp with centroid-id tie-break
    — deterministic and bit-replayable in SQL (the DuckDB oracle
    replays centroid sampling, assignment and probing).

    ``n_centroids=None`` (the default) derives max(8, floor(sqrt(n)))
    from one corpus count — the FAISS IVF rule of thumb as code, so a
    caller who forgets the knob at 10^9 vectors gets ~sqrt(n) lists of
    ~sqrt(n) vectors, not 8 lists of n/8.  Pass an explicit value to
    skip the count job."""
    c = with_norm(corpus, id_col, vec_col, "neighbor_id", "cv", "cn")
    if n_centroids is None:
        c = c.persist()
        n_centroids = default_n_centroids(c.count())
    cents = ivf_centroids(c, n_centroids, seed).localCheckpoint(eager=True)
    assigned = ivf_assign(c, cents)
    q = with_norm(queries, id_col, vec_col, "query_id", "qv", "qn")
    qsim = F.round(cosine("qv", "pv", "qn", "pn"), 6)
    pw = Window.partitionBy("query_id").orderBy(F.desc("psim"), F.asc("centroid_id"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("psim", qsim)
        .withColumn("prn", F.row_number().over(pw))
        .filter(F.col("prn") <= nprobe)
        .select("query_id", "qv", "qn", F.col("centroid_id").alias("list_id"))
    )
    scored = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("qv", "cv", "qn", "cn"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """ANN: candidates share the LSH bucket, exact cosine re-rank inside.

    At 10^9 vectors: corpus signatures are computed once and persisted;
    query->bucket is an equi-join touching ~n/2^bits of the corpus.
    Recall < 1 by construction (bucket boundary misses) — measure with
    ``similarity_recall(ann_result, cosine_topk(...))`` on a sample;
    measured numbers for the testdata embeddings are pinned in SCALE.md
    and asserted in tests/test_operators.py.
    """
    c = with_norm(corpus, id_col, vec_col, "neighbor_id", "cv", "cn").withColumn(
        "bucket", lsh_signature("cv", n_bits, seed)
    )
    q = with_norm(queries, id_col, vec_col, "query_id", "qv", "qn").withColumn(
        "bucket", lsh_signature("qv", n_bits, seed)
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("qv", "cv", "qn", "cn"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def similarity_recall(
    ann: DataFrame, exact: DataFrame, k: int | None = None
) -> float:
    """recall@k of an ANN result against the exact brute-force top-k:
    |ANN ∩ exact| / |exact| over (query_id, neighbor_id) pairs.

    ``ann`` and ``exact`` are both (query_id, neighbor_id, cosine, rank)
    frames as returned by ``ann_topk_lsh`` / ``ann_topk_ivf`` /
    ``cosine_topk``; pass ``k`` to truncate both sides to rank <= k
    first (defaults to whatever ranks the inputs carry).  One semi-join
    + two counts on frames of (n_queries x k) rows — evaluation cost is
    independent of corpus size, which is what makes it runnable as a
    sampled quality probe next to a 10^9-vector index build.
    """
    if k is not None:
        ann = ann.filter(F.col("rank") <= k)
        exact = exact.filter(F.col("rank") <= k)
    truth = exact.select("query_id", "neighbor_id").persist()
    denom = truth.count()
    if denom == 0:
        return 1.0
    hits = (
        ann.select("query_id", "neighbor_id")
        .join(truth, ["query_id", "neighbor_id"], "left_semi")
        .count()
    )
    return hits / denom


def pair_recall(found: DataFrame, truth: DataFrame) -> float:
    """Recall of a candidate PAIR set against a ground-truth pair set
    (both (id1, id2) with id1 < id2) — the SemDeDup / LSH-vs-brute
    near-dup quality probe.  Same semi-join shape as
    ``similarity_recall``; pairs are tiny relative to the corpus."""
    t = truth.select("id1", "id2").persist()
    denom = t.count()
    if denom == 0:
        return 1.0
    hits = (
        found.select("id1", "id2").join(t, ["id1", "id2"], "left_semi").count()
    )
    return hits / denom


def kmeans_train(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int = 2,
    seed: int = 42,
    decimals: int = 6,
) -> DataFrame:
    """Lloyd k-means refinement of the deterministic ``ivf_centroids``
    init -> trained centroids (centroid_id, pv array<double>, pn).

    This upgrades the IVF family from hash-sampled to TRAINED coarse
    quantizers (the `ivf_centroids` docstring's "swap in trained
    centroids" path) while keeping every step oracle-replayable:

    * assignment uses the exact ``ivf_assign`` rule (cosine rounded to
      ``decimals``, ties to the smaller centroid id);
    * the update is a per-(cluster, dimension) MEAN — posexplode +
      partial-agg, so a hot cluster's vectors are averaged map-side,
      never collected — rounded to ``decimals`` so the next round's
      distances are a pure function of rounded values;
    * empty clusters keep their previous centroid (no resampling —
      determinism over textbook-variant rescue heuristics).

    Scale shape per iteration: one corpus scan (broadcast-centroid
    assignment, algebraic max_by — no window) + one (cluster, dim)
    aggregate of bounded output (k x dim rows) + a k-row centroid
    rebuild; the corpus never shuffles.  Driver loop of ``iters``
    rounds with per-round localCheckpoint, same discipline as the
    Pregel catalog.
    """
    normed = with_norm(corpus, id_col, vec_col, "neighbor_id", "cv", "cn")
    cents = ivf_centroids(normed, k, seed)
    # pv to double so iteration-0 (corpus floats) and iteration-n
    # (rounded double means) flow through one code path
    cents = cents.select(
        "centroid_id",
        F.transform("pv", lambda x: x.cast("double")).alias("pv"),
        "pn",
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        assigned = ivf_assign(normed, cents)
        means = (
            assigned.select("list_id", F.posexplode("cv").alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(F.round(F.avg("val"), decimals).alias("m"))
            .groupBy("list_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("newv")
            )
        )
        cents = (
            cents.join(
                means.withColumnRenamed("list_id", "centroid_id"),
                "centroid_id",
                "left",
            )
            .select(
                "centroid_id",
                F.coalesce("newv", "pv").alias("pv"),
            )
            .select("centroid_id", "pv", norm(F.col("pv")).alias("pn"))
            .localCheckpoint(eager=True)
        )
    return cents


def kmeans_centroid_dims(cents: DataFrame) -> DataFrame:
    """Trained centroids exploded to (centroid_id, pos, val) rows —
    the narrow, scalar form oracles and catalogs store."""
    return cents.select(
        "centroid_id", F.posexplode("pv").alias("pos", "val")
    )


def cosine_prefix_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
    decimals: int = 6,
) -> DataFrame:
    """EXACT cosine similarity join over TF-IDF document vectors via
    symmetric prefix filtering (Bayardo, Ma & Srikant, WWW'07 "Scaling
    up all pairs similarity search"; Chaudhuri et al. ICDE'06) — the
    sparse-vector complement of the set-Jaccard prefix_filter_pairs
    and the lexical complement of the embedding ANN family.

    Weights: w = tf * ln(1 + N/df) over dedup-normal-form whitespace
    tokens, L2-normalized per doc.  Tokens take the canonical global
    order (ascending df, ties by token).  A doc INDEXES its token at
    position i iff the L2 norm of its suffix from i is >= t; if unit
    vectors x, y have cos >= t, their FIRST common token in canonical
    order is indexed by BOTH (were it unindexed in x, every common
    token would sit in a suffix of x with norm < t, so
    cos <= ||x_suffix|| * ||y|| < t) — the index-index equi-join is a
    COMPLETE candidate generator; candidates verify with the exact dot
    product.  Returns (id1, id2, cosine >= t, rounded).

    Determinism: per-doc norms and the verification dot fold
    LEFT-TO-RIGHT over the canonically sorted token array
    (F.aggregate), so every emitted double is a fixed-order sum —
    partition-invariant and replayable bit-for-bit by a SQL engine
    folding the same order (the repo's oracle convention).  Zero terms
    for tokens absent from the partner doc add exactly 0.0 and leave
    the fold unchanged.

    Scale shape: tf/df are keyed aggregates (map-side partial) over
    integer counts (order-insensitive); the per-doc token array is
    bounded by doc length; the suffix gate is a PER-DOC running window
    (fine-grained partition key); the candidate join keys on the
    rarest tokens by construction (rare-first canonical order pushes
    high-df boilerplate into the norm-gated tail); verification dots
    each candidate against a bounded token->weight map JVM-side — no
    second corpus-wide shuffle.  N rides along as a broadcast 1-row
    total.
    """
    from graph_importer_spark.operators.textstats import normalize_text

    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("docfreq"))
    ndocs = df.select(F.countDistinct(id_col).alias("_n"))
    # per-doc array in canonical order (df asc, token asc) — ints only,
    # so the sort and everything derived from it is deterministic
    arr = (
        tf.join(dfreq, "token")
        .groupBy("_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("docfreq", "token", "tf"))
            ).alias("ts")
        )
        .crossJoin(F.broadcast(ndocs))
    )
    w_of = lambda s: s.getField("tf").cast("double") * F.log(  # noqa: E731
        F.lit(1.0) + F.col("_n").cast("double") / s.getField("docfreq")
    )
    norm = F.sqrt(
        F.aggregate(
            F.col("ts"), F.lit(0.0), lambda acc, s: acc + w_of(s) * w_of(s)
        )
    )
    docs = (
        arr.withColumn(
            "vec",
            F.transform(
                "ts",
                lambda s: F.struct(
                    s.getField("docfreq").alias("docfreq"),
                    s.getField("token").alias("token"),
                    (w_of(s) / norm).alias("wn"),
                ),
            ),
        )
        .select("_id", "vec")
        # shared by the index and verify sides; lazy so plan
        # construction runs no jobs
        .localCheckpoint(eager=False)
    )
    flat = docs.select(
        "_id", F.posexplode("vec").alias("_pos", "s")
    ).select(
        "_id", "_pos",
        F.col("s.token").alias("token"),
        F.col("s.wn").alias("wn"),
    )
    run = Window.partitionBy("_id").orderBy("_pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # unit vector: suffix_sq from position i = 1 - prefix_sq before i
    suffix_sq = F.lit(1.0) - (
        F.sum(F.col("wn") * F.col("wn")).over(run) - F.col("wn") * F.col("wn")
    )
    indexed = flat.withColumn("_sfx", suffix_sq).filter(
        F.col("_sfx") >= F.lit(threshold * threshold - 1e-9)
    )
    cand = (
        indexed.select(F.col("_id").alias("id1"), "token")
        .join(indexed.select(F.col("_id").alias("id2"), "token"), "token")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    bmap = docs.select(
        F.col("_id").alias("id2"),
        F.map_from_entries(
            F.transform("vec", lambda s: F.struct(s.getField("token"), s.getField("wn")))
        ).alias("vb"),
    )
    # fold in doc-a's canonical order; absent partner tokens add 0.0
    dot = F.aggregate(
        F.col("va"),
        F.lit(0.0),
        lambda acc, s: acc
        + s.getField("wn")
        * F.coalesce(
            F.element_at(F.col("vb"), s.getField("token")), F.lit(0.0)
        ),
    )
    return (
        cand.join(docs.select(F.col("_id").alias("id1"), F.col("vec").alias("va")), "id1")
        .join(bmap, "id2")
        .withColumn("_dot", dot)
        .filter(F.col("_dot") >= threshold)
        .select("id1", "id2", F.round("_dot", decimals).alias("cosine"))
    )


def lsh_projections(
    vec_col: str | Column, n_bits: int = 8, seed: int = 42
) -> Column:
    """Per-bit hyperplane projections (array<double>) — the margins
    behind ``lsh_signature``'s sign bits; multi-probe uses them to
    rank which bits are least confident."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col

    # NB: a two-arg lambda passed to F.transform receives
    # (element, index) — binding the bit via a default arg would be
    # silently shadowed by the array index, so close over it instead
    def _plane(bit: int):
        return lambda i: _hyperplane(bit, i, seed)

    return F.array(
        *[
            F.aggregate(
                F.zip_with(
                    v,
                    F.transform(
                        F.sequence(F.lit(0), F.size(v) - 1), _plane(b)
                    ),
                    lambda x, h: (x * h).cast("double"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for b in range(n_bits)
        ]
    )


def ann_topk_lsh_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    n_probes: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Multi-probe LSH ANN (Lv et al. VLDB'07): each query probes its
    own bucket PLUS the buckets reached by flipping its
    ``n_probes - 1`` least-confident signature bits (smallest
    |projection| margin, ties to the lower bit) — the published recall
    repair for hyperplane LSH without adding tables.

    Determinism: margins round to 6dp and order via a printf string
    key, so the flipped-bit choice replays in SQL; everything else is
    the ann_topk_lsh plan.

    Scale shape: identical to ann_topk_lsh with the QUERY side (the
    broadcast side) fanned out x n_probes — the corpus is still probed
    by bucket equi-join, touching ~n_probes * n/2^bits rows.  The
    margin expressions re-evaluate per reference on the interpreted
    HOF path; that cost lives on the tiny query side only.
    """
    c = with_norm(corpus, id_col, vec_col, "neighbor_id", "cv", "cn").withColumn(
        "bucket", lsh_signature("cv", n_bits, seed)
    )
    q0 = with_norm(queries, id_col, vec_col, "query_id", "qv", "qn")
    projs = lsh_projections("qv", n_bits, seed)
    sig = lsh_signature("qv", n_bits, seed)
    keys = F.sort_array(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_bits - 1)),
            lambda b: F.concat(
                F.format_string(
                    "%012.6f", F.round(F.abs(F.element_at(projs, b + 1)), 6)
                ),
                F.lit("|"),
                F.lpad(b.cast("string"), 2, "0"),
            ),
        )
    )
    flips = F.transform(
        F.slice(keys, 1, n_probes - 1),
        lambda s: F.substring(s, -2, 2).cast("int"),
    )
    probes = F.concat(
        F.array(sig),
        F.transform(
            # shiftleft needs a literal bit count; 2^b via pow is exact
            # for b < 31 and keeps the flip a pure column expression
            flips,
            lambda b: sig.bitwiseXOR(F.pow(F.lit(2.0), b).cast("int")),
        ),
    )
    q = q0.select(
        "query_id", "qv", "qn", F.explode(probes).alias("bucket")
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("qv", "cv", "qn", "cn"), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def truncation_recall(
    corpus: DataFrame,
    queries: DataFrame,
    trunc_dims: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Matryoshka-style truncation audit: recall@k of brute-force
    cosine top-k computed on the FIRST ``trunc_dims`` dimensions
    against the full-dimension top-k — the measurement that licenses
    serving shorter vectors (Kusupati et al. 2022's MRL eval,
    representation-agnostic form).

    -> one row per query (query_id, k, n_hit, recall).

    Scale shape: two cosine_topk runs (each one corpus scan with the
    broadcast query side) + a per-query semi-join on the <= k-row
    result sets.
    """
    full = cosine_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col)
    tcorpus = corpus.select(
        F.col(id_col),
        F.slice(F.col(vec_col), 1, trunc_dims).alias(vec_col),
    )
    tqueries = queries.select(
        F.col(id_col),
        F.slice(F.col(vec_col), 1, trunc_dims).alias(vec_col),
    )
    trunc = cosine_topk(
        tcorpus, tqueries, k=k, id_col=id_col, vec_col=vec_col
    )
    hit = trunc.join(
        full.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_semi",
    )
    per = hit.groupBy("query_id").agg(F.count("*").alias("n_hit"))
    base = full.groupBy("query_id").agg(F.count("*").alias("_nk"))
    return base.join(per, "query_id", "left").select(
        "query_id",
        F.col("_nk").alias("k"),
        F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        F.round(
            F.coalesce("n_hit", F.lit(0)) / F.col("_nk"), decimals
        ).alias("recall"),
    )


def knn_label_agreement(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    decimals: int = 6,
) -> DataFrame:
    """k-NN label-agreement audit (the Confident-Learning-lite label-
    noise detector): for every vector, the fraction of its k nearest
    cosine neighbors sharing its label — rows whose neighborhoods
    vote against them are the mislabel candidates a data-centric
    cleanup reviews first.

    -> (id, label, n_neighbors, n_agree, agreement, is_suspect)
    with is_suspect = agreement < 0.5 (strict minority).

    Scale shape: brute cosine_topk over the full set (every row is a
    query — the O(n²) labeled-baseline regime; swap ann_topk_ivf in
    for the probe at scale, same downstream plan) + one broadcast
    label join + a per-id aggregate.
    """
    top = cosine_topk(emb, emb, k=k, id_col=id_col, vec_col=vec_col)
    labels = emb.select(
        F.col(id_col).alias("_lid"), F.col(label_col).alias("_lbl")
    )
    j = (
        top.join(
            F.broadcast(labels.select(F.col("_lid").alias("query_id"),
                                      F.col("_lbl").alias("_ql"))),
            "query_id",
        )
        .join(
            F.broadcast(labels.select(F.col("_lid").alias("neighbor_id"),
                                      F.col("_lbl").alias("_nl"))),
            "neighbor_id",
        )
    )
    per = j.groupBy("query_id", "_ql").agg(
        F.count("*").alias("n_neighbors"),
        F.sum((F.col("_nl") == F.col("_ql")).cast("bigint")).alias("n_agree"),
    )
    agreement = F.round(F.col("n_agree") / F.col("n_neighbors"), decimals)
    return per.select(
        F.col("query_id").alias("id"),
        F.col("_ql").alias("label"),
        "n_neighbors",
        "n_agree",
        agreement.alias("agreement"),
        (agreement < 0.5).alias("is_suspect"),
    )
