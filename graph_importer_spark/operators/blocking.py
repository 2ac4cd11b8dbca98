"""Sorted-neighborhood blocking for entity resolution.

The classic ER candidate generator (Hernandez & Stolfo, SIGMOD'95):
sort all records by a blocking key and pair every record with the next
``window - 1`` records in the total order.  In the KG pipeline this is
the mention/alias-matching counterpart to the dedup blockers: where
MinHash-LSH blocks on content, sorted-neighborhood blocks on a
domain-provided key (name, normalized alias), catching near-misses that
token blocking splits.

Scale shape — a global sort order WITHOUT a single-partition window:
* ``Window.orderBy(key)`` with no partition key collapses to one task;
  instead ranks come from the two-phase distributed rank: an
  order-preserving coarse bucket (caller-supplied ``bucket``
  expression: b(k1) < b(k2) whenever k1 < k2 across buckets), per-bucket
  counts collected as driver metadata (<= thousands of rows), exclusive
  prefix sums broadcast back, and ``row_number`` partitioned BY BUCKET
  (parallel) plus the bucket offset = exact global rank.
* Pairing is one equi-join: the left side explodes each record into
  ``window - 1`` probe ranks (rank + 1 .. rank + w - 1) and joins on
  rank — linear output, no range predicate, AQE-friendly.
* Ties in the key are broken by the id column so the order (and the
  emitted pair set) is deterministic and replayable in SQL
  (ROW_NUMBER() OVER (ORDER BY key, id)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    key_col: str,
    id_col: str,
    bucket: Column,
    rank_col: str = "rank",
) -> DataFrame:
    """Exact 1-based global rank of rows ordered by (key, id), computed
    without a single-partition window.  ``bucket`` must be an
    order-preserving coarsening of ``key_col`` (prefix, truncation,
    range bucket): every key in a smaller bucket sorts before every key
    in a larger one."""
    b = df.withColumn("_bkt", bucket)
    counts = b.groupBy("_bkt").agg(F.count("*").alias("_n"))
    rows = sorted(counts.collect(), key=lambda r: r["_bkt"])
    offsets, acc = [], 0
    for r in rows:  # driver metadata: one row per bucket
        offsets.append((r["_bkt"], acc))
        acc += r["_n"]
    off = df.sparkSession.createDataFrame(offsets, ["_bkt", "_off"])
    w = Window.partitionBy("_bkt").orderBy(F.col(key_col).asc(), F.col(id_col).asc())
    return (
        b.join(F.broadcast(off), "_bkt")
        .withColumn(rank_col, F.row_number().over(w) + F.col("_off"))
        .drop("_bkt", "_off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    bucket: Column,
    window: int = 3,
) -> DataFrame:
    """-> (a, b, dist): candidate pairs of ids whose global sort
    positions (by key, ties by id) differ by 1 .. window-1; ``a`` is the
    earlier record, ``dist`` the rank gap."""
    if window < 2:
        raise ValueError("window must be >= 2")
    ranked = global_rank(
        df.select(id_col, key_col), key_col, id_col, bucket
    ).localCheckpoint(eager=True)  # rank once, probe once
    probes = ranked.select(
        F.col(id_col).alias("a"),
        F.explode(F.sequence(F.lit(1), F.lit(window - 1))).alias("dist"),
        F.col("rank"),
    ).withColumn("rank", F.col("rank") + F.col("dist"))
    return probes.join(
        ranked.select(F.col(id_col).alias("b"), "rank"), "rank"
    ).select("a", "b", "dist")


def token_blocks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_block: int | None = 1000,
) -> DataFrame:
    """Token blocking (the ER baseline blocker): every lowercased
    alphanumeric token of ``text_col`` is a block key; a record joins
    every block its tokens name.  -> (token, id).

    ``max_block`` drops boilerplate blocks (stopword-like tokens shared
    by a large fraction of the corpus) — the standard block-purging
    step; at web scale the top tokens are Zipf-heavy and would
    otherwise drive the pair join quadratic.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.split(F.lower(F.regexp_replace(text_col, r"[^A-Za-z0-9]+", " ")), r"\s+")
            )
        ).alias("token"),
    ).filter(F.col("token") != "")
    if max_block is None:
        return toks
    sizes = toks.groupBy("token").agg(F.count("*").alias("_n"))
    return (
        toks.join(sizes.filter(F.col("_n") <= max_block), "token")
        .drop("_n")
    )


def meta_blocking_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_block: int | None = 1000,
) -> DataFrame:
    """Meta-blocking with weighted edge pruning (Papadakis et al.,
    TKDE 2013): build the block graph from token blocking, weight every
    candidate pair by CBS (Common Blocks Scheme = number of shared
    blocks), and keep the pairs whose weight strictly exceeds the mean
    edge weight — discarding the long tail of coincidental single-token
    collisions that dominates token blocking's candidate set.

    -> (a, b, w) with a < b, w = shared-block count > global mean.

    Scale shape: block-keyed self-join (capped by ``max_block`` so no
    block goes quadratic), pair-keyed count aggregate (map-side
    partials — the pair key is fine-grained), and the mean is ONE
    scalar aggregate broadcast back as a 1-row cross join.  This is
    the published algorithm's MapReduce shape (Efthymiou et al.,
    "Parallel meta-blocking", Big Data 2015): no windows, no
    driver-side pair loops.
    """
    blocks = token_blocks(df, id_col, text_col, max_block)
    x = blocks.select("token", F.col("id").alias("a"))
    y = blocks.select("token", F.col("id").alias("b"))
    pairs = (
        x.join(y, "token")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("w"))
    )
    mean_w = pairs.agg(F.avg("w").alias("_mean"))
    return (
        pairs.crossJoin(F.broadcast(mean_w))
        .filter(F.col("w") >= F.col("_mean"))
        .drop("_mean")
    )


def blocking_quality(
    cand: DataFrame,
    gold: DataFrame,
    n_records: int,
    decimals: int = 6,
) -> DataFrame:
    """Blocking-scheme quality metrics (Christen, TKDE 2012 survey):
    pair completeness PC = |cand ∩ gold| / |gold| (the recall a
    downstream matcher can at best achieve) and reduction ratio
    RR = 1 - |cand| / C(n, 2) (how much of the quadratic comparison
    space the blocker pruned).  The two-number summary every blocker
    (token / sorted-neighborhood / meta-blocking) is tuned by.

    Both inputs are unordered pairs; any (a, b) orientation is
    accepted and canonicalized.  -> one row
    (n_cand, n_gold, n_true, pair_completeness, reduction_ratio).

    Scale shape: two canonicalize+distinct passes, one pair-keyed
    semi-join for the intersection, three scalar counts.  The pair
    key is fine-grained; nothing is collected.
    """
    if n_records < 2:
        raise ValueError("n_records must be >= 2")

    def _canon(df: DataFrame) -> DataFrame:
        return df.select(
            F.least(F.col("a"), F.col("b")).alias("a"),
            F.greatest(F.col("a"), F.col("b")).alias("b"),
        ).distinct()

    c, g = _canon(cand), _canon(gold)
    tp = c.join(g, ["a", "b"], "left_semi")
    total = n_records * (n_records - 1) // 2
    return (
        c.agg(F.count("*").alias("n_cand"))
        .crossJoin(g.agg(F.count("*").alias("n_gold")))
        .crossJoin(tp.agg(F.count("*").alias("n_true")))
        .select(
            "n_cand",
            "n_gold",
            "n_true",
            F.round(F.col("n_true") / F.col("n_gold"), decimals).alias(
                "pair_completeness"
            ),
            F.round(
                F.lit(1.0) - F.col("n_cand") / F.lit(float(total)), decimals
            ).alias("reduction_ratio"),
        )
    )


def soundex_key(name: Column | str) -> Column:
    """Simplified American Soundex blocking key (H/W treated as
    vowels — the one documented deviation from the archival standard,
    which lets the collapse step stay a backreference-free replace
    chain both engines evaluate identically; RE2 has no backrefs).

    Steps: strip non-letters, uppercase; translate letters to digit
    codes (vowels/H/W/Y -> 0); collapse adjacent equal digits
    (repeated two-char replaces — closed after ceil(log2(len))
    passes); drop the first code (it belongs to the kept letter);
    strip zeros; first letter + first 3 digits, zero-padded.
    """
    n = F.col(name) if isinstance(name, str) else name
    u = F.upper(F.regexp_replace(n, "[^A-Za-z]", ""))
    digits = F.translate(
        u,
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
        "01230120022455012623010202",
    )
    collapsed = digits
    for _ in range(5):  # handles runs up to 2^5 per pass pair
        for d in "123456":
            collapsed = F.regexp_replace(collapsed, d + d, d)
    tail = F.regexp_replace(F.substring(collapsed, 2, 1 << 20), "0", "")
    return F.when(u == "", F.lit(None).cast("string")).otherwise(
        F.concat(F.substring(u, 1, 1), F.rpad(F.substring(tail, 1, 3), 3, "0"))
    )
