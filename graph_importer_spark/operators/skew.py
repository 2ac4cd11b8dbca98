"""Explicit skew handling: salting helpers (north-rule requirement).

The reference acknowledges skew with its closed-form triangular work
split (clique_generator.py:216-229 'school math').  The graft's skew is
DATA skew — power-law entity keys (synth.py builds a u^3 head on
subjects deliberately).  Two standing mitigations:

1. AQE (session.py turns on adaptive skew-join + partition coalescing) —
   handles join-side skew at runtime with zero code.
2. Explicit salting below — for aggregations whose single hot key would
   still bottleneck one reducer, and for joins against dimensions too
   big to broadcast.

Salting an aggregation is two-phase: groupBy(key, salt) partial ->
groupBy(key) final.  For algebraic aggregates Spark's map-side partial
aggregation already does this implicitly; explicit salting matters for
collect_list/percentile-style holistic aggregates and for windowed
top-k where partitionBy(hot_key) cannot partial-aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "_salt") -> DataFrame:
    """Per-row salt in [0, buckets) from the row ORDINAL, never the row
    content: ``monotonically_increasing_id() mod buckets`` deals salts
    round-robin within every input partition, so a hot key's rows — even
    byte-identical duplicates, even a fact frame that contains ONLY the
    join key — spread across all ``buckets``.  (A content hash is
    degenerate exactly when salting matters: identical rows get identical
    salts, and a key-only frame gets a salt that is a pure function of
    the key, parking every row of the hot key on ONE reducer.)

    Determinism caveat: the ordinal is stable for a deterministic source
    (a parquet scan re-lists the same files in the same order) but a
    task retry after an upstream SHUFFLE may replay rows in a different
    order and re-deal the salts.  That is safe for every helper in this
    module — results never depend on WHICH bucket a row lands in, only
    that each row lands in exactly one — the same correctness argument
    Spark applies to round-robin repartition.
    """
    return df.withColumn(
        col_name, F.pmod(F.monotonically_increasing_id(), F.lit(buckets))
    )


def salted_count(df: DataFrame, key: str, buckets: int = 32) -> DataFrame:
    """Two-phase count by a (possibly hot) key. Equivalent to
    groupBy(key).count() but the first shuffle spreads each key over
    ``buckets`` reducers."""
    salted = with_salt(df, buckets)
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("c"))
    return partial.groupBy(key).agg(F.sum("c").alias("count"))


def salted_collect_set(df: DataFrame, key: str, value: str, buckets: int = 32) -> DataFrame:
    """Holistic aggregate (collect_set) with explicit salting — the case
    map-side partials don't cover."""
    salted = with_salt(df, buckets)
    partial = salted.groupBy(key, "_salt").agg(F.collect_set(value).alias("s"))
    return partial.groupBy(key).agg(
        F.array_distinct(F.flatten(F.collect_list("s"))).alias("values")
    )


def replicated_broadcast_join(
    facts: DataFrame, dim: DataFrame, key: str, how: str = "inner"
) -> DataFrame:
    """Skew-proof fact-dim join: broadcast the dim.  Zero shuffle on the
    fact side, so key skew is irrelevant.  This IS the default plan for
    the gazetteer joins; kept as a named helper so call sites document
    intent."""
    return facts.join(F.broadcast(dim), key, how)


def salted_join_big_skewed(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join for a dimension too big to broadcast when the
    fact side has hot keys: facts get a random-ish salt, the dim is
    replicated ``buckets`` times with every salt value, and the join key
    becomes (key, salt) — each hot key now lands on ``buckets`` reducers.

    Cost: dim inflated x buckets (why broadcast wins when it fits).
    AQE's skew-join split usually makes this unnecessary; provided for
    the cases AQE can't split (e.g. followed by a merge-sensitive op).
    """
    salted_facts = with_salt(facts, buckets)
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted_facts.join(replicated_dim, [key, "_salt"], how)
    return out.drop("_salt")
