"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-dependent on partitioning (per-partition RNG
streams), so a repartition silently changes the sample — useless for
reproducible corpus construction at 10^12 rows.  Both operators here
key the decision on the row's own id through the same multiplicative-
congruential hash the generators use (operators/generators.py:35-36):
pure int64 expressions, partition-invariant, SQL-replayable, and
filter-pushdown-friendly (the predicate reaches the parquet scan).

The reference's Bernoulli trials (clique_generator.py:62-66
``random.random() < prob``) are the same idea made reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graph_importer_spark.operators.generators import _A, _M


def hash_unit(key: Column | str, seed: int = 42) -> Column:
    """Congruential hash of an int64 key onto [0, 1) — the shared
    sampling coin.  ((key % M) * A + seed) % M / M."""
    k = F.col(key) if isinstance(key, str) else key
    return (
        F.pmod(F.pmod(k, F.lit(_M)) * F.lit(_A) + F.lit(seed), F.lit(_M)).cast("double")
        / F.lit(float(_M))
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep rows whose hash coin < fraction — a deterministic Bernoulli
    sample at exactly-reproducible membership (same rows at any
    partitioning, any cluster size, any day)."""
    return df.filter(hash_unit(key_col, seed) < fraction)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downsample boilerplate
    languages, keep all rare ones).  The rate table is a broadcast map
    baked into the predicate as a CASE expression — no join, no
    shuffle; strata missing from ``fractions`` get ``default_fraction``.
    """
    rate = F.lit(default_fraction)
    for value, frac in sorted(fractions.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(frac)).otherwise(rate)
    return df.filter(hash_unit(key_col, seed) < rate)
