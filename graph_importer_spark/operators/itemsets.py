"""Frequent-itemset / association-rule mining (A-priori 2-itemsets).

Market-basket analysis over (basket, item) pairs — the co-purchase
signal a recommendation or substitution pipeline starts from, and the
same shape as entity co-occurrence mining over (document, entity).

Reference scope note: the reference's only pairing operator is the
clique generator's all-pairs loop (clique_generator.py:19-57); this is
the data-driven analogue with support thresholds.

Scale shape: one basket-keyed self-join produces candidate pairs — the
classic O(Σ basket_size²) bound, so ``max_item_freq`` (the A-priori
frequent-item prune inverted: drop items too COMMON to be informative)
caps the blow-up exactly like the dedup family's ``max_df``; pair
counting partial-aggregates on the (a, b) key; item supports and the
basket total join back as broadcast-sized tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_item_freq: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Association rules over item pairs: for each unordered pair
    (a < b) co-occurring in at least ``min_support`` baskets:
    support = n_ab / n_baskets, both directed confidences, and lift.

    ``max_item_freq`` drops items appearing in more than that many
    baskets BEFORE pairing (stated df-cap approximation — ubiquitous
    items pair with everything and say nothing).

    -> (a, b, n_ab, n_a, n_b, n_baskets, support, conf_a_b, conf_b_a,
       lift).
    """
    bi = (
        baskets.select(
            F.col(basket_col).alias("_bk"), F.col(item_col).alias("_it")
        )
        .distinct()
    )
    freq = bi.groupBy("_it").agg(F.count("*").alias("_n"))
    if max_item_freq is not None:
        hot = freq.filter(F.col("_n") > max_item_freq).select("_it")
        bi = bi.join(F.broadcast(hot), "_it", "left_anti")
        freq = freq.filter(F.col("_n") <= max_item_freq)
    total = bi.select("_bk").distinct().groupBy().agg(
        F.count("*").alias("n_baskets")
    )
    x = bi.select(F.col("_bk").alias("b"), F.col("_it").alias("a"))
    y = bi.select(F.col("_bk").alias("b"), F.col("_it").alias("bb"))
    pairs = (
        x.join(y, "b")
        .filter(F.col("a") < F.col("bb"))
        .groupBy("a", F.col("bb").alias("b"))
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    fa = freq.select(F.col("_it").alias("a"), F.col("_n").alias("n_a"))
    fb = freq.select(F.col("_it").alias("b"), F.col("_n").alias("n_b"))
    out = (
        pairs.join(fa, "a")
        .join(fb, "b")
        .crossJoin(F.broadcast(total))
    )
    supp = F.col("n_ab") / F.col("n_baskets")
    return out.select(
        "a",
        "b",
        "n_ab",
        "n_a",
        "n_b",
        "n_baskets",
        F.round(supp, decimals).alias("support"),
        F.round(F.col("n_ab") / F.col("n_a"), decimals).alias("conf_a_b"),
        F.round(F.col("n_ab") / F.col("n_b"), decimals).alias("conf_b_a"),
        F.round(
            (F.col("n_ab") * F.col("n_baskets"))
            / (F.col("n_a") * F.col("n_b")),
            decimals,
        ).alias("lift"),
    )
