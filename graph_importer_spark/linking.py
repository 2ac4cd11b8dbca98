"""Entity linking: mention surfaces -> candidate entities -> top-1.

Candidate generation is a broadcast hash join of detected mentions
against the alias dictionary (alias -> entity, prior).  Broadcast means
NO shuffle on the fact side at all — skew in surface frequency (head
entities appear orders of magnitude more often; synth.py builds this
skew in deliberately) cannot produce a straggler here, which is exactly
why the reference's hand-rolled balanced-partitioning trick
(clique_generator.py:216-229) has no analogue on this join.

Disambiguation (top-1 per mention) is a window over (url, sent_id, pos):
longest surface wins, then highest prior, then lexicographically
smallest entity for full determinism.  The window partitions on a
fine-grained key (millions of distinct (url,sent,pos) groups, each a
handful of rows) so the shuffle it induces is uniform — no salting
needed HERE; skew handling matters downstream where keys are entities
(see cc.py / operators/skew.py).

Mirrors the query surface the reference delegates to ArangoDB's AQL
anti-join (vertices_generator.py:123-146) in spirit: push the lookup to
the engine, never loop on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def link_mentions(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """mentions(url, sent_id, pos, n_tokens, surface) x aliases(alias,
    entity, prior) -> linked(url, sent_id, pos, surface, entity, score).

    One row per mention (best candidate)."""
    alias_dim = aliases.select(
        F.col("alias").alias("surface"), "entity", "prior"
    )
    cands = mentions.join(F.broadcast(alias_dim), "surface", "inner").select(
        "url",
        "sent_id",
        "pos",
        "n_tokens",
        "surface",
        "entity",
        F.col("prior").alias("score"),
    )
    w = Window.partitionBy("url", "sent_id", "pos").orderBy(
        F.desc("n_tokens"), F.desc("score"), F.asc("entity")
    )
    ranked = cands.withColumn("rn", F.row_number().over(w))
    best = ranked.filter(F.col("rn") == 1).drop("rn")
    # Overlap resolution: a token that is interior to a longer accepted
    # mention (e.g. 'Corp' inside 'Hooli13 Corp') must not also link on
    # its own. Anti-join mentions whose position falls strictly inside a
    # longer mention's span in the same sentence.
    longer = best.filter(F.col("n_tokens") > 1).select(
        F.col("url").alias("l_url"),
        F.col("sent_id").alias("l_sent"),
        F.col("pos").alias("l_pos"),
        F.col("n_tokens").alias("l_n"),
    )
    covered = best.join(
        longer,
        (best.url == longer.l_url)
        & (best.sent_id == longer.l_sent)
        & (best.pos > longer.l_pos)
        & (best.pos < longer.l_pos + longer.l_n),
        "left_anti",
    )
    return covered
