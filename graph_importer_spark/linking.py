"""Entity linking: mention surfaces -> candidate entities -> top-1.

Candidate generation is a broadcast hash join of detected mentions
against the alias dictionary (alias -> entity, prior).  Broadcast means
NO shuffle on the fact side at all — skew in surface frequency (head
entities appear orders of magnitude more often; synth.py builds this
skew in deliberately) cannot produce a straggler here, which is exactly
why the reference's hand-rolled balanced-partitioning trick
(clique_generator.py:216-229) has no analogue on this join.

Disambiguation (top-1 per mention) is a ``min_by`` AGGREGATION keyed on
(url, sent_id, pos): longest surface wins, then highest prior, then
lexicographically smallest entity for full determinism.  An aggregation
rather than a row_number window on purpose: min_by is algebraic, so the
hot path gets map-side partial aggregation and ONE hash shuffle —
a window needs a full sort-shuffle of every candidate row (measured
~2x stage cost at 10^7 mentions).  Group keys are fine-grained and
uniform — no salting needed HERE; skew handling matters downstream
where keys are entities (see cc.py / operators/skew.py).

Overlap suppression (a token interior to an accepted longer mention
must not also link) is per-sentence array logic — collect the accepted
mentions of a sentence and filter with a higher-order EXISTS — instead
of a range anti-join (which would sort-shuffle both sides).

Mirrors the query surface the reference delegates to ArangoDB's AQL
anti-join (vertices_generator.py:123-146) in spirit: push the lookup to
the engine, never loop on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_mentions(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """mentions(url, sent_id, pos, n_tokens, surface) x aliases(alias,
    entity, prior) -> linked(url, sent_id, pos, n_tokens, surface,
    entity, score).

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
    # top-1 per mention position: min over (-n_tokens, -score, entity)
    # == (longest, then best-scored, then smallest entity id)
    best = cands.groupBy("url", "sent_id", "pos").agg(
        F.expr(
            "min_by(struct(n_tokens, surface, entity, score),"
            " struct(-n_tokens, -score, entity)) AS b"
        )
    )
    # overlap resolution per sentence: drop mentions strictly interior
    # to an accepted longer mention's span
    per_sent = best.groupBy("url", "sent_id").agg(
        F.collect_list(
            F.struct("pos", "b.n_tokens", "b.surface", "b.entity", "b.score")
        ).alias("ms")
    )
    kept = per_sent.select(
        "url",
        "sent_id",
        F.explode(
            F.filter(
                "ms",
                lambda m: ~F.exists(
                    F.col("ms"),
                    lambda l: (l["n_tokens"] > 1)
                    & (m["pos"] > l["pos"])
                    & (m["pos"] < l["pos"] + l["n_tokens"]),
                ),
            )
        ).alias("m"),
    )
    return kept.select(
        "url",
        "sent_id",
        F.col("m.pos").alias("pos"),
        F.col("m.n_tokens").alias("n_tokens"),
        F.col("m.surface").alias("surface"),
        F.col("m.entity").alias("entity"),
        F.col("m.score").alias("score"),
    )
