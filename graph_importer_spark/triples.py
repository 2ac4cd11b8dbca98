"""Canonical (subj, pred, obj) triple extraction from linked mentions.

Pattern semantics (pinned, SQL-expressible so the DuckDB oracle can
mirror them): within one sentence containing >= 2 linked mentions and a
recognized predicate phrase, emit ONE triple
    subj = entity of the first mention (min pos)
    obj  = entity of the last mention (max pos)
    pred = first predicate phrase found in the sentence text.

This replaces the reference's edge-document construction
({_from, _to, weight?} — graphalytics_importer.py:117-123,
edge_list.py:28-34) with provenance columns (url, warc_ts) required by
the north rule's lineage contract.

Everything is built-in aggregate functions (min_by/max_by/count) — one
hash aggregation, no UDF, no window.  Group key (url, sent_id) is
fine-grained and uniform: no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_importer_spark.synth import PREDICATES


def detect_predicate(sentence_col, predicates: dict[str, str] | None = None):
    """CASE chain: first matching phrase (word-bounded) -> predicate id.

    Phrase list is tiny and fixed; a literal when-chain keeps this inside
    whole-stage codegen (vs a join it would shuffle nothing anyway, but
    the chain also preserves 'first phrase wins' priority order).
    """
    predicates = predicates or PREDICATES
    expr = None
    for pid, phrase in predicates.items():
        cond = sentence_col.rlike(rf"(^|\s){phrase}(\s|$|[.,;:!?])".replace(" ", r"\s"))
        expr = F.when(cond, F.lit(pid)) if expr is None else expr.when(cond, F.lit(pid))
    return expr


def extract_triples(
    linked: DataFrame,
    sentences: DataFrame,
    pages: DataFrame,
    predicates: dict[str, str] | None = None,
    default_pred: str | None = None,
) -> DataFrame:
    """linked(url, sent_id, pos, entity) x sentences(url, sent_id,
    sentence) x pages(url, warc_ts) -> (subj, pred, obj, url, warc_ts).

    ``default_pred``: when set, sentences with >= 2 linked mentions but
    no recognized predicate phrase still emit a co-occurrence triple
    with this predicate id (the mention-co-occurrence edge set that
    feeds canonicalization).
    """
    ends = linked.groupBy("url", "sent_id").agg(
        F.min_by("entity", "pos").alias("subj"),
        F.max_by("entity", "pos").alias("obj"),
        F.count("*").alias("n_mentions"),
    )
    pred_col = detect_predicate(F.col("sentence"), predicates)
    if default_pred is not None:
        pred_col = F.coalesce(pred_col, F.lit(default_pred))
    preds = sentences.select(
        "url", "sent_id", pred_col.alias("pred")
    ).filter(F.col("pred").isNotNull())
    out = (
        ends.filter(F.col("n_mentions") >= 2)
        .join(preds, ["url", "sent_id"], "inner")
        .join(pages.select("url", "warc_ts"), "url", "inner")
        .select("subj", "pred", "obj", "url", "warc_ts")
    )
    return out
