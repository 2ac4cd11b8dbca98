"""Mention detection (both paths) + entity linking semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_importer_spark import synth
from graph_importer_spark.linking import link_mentions
from graph_importer_spark.mentions import (
    detect_mentions,
    detect_mentions_trie,
    split_sentences,
)


def _tiny(spark):
    rows = [
        ("u1", "Acme1 acquired Globex2 Corp.  Nothing here."),
        ("u2", "Globex2 Corp works for Acme1."),
        ("u3", "no mentions at all."),
    ]
    pages = spark.createDataFrame(rows, "url string, text string")
    aliases = spark.createDataFrame(
        [
            ("Acme1", "ent_1", 0.9),
            ("Globex2", "ent_2", 0.9),
            ("Globex2 Corp", "ent_2", 0.6),
        ],
        "alias string, entity string, prior double",
    )
    return pages, aliases


def test_split_sentences(spark):
    pages, _ = _tiny(spark)
    s = split_sentences(pages).filter(F.col("url") == "u1").collect()
    assert [r["sentence"] for r in sorted(s, key=lambda r: r["sent_id"])] == [
        "Acme1 acquired Globex2 Corp.",
        "Nothing here.",
    ]


def test_token_join_detection(spark):
    pages, aliases = _tiny(spark)
    m = detect_mentions(pages, aliases).collect()
    surfaces = {(r["url"], r["sent_id"], r["pos"], r["surface"]) for r in m}
    assert ("u1", 0, 0, "Acme1") in surfaces
    assert ("u1", 0, 2, "Globex2") in surfaces
    assert ("u1", 0, 2, "Globex2 Corp") in surfaces  # 2-token candidate
    assert not any(r["url"] == "u3" for r in m)


def test_trie_path_agrees_with_token_join(spark):
    """The two detection strategies differ on raw candidates (token-join
    emits every 1..K-token candidate, the regex trie only the longest
    match) but must agree on the LINKED mention set — the semantic
    output after top-1 + overlap resolution."""
    pages, _, aliases = synth.corpus(spark, n_pages=40, n_entities=15)
    from graph_importer_spark.extract import with_text

    pt = with_text(pages)
    a = {
        (r["url"], r["sent_id"], r["pos"], r["surface"], r["entity"])
        for r in link_mentions(detect_mentions(pt, aliases), aliases).collect()
    }
    b = {
        (r["url"], r["sent_id"], r["pos"], r["surface"], r["entity"])
        for r in link_mentions(detect_mentions_trie(pt, aliases), aliases).collect()
    }
    assert a == b
    assert len(a) > 0


def test_linking_top1_and_overlap(spark):
    pages, aliases = _tiny(spark)
    linked = link_mentions(detect_mentions(pages, aliases), aliases).collect()
    by_key = {(r["url"], r["sent_id"], r["pos"]): r for r in linked}
    # longest surface wins: 'Globex2 Corp' (n_tokens=2) over 'Globex2'
    r = by_key[("u1", 0, 2)]
    assert r["surface"] == "Globex2 Corp" and r["entity"] == "ent_2"
    # the interior token 'Corp' (pos 3) must not produce its own link
    assert ("u1", 0, 3) not in by_key
    # exactly one link per mention position
    assert len(linked) == len(by_key)


def test_linking_determinism_tiebreak(spark):
    """Same surface, two entities, equal prior -> lexicographically
    smaller entity wins (full determinism)."""
    pages = spark.createDataFrame([("u", "X here.")], "url string, text string")
    aliases = spark.createDataFrame(
        [("X", "ent_b", 0.5), ("X", "ent_a", 0.5)],
        "alias string, entity string, prior double",
    )
    linked = link_mentions(detect_mentions(pages, aliases), aliases).collect()
    assert len(linked) == 1 and linked[0]["entity"] == "ent_a"


def test_negative_samples_filtered_and_deterministic(spark):
    from graph_importer_spark.triples import negative_samples

    t = spark.createDataFrame(
        [("a", "likes", "x"), ("a", "likes", "y"), ("b", "likes", "x")],
        ["subj", "pred", "obj"],
    )
    out = negative_samples(t, n_per_positive=4, seed=1)
    rows = [(r["subj"], r["pred"], r["obj"], r["neg_obj"], r["j"]) for r in out.collect()]
    # no negative is a positive
    pos = {("a", "likes", "x"), ("a", "likes", "y"), ("b", "likes", "x")}
    assert all((s, p, n) not in pos for s, p, _, n, _ in rows)
    # neg_obj from the object vocabulary only
    assert {n for *_, n, _ in rows} <= {"x", "y"}
    # deterministic across runs and partitionings
    again = [
        (r["subj"], r["pred"], r["obj"], r["neg_obj"], r["j"])
        for r in negative_samples(t.repartition(7), 4, seed=1).collect()
    ]
    assert sorted(rows) == sorted(again)
    # seed changes picks
    other = [
        (r["subj"], r["pred"], r["obj"], r["neg_obj"], r["j"])
        for r in negative_samples(t, 4, seed=2).collect()
    ]
    assert sorted(rows) != sorted(other)
    # explicit rank table overrides the dense-id default
    ranks = spark.createDataFrame([("x", 0), ("y", 1)], ["neg_obj", "_rank"])
    explicit = negative_samples(t, 4, seed=1, entity_ranks=ranks)
    assert explicit.count() > 0
