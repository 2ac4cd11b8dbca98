"""The corpus-hygiene operators compose into the standard pipeline:

    quality filter -> exact dedup -> near-dup keeper drop ->
    decontaminate vs a benchmark -> PII redact -> DSIR selection

This is the recipe a training-data user runs over the documents table;
the test pins the row accounting end to end on a corpus with planted
duplicates, a benchmark quote, and PII.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from graph_importer_spark.operators import decontam, dedup, importance, pii
from graph_importer_spark.operators.textstats import gopher_columns


def test_hygiene_recipe_row_accounting(spark):
    body = (
        "the quick brown fox jumps over the lazy dog while the happy "
        "cat naps near the warm stove and the day rolls on "
    )
    rows = [
        # 0: clean keeper
        (0, body * 3 + "nothing special here at all today"),
        # 1: exact duplicate of 0
        (1, body * 3 + "nothing special here at all today"),
        # 2: near-duplicate of 0 (one word changed at the end)
        (2, body * 3 + "nothing special here at all tonight"),
        # 3: contaminated — quotes the benchmark verbatim
        (3, body * 2 + "the capital of france is paris since forever ok"),
        # 4: carries PII
        (4, body * 3 + "contact me at jane.doe@example.com thanks"),
        # 5: too short — fails the Gopher length gate
        (5, "tiny doc"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(0, "the capital of france is paris since forever")],
        "bid long, text string",
    )

    # 1. quality gate (min 50 words is the Gopher rule; scaled-down corpus)
    g = gopher_columns(F.col("text"))
    quality = docs.withColumn("n_words", g["n_words"]).filter(
        F.col("n_words") >= 50
    )
    assert {r.doc_id for r in quality.select("doc_id").collect()} == {0, 1, 2, 3, 4}

    # 2. exact + near-dup keeper selection (winnow pairs -> CC keeper)
    pairs = dedup.ngram_jaccard_pairs(
        quality, "doc_id", "text", k=5, threshold=0.8
    ).select("id1", "id2")
    clusters = dedup.dup_clusters(pairs)
    drops = {r.doc_id for r in clusters.filter("is_dup").collect()}
    assert drops == {1, 2}  # 0 is the keeper
    kept = quality.join(
        clusters.filter("is_dup").select(F.col("doc_id").alias("d")),
        quality.doc_id == F.col("d"),
        "left_anti",
    )

    # 3. decontamination vs the benchmark (5-gram rule at this scale)
    flags = decontam.contamination(kept, bench, "doc_id", "text", k=5)
    contaminated = {r.doc_id for r in flags.filter("contaminated").collect()}
    assert contaminated == {3}
    clean = kept.join(
        flags.filter("contaminated").select(F.col("doc_id").alias("d")),
        kept.doc_id == F.col("d"),
        "left_anti",
    )

    # 4. PII audit + redaction
    audit = pii.pii_flags(clean, "doc_id", "text")
    assert {r.doc_id for r in audit.filter("has_pii").collect()} == {4}
    scrubbed = clean.select("doc_id", pii.redact("text").alias("text"))
    assert (
        scrubbed.filter(F.col("text").contains("example.com")).count() == 0
    )
    assert scrubbed.filter(F.col("text").contains("<EMAIL>")).count() == 1

    # 5. DSIR weights over the survivors (target = the clean keeper)
    target = scrubbed.filter("doc_id = 0")
    w = importance.importance_weights(
        scrubbed, target, "doc_id", "text", buckets=512
    )
    got = {r.doc_id: r.dsir_logweight for r in w.collect()}
    assert set(got) == {0, 4}
    assert got[0] > got[4]  # the target doc scores highest

    # final accounting: 6 in, 2 out, each drop attributed to one stage
    assert scrubbed.count() == 2
