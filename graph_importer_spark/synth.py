"""Deterministic synthetic Common-Crawl-style pages corpus + ground truth.

The reference treats synthetic-graph generation as a first-class entry
point (/root/reference/generator.py; randomness via ``random.*``,
e.g. vertices_generator.py:32-33 — NOT reproducible across runs).  We fix
that deliberately: every "random" choice here is ``xxhash64(id, seed)``
based, so the corpus is byte-identical regardless of seed-reuse,
partition count, or parallelism level (local[8] vs local[32] must see the
same input for the scaling bench to be meaningful — SURVEY.md §7 hard
part 3).

Produces three DataFrames:

* ``pages(url, warc_ts, html, text, lang)`` — per BASELINE input_hint;
  ``text`` is null at ingest (filled by the extract stage).
* ``gt_triples(url, subj, pred, obj)`` — ground truth for the P/R gate.
* ``aliases(alias, entity, prior)`` — gazetteer / alias dictionary for
  mention detection + entity linking (broadcast dimension).

Everything is built from ``spark.range`` with JVM-side expressions only —
no Python UDFs, no driver loops — so generating a 10^9-row corpus is a
single distributed job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Fixed vocabulary: names are unique-by-construction (index suffix) and
# multi-token in the secondary form, so the gazetteer path exercises
# multi-word matching.
ENTITY_STEMS = ["Acme", "Globex", "Umbrella", "Stark", "Wayne", "Hooli", "Initech", "Vandelay"]
PREDICATES = {
    "acquired": "acquired",
    "founded": "founded",
    "located_in": "is located in",
    "works_for": "works for",
    "partnered_with": "partnered with",
    "supplies": "supplies",
}
FILLERS = [
    "The quarterly report shows steady growth across regions.",
    "Analysts expect the market to remain volatile this year.",
    "No further details were disclosed at the press briefing.",
    "The announcement follows months of speculation.",
]
LANGS = ["de", "fr", "es", "it"]
_BASE_TS = 1767225600  # 2026-01-01T00:00:00Z
_U = float(2**31)


def _u(col: Column, salt: int) -> Column:
    """Deterministic unit-interval float from (value, salt)."""
    return F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(2**31)) / F.lit(_U)


def _pick(col: Column, salt: int, options: list[str]) -> Column:
    """Deterministic choice from a fixed string list."""
    idx = F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(len(options)))
    return F.element_at(F.array(*[F.lit(o) for o in options]), (idx + 1).cast("int"))


def _stem(ent: Column) -> Column:
    idx = F.pmod(ent, F.lit(len(ENTITY_STEMS)))
    return F.element_at(F.array(*[F.lit(s) for s in ENTITY_STEMS]), (idx + 1).cast("int"))


def canonical_name(ent: Column) -> Column:
    return F.concat(_stem(ent), ent.cast("string"))


def secondary_name(ent: Column) -> Column:
    return F.concat(_stem(ent), ent.cast("string"), F.lit(" Corp"))


def entity_id(ent: Column) -> Column:
    """Stable entity identifier: 'ent_<n>' (plays the reference's ``_key``
    role — key synthesis per graphalytics_importer.py:87 semantics)."""
    return F.concat(F.lit("ent_"), ent.cast("string"))


def aliases_df(spark: SparkSession, n_entities: int) -> DataFrame:
    """Gazetteer: two aliases per entity — canonical (prior .9) and
    secondary '... Corp' (prior .6). Small broadcast dimension."""
    ents = spark.range(n_entities).withColumnRenamed("id", "ent")
    canon = ents.select(
        canonical_name(F.col("ent")).alias("alias"),
        entity_id(F.col("ent")).alias("entity"),
        F.lit(0.9).alias("prior"),
    )
    sec = ents.select(
        secondary_name(F.col("ent")).alias("alias"),
        entity_id(F.col("ent")).alias("entity"),
        F.lit(0.6).alias("prior"),
    )
    return canon.unionByName(sec)


def _facts(
    spark: SparkSession, n_pages: int, n_entities: int, seed: int, weight: int = 1
) -> DataFrame:
    """One row per fact sentence: (page_id, slot, subj_ent, pred, obj_ent,
    subj_text, obj_text, sentence).

    Skew by design: subject entity id = floor(n_ent * u^3) — a power-law
    head (entity 0 and friends dominate), which is what the salting /
    AQE-skew handling downstream is for (SURVEY.md §4 skew row).

    ``weight`` scales facts-per-page (weight=1 keeps the original 1..3
    formula bit-for-bit; weight=w gives w..3w) — used to make pages
    approach real Common-Crawl text density for compute-bound benches.
    """
    pages = spark.range(n_pages).withColumnRenamed("id", "page_id")
    n_facts = (
        F.pmod(F.xxhash64("page_id", F.lit(seed + 1)), F.lit(2 * weight + 1))
        + weight
    ).cast("int")
    facts = pages.select(
        "page_id", F.explode(F.sequence(F.lit(0), n_facts - 1)).alias("slot")
    )
    fact_key = F.concat_ws("_", "page_id", "slot")
    subj_u = _u(fact_key, seed + 2)
    subj = F.floor(F.lit(float(n_entities)) * subj_u * subj_u * subj_u).cast("long")
    obj = F.pmod(F.xxhash64(fact_key, F.lit(seed + 3)), F.lit(n_entities)).cast("long")
    # avoid self-loops deterministically
    obj = F.when(obj == subj, F.pmod(obj + 1, F.lit(n_entities))).otherwise(obj)
    pred = _pick(fact_key, seed + 4, list(PREDICATES.keys()))
    phrase = _pick(fact_key, seed + 4, list(PREDICATES.values()))  # same salt → aligned
    subj_text = F.when(_u(fact_key, seed + 5) < 0.7, canonical_name(subj)).otherwise(
        secondary_name(subj)
    )
    obj_text = F.when(_u(fact_key, seed + 6) < 0.7, canonical_name(obj)).otherwise(
        secondary_name(obj)
    )
    sentence = F.concat(subj_text, F.lit(" "), phrase, F.lit(" "), obj_text, F.lit("."))
    return facts.select(
        "page_id",
        "slot",
        subj.alias("subj_ent"),
        obj.alias("obj_ent"),
        pred.alias("pred"),
        sentence.alias("sentence"),
    )


def url_of(page_id: Column) -> Column:
    return F.concat(F.lit("https://synth.example.org/page/"), page_id.cast("string"))


# ~1 KB of strip-me boilerplate per weight step: the extractor removes
# script/style/comment content, so heavier pages cost extraction compute
# without changing the extracted text (keeps golden tests weight-free).
_BOILER = (
    '<script type="text/javascript">'
    + "var nav = { items: [" + ", ".join(f'"item{i}"' for i in range(40)) + "] };"
    + "function track(e) { console.log(e); } "
    + "</script><style>"
    + " ".join(f".c{i} {{ margin: {i}px; padding: {i}px }}" for i in range(30))
    + "</style><!-- "
    + "boilerplate " * 40
    + " -->"
)


def corpus(
    spark: SparkSession,
    n_pages: int = 1000,
    n_entities: int = 200,
    seed: int = 42,
    weight: int = 1,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Return (pages, gt_triples, aliases).

    gt_triples covers only lang='en' pages — the pipeline filters on lang,
    mirroring a language gate a real CC pipeline applies first.

    ``weight`` (default 1 = bit-identical to the original corpus) scales
    page heaviness toward real Common-Crawl density: facts per page
    w..3w and ~1 KB of script/style/comment boilerplate per step.
    """
    facts = _facts(spark, n_pages, n_entities, seed, weight)
    body = facts.groupBy("page_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("slot", "sentence"))),
                lambda s: F.concat(F.lit("<p>"), s["sentence"], F.lit("</p>")),
            ),
            "",
        ).alias("paras"),
    )
    pid = F.col("page_id")
    lang = F.when(_u(pid, seed + 7) < 0.95, F.lit("en")).otherwise(_pick(pid, seed + 8, LANGS))
    filler = _pick(pid, seed + 9, FILLERS)
    title = F.concat(F.lit("Page "), pid.cast("string"))
    html = F.concat(
        F.lit("<html><head><title>"),
        title,
        F.lit("</title><style>body { margin: 0; }</style></head><body>"),
        F.lit('<script type="text/javascript">var tracker = 1;</script>'),
        F.lit(_BOILER * (weight - 1)),
        F.col("paras"),
        F.lit("<p>"),
        filler,
        F.lit("</p></body></html>"),
    )
    pages = body.select(
        url_of(pid).alias("url"),
        F.timestamp_seconds(F.lit(_BASE_TS) + pid).alias("warc_ts"),
        html.cast("binary").alias("html"),
        F.lit(None).cast("string").alias("text"),
        lang.alias("lang"),
    )
    # Expected extracted text (for the byte-identical invariant test):
    # extractor drops script/style content, replaces tags with nothing at
    # tag boundaries but separates block content by the collapse rule —
    # see extract.py. Built independently here from the same sentences.
    gt = (
        facts.withColumn("lang", lang)
        .filter(F.col("lang") == "en")
        .select(
            url_of(pid).alias("url"),
            entity_id(F.col("subj_ent")).alias("subj"),
            F.col("pred"),
            entity_id(F.col("obj_ent")).alias("obj"),
        )
    )
    return pages, gt, aliases_df(spark, n_entities)


def expected_text(
    spark: SparkSession,
    n_pages: int = 1000,
    n_entities: int = 200,
    seed: int = 42,
    weight: int = 1,
) -> DataFrame:
    """Independently-constructed expected extraction output per url.

    Mirrors extract.py's contract: script/style elements removed, tags →
    single space, whitespace collapsed, trimmed (boilerplate weight does
    not change the expected text by construction).
    """
    facts = _facts(spark, n_pages, n_entities, seed, weight)
    body = facts.groupBy("page_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("slot", "sentence"))),
                lambda s: s["sentence"],
            ),
            " ",
        ).alias("sents")
    )
    pid = F.col("page_id")
    filler = _pick(pid, seed + 9, FILLERS)
    title = F.concat(F.lit("Page "), pid.cast("string"))
    return body.select(
        url_of(pid).alias("url"),
        F.concat(title, F.lit(" "), F.col("sents"), F.lit(" "), filler).alias("expected_text"),
    )
