"""Byte-pair-encoding vocabulary learning (Sennrich et al., ACL 2016)
— the tokenizer-training stage of an LLM data pipeline.

The published algorithm: collapse the corpus to WORD COUNTS, represent
each word as a space-delimited symbol sequence, then repeatedly (a)
count adjacent symbol pairs weighted by word count, (b) merge the most
frequent pair everywhere (greedy left-to-right within each word).

Scale shape — this is why BPE learning is cheap even at 100 TB:

* The corpus pays exactly ONE scan: the word-count aggregate
  (explode + groupBy(word), Zipf-hot words absorbed by map-side
  partials).  Everything after runs on the VOCABULARY table —
  bounded by distinct words (~10^6-10^7 rows), not corpus size.
* Each merge round is one pair-count aggregate + one 1-row argmax
  action on that small frame, then a pure-codegen ``replace`` over
  the symbol strings.  ``n_merges`` driver-side scalar actions is
  the same loop discipline as the Pregel catalog (analytics.py); the
  per-round frame localCheckpoints so plans stay O(1) deep.
* Determinism: ties on pair count break toward the LEXICOGRAPHICALLY
  SMALLEST pair, so the learned merge table is a pure function of the
  corpus.  Greedy application uses string ``replace`` on the
  space-delimited form (' a b ' -> ' ab '), whose non-overlapping
  left-to-right semantics Spark and DuckDB share — the oracle replays
  each merge bit-for-bit.

Reference scope: the reference has no text/tokenizer surface at all
(it imports pre-built graphs) — §2.11 extension territory, beside
token_count / bpe_token_count (textstats.py), which count PRE-tokens;
this module learns the merge table a real BPE tokenizer is built from.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graph_importer_spark.operators.textstats import normalize_text


def word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) over the normalized corpus — the ONE corpus scan."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    return (
        docs.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _char_spaced(word) -> Column:
    """' h e l l o ' — space-delimited symbols with pad spaces, so a
    merge is a plain ' a b ' -> ' ab ' replace."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" "))


def _adjacent_pairs(s: Column) -> Column:
    """Array of 'a b' adjacent-symbol pairs of a padded symbol string."""
    toks = F.split(F.trim(s), " ")
    return F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def apply_merge(s: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge of one pair in a padded symbol string
    — plain (non-regex) replace, so symbols may contain regex
    metacharacters once punctuation merges in."""
    return F.replace(
        s,
        F.lit(f" {left} {right} "),
        F.lit(f" {left}{right} "),
    )


def bpe_learn(docs: DataFrame, text_col: str, n_merges: int = 10) -> DataFrame:
    """Learn ``n_merges`` BPE merges -> (step, left, right, merged, n)
    where ``n`` is the weighted pair count that won step ``step``.

    Stops early if no adjacent pair remains (every word fully merged).
    The returned frame is the merge table a tokenizer replays in
    order; feed it to :func:`bpe_segment` to tokenize text with the
    learned vocabulary.
    """
    spark = docs.sparkSession
    vocab = (
        word_counts(docs, text_col)
        .select("cnt", _char_spaced(F.col("word")).alias("s"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple] = []
    for step in range(1, n_merges + 1):
        best = (
            vocab.select(F.col("cnt"), F.explode(_adjacent_pairs(F.col("s"))).alias("pair"))
            .groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, n = best[0]["pair"], int(best[0]["n"])
        left, right = pair.split(" ")
        merges.append((step, left, right, left + right, n))
        vocab = vocab.select(
            "cnt", apply_merge(F.col("s"), left, right).alias("s")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "step int, left string, right string, merged string, n long"
    )


def bpe_segment(
    docs: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize with a learned merge list -> (id, bpe_tokens array,
    n_bpe_tokens).  Replays the merges IN ORDER on each word's padded
    symbol string — a chain of plain replaces, pure codegen, zero
    shuffle (the merge list is a plan constant, exactly how a trained
    tokenizer ships with a pipeline)."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    from graph_importer_spark.operators.textstats import let_bind

    def seg_word(w: Column) -> Column:
        s = _char_spaced(w)
        for left, right in merges:
            s = apply_merge(s, left, right)
        return F.split(F.trim(s), " ")

    toks = let_bind(
        words,
        lambda ws: F.flatten(
            F.transform(F.filter(ws, lambda w: w != ""), seg_word)
        ),
    )
    return docs.select(
        F.col(id_col),
        toks.alias("bpe_tokens"),
        F.size(toks).alias("n_bpe_tokens"),
    )
