"""PII detection and redaction for web-text corpora.

A training-data pipeline over Common-Crawl-style pages must find and
scrub personally identifiable information before the text is used; the
standard public recipe (C4, Raffel et al. 2020; CCNet; BigScience ROOTS
pipeline) is regex families for emails / IP addresses / phone numbers,
applied as a flag pass (counts per document) and a redaction pass
(replace matches with typed placeholders).

Reference scope note: the reference importer (arangodb/graph-importer)
has no corpus-hygiene stage — this module is part of the "beyond the
reference" training-pipeline surface, like dedup and decontamination.

Scale shape (100 TB):
* Everything here is ``regexp_count`` / ``regexp_replace`` over one
  projected column — pure JVM expressions inside whole-stage codegen,
  no Python, no shuffle, no UDF. A PII pass is a narrow map over the
  corpus scan and pipelines with extraction in the same stage.
* Patterns deliberately avoid lookaround so the same pattern text runs
  under Java regex (Spark) and RE2 (the DuckDB oracle) — replaying the
  formula bit-for-bit is what keeps the oracle honest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pattern notes: no lookaround (RE2 has none), no \w (identical anyway),
# explicit classes. EMAIL is the C4-style pragmatic form, not RFC 5322.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+"
# \b-delimited, so a >=4-part dotted run ("1.2.3.4.5") has its first 4
# octets matched — the standard pragmatic over-match (a lookahead would
# fix it but RE2, hence the oracle, has none). Over-redaction of version
# strings is the safe failure direction for a scrubber.
IPV4_PATTERN = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"
# International-prefix phone numbers: +CC then 7..17 phone chars ending
# in a digit. Domestic formats are ambiguous with prices/ids and are a
# policy decision, not a default (documented, not silently matched).
PHONE_PATTERN = r"\+[0-9][0-9 ().-]{6,16}[0-9]"

# Redaction order matters: emails first (their local part may contain
# digits a later pass would nibble), then IPs, then phones.
_FAMILIES: list[tuple[str, str, str]] = [
    ("emails", EMAIL_PATTERN, "<EMAIL>"),
    ("ipv4", IPV4_PATTERN, "<IP>"),
    ("phones", PHONE_PATTERN, "<PHONE>"),
]


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-row match counts for each PII family (null text counts 0)."""
    t = F.coalesce(F.col(text) if isinstance(text, str) else text, F.lit(""))
    return {
        f"n_{name}": F.regexp_count(t, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in _FAMILIES
    }


def redact(text: Column | str) -> Column:
    """Replace every PII match with its typed placeholder."""
    t = F.col(text) if isinstance(text, str) else text
    for _, pat, placeholder in _FAMILIES:
        t = F.regexp_replace(t, pat, placeholder)
    return t


def pii_flags(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document PII audit: (id, n_emails, n_ipv4, n_phones,
    has_pii, redacted_len).

    ``redacted_len`` (length of the scrubbed text) lets the caller
    verify the redaction pass touched exactly the flagged rows without
    shipping the scrubbed text itself through the audit aggregate.
    """
    counts = pii_counts(text_col)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return docs.select(
        id_col,
        *counts.values(),
        (total > 0).alias("has_pii"),
        F.length(redact(text_col)).alias("redacted_len"),
    )
