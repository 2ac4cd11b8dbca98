"""HTML->text extraction: the byte-identical invariant (BASELINE
input_hint: 'byte-identical extracted text per url')."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from graph_importer_spark import synth
from graph_importer_spark.extract import (
    extract_text_series,
    extract_text_str,
    with_text,
)

CASES = [
    (b"<html><body><p>Hello world</p></body></html>", "Hello world"),
    (b"<p>a</p><script>var x = '<p>no</p>';</script><p>b</p>", "a b"),
    (b"<style>p { color: red }</style>text", "text"),
    (b"<!-- comment --><b>bold</b>", "bold"),
    (b"a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39; &nbsp;f", "a & b <c> \"d\" 'e' f"),
    (b"x &#65; y &#128512; z", "x A y \U0001f600 z"),
    (b"  \t\n  spaced   out  \n", "spaced out"),
    (b"", ""),
    ("already a string", "already a string"),
    (b"\xff\xfe broken utf8", "�� broken utf8"),
]


def test_scalar_contract():
    for html, want in CASES:
        assert extract_text_str(html) == want, html
    assert extract_text_str(None) is None


def test_series_matches_scalar():
    s = pd.Series([h for h, _ in CASES] + [None], dtype="object")
    got = extract_text_series(s)
    want = [extract_text_str(h) for h, _ in CASES] + [None]
    assert list(got) == want


def test_udf_matches_scalar_on_corpus(spark):
    """Spark-side extraction is byte-identical to the pinned scalar
    function AND to the independently-constructed expected text."""
    pages, _, _ = synth.corpus(spark, n_pages=60, n_entities=20)
    out = with_text(pages).select("url", "text", "html").collect()
    assert len(out) == 60
    for r in out:
        assert r["text"] == extract_text_str(bytes(r["html"])), r["url"]

    expected = {
        r["url"]: r["expected_text"]
        for r in synth.expected_text(spark, n_pages=60, n_entities=20).collect()
    }
    for r in out:
        assert r["text"] == expected[r["url"]], r["url"]


def test_extraction_stage_is_narrow(spark):
    """The extract stage must not shuffle — plan contains no Exchange
    between scan and the Arrow eval."""
    pages, _, _ = synth.corpus(spark, n_pages=10, n_entities=5)
    plan = with_text(pages)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "Project" in plan


def test_ws_collapse_split_join_equivalence_exhaustive():
    # the split/join whitespace collapse in extract relies on re \s and
    # str.isspace agreeing for EVERY Unicode codepoint
    import re

    ws = re.compile(r"\s")
    diff = [
        cp
        for cp in range(0x110000)
        if bool(ws.match(chr(cp))) != chr(cp).isspace()
    ]
    assert diff == []
    # and on representative strings the two formulations are identical
    cases = [
        "a  b", "  x\t\ny  z  ", "tab\tonly", "", "nl\n", "　wide　",
        "one space", " lead", "trail ", "\x1c\x1d\x1e\x1f\x85",
    ]
    for c in cases:
        assert " ".join(c.split()) == re.sub(r"\s+", " ", c).strip()
