"""Byte-identical text extraction + normalization parity (the anchor)."""

import html as _html
import re

import pytest
from pyspark.sql import functions as F

from thesis_ner_co_tri_training_spark.functions.textnorm import (
    extract_text,
    normalize_line,
    split_sentences,
    strip_punct,
    strip_punct_col,
    tokenize,
)
from thesis_ner_co_tri_training_spark.sources.pages import gen_page


def test_extract_text_byte_identical_per_url():
    for pid in range(200):
        p = gen_page(pid)
        assert extract_text(p["html"]) == p["text"], f"page {pid}"


def test_extract_text_adversarial_entities():
    html_doc = (
        "<html><body><p>a &amp; b &uuml;ber &apos;x&apos;</p>"
        "<script>skip &lt;me&gt;</script><p>  spaced   out  </p></body></html>"
    )
    assert extract_text(html_doc) == "a & b über 'x'\nspaced out"


def test_normalize_line_matches_reference_semantics():
    # co_training.py:60-61: strip then html.unescape
    raw = "  Caf&eacute; &amp; Bar \n"
    assert normalize_line(raw) == _html.unescape(raw.strip())


def test_strip_punct_matches_python_re():
    cases = ["Hello, world!", "müde für größe", "a&b 12% x_y", "ä.ö!ü?"]
    for c in cases:
        assert strip_punct(c) == re.sub(r"[^\w\s]", "", c)


def test_strip_punct_col_parity_with_python(spark):
    cases = ["Hello, world!", "müde für größe", "a&b 12% x_y", "ä.ö!ü?", ""]
    df = spark.createDataFrame([(c,) for c in cases], ["t"])
    got = [r["s"] for r in df.select(strip_punct_col(F.col("t")).alias("s")).collect()]
    want = [re.sub(r"[^\w\s]", "", c) for c in cases]
    assert got == want


def test_split_sentences():
    assert split_sentences("a b. c d! e?") == ["a b", "c d", "e"]
    assert split_sentences("line one.\nline two.") == ["line one", "line two"]
    assert split_sentences("") == []
    assert tokenize("  a   b ") == ["a", "b"]
