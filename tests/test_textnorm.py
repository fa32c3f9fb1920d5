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


def _parser_extract(html_doc: str) -> str:
    """The stdlib-parser path, bypassing the fast scanner — the semantic
    definition the fast path must match byte-for-byte."""
    from thesis_ner_co_tri_training_spark.functions import textnorm

    parser = textnorm._TextExtractor()
    parser.feed(html_doc)
    parser.close()
    raw = "".join(parser.parts)
    lines = []
    for line in raw.split("\n"):
        line = textnorm._WS_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def test_fast_scanner_equals_parser_on_corpus_and_adversarial():
    from thesis_ner_co_tri_training_spark.functions.textnorm import _extract_fast

    # the synthetic corpus must take the fast path AND match the parser
    for pid in range(100):
        h = gen_page(pid)["html"].decode("utf-8")
        assert _extract_fast(h) is not None, f"page {pid} fell back"
        assert extract_text(h) == _parser_extract(h)
    # adversarial inputs: fast path must either bail (None) or match
    cases = [
        '<p a="x>y">tail</p>',            # '>' inside quoted attr
        '<p a="x<y">tail</p>',            # '<' inside quoted attr
        "<!-- comment -->a<p>b</p>",      # comment
        "<?pi ?>a", "<!DOCTYPE html><p>a</p>",
        "<script>x<y</script>after",      # cdata mode
        "<SCRIPT>x</SCRIPT>after", "<style>p{}</style>t",
        "<my-tag>a</my-tag>", "< p>a</ p>", "<3 hearts <p>x</p>",
        "a&am<span>p;b</span>",           # entity split across data runs
        "a&amp;amp;b", "&notit; &notin;", "x &#65; &#x41; &#xg;",
        "<p/>a<br/>b<br />c", "<p  class=x  >y</p>",
        '<a href="u">t</a>', "<p a='1' b=\"2\" c=3>z</p>",
        "<p", "</p", "text < other > text", "<>", "</>", "<p\n\tclass=x>nl</p>",
        "tail<p>block", "<ul><li>i1<li>i2</ul>", "&uuml;ber <b>bold</b>",
        '<p title="a&amp;b">c</p>', "<div><p>nested</p></div>",
        # review-found divergence shapes (both fixed by the strict attr
        # grammar + glue-aware self-closing rule — must bail or match):
        "<script src=x.js/>body</script>after",  # '/' glues to bare value
        "<noscript data=x/>hidden</noscript>shown",
        "a<b 't='c>b",                    # quote-glued token: parser
        "<p 'x'>t", "<p =x>t",            # rejects tag, emits literally
        "<a href=/>x",                    # '/' IS the bare value
        "<a href='q'/>y", "<div/>a<script/>b</script>c",
        "<p a=1/2>q</p>",                 # '/' inside a bare value
        "</p junk>tail", "</p/>tail",     # end tags with junk
    ]
    for h in cases:
        fast = _extract_fast(h)
        want = _parser_extract(h)
        assert extract_text(h) == want, h
        if fast is not None:
            lines = [l for l in (re.sub(r"[ \t\r\f\v]+", " ", x).strip()
                                 for x in fast.split("\n")) if l]
            assert "\n".join(lines) == want, h


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
