"""Text normalization — the byte-identical anchor functions.

The engine's per-row invariant (BASELINE.json input_hint) is that extracted
text is byte-identical per url to the reference extractor. We guarantee it
*by construction*: the pure-Python functions below are the single source of
truth, called both by the pure-Python oracle in tests and by the Arrow
pandas UDFs used in the Spark plan. No second implementation exists.

Reference semantics:
  - strip + html.unescape of each raw line  (co_training.py:60-61, utils.py:145-146)
  - punctuation/symbol strip before tagging: re.sub('[^\\w\\s]', '', text)
    (predict.py:81)
  - whitespace tokenization (' '.join / .split)  (co_training.py:266-267)
"""

from __future__ import annotations

import html as _html
import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PUNCT_RE = re.compile(r"[^\w\s]")
# Block-level elements that imply a line break in extracted text.
_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "tr", "table", "section", "article", "header", "footer", "blockquote",
}
_SKIP_TAGS = {"script", "style", "noscript", "template"}
_WS_RE = re.compile(r"[ \t\r\f\v]+")


def normalize_line(line: str) -> str:
    """strip + unescape, exactly as the reference preps unlabeled lines."""
    return _html.unescape(line.strip())


def strip_punct(text: str) -> str:
    """Pre-tagging normalization (predict.py:81)."""
    return _PUNCT_RE.sub("", text)


def tokenize(text: str) -> list[str]:
    """Whitespace tokenization; '' -> [] (str.split with no args collapses runs)."""
    return text.split()


class _TextExtractor(HTMLParser):
    """stdlib HTML -> text. Deterministic, dependency-free.

    Emits text nodes (entity-unescaped by HTMLParser with convert_charrefs),
    newline at block boundaries, collapses intra-line whitespace.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        elif tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data):
        if self._skip_depth == 0:
            self.parts.append(data)


def extract_text(html_doc: str | bytes) -> str:
    """HTML -> plain text. THE byte-identical function.

    Pipeline: parse (entities unescaped), block tags -> newlines, collapse
    horizontal whitespace, strip each line, drop empty lines, join with \\n.
    """
    if isinstance(html_doc, (bytes, bytearray)):
        html_doc = html_doc.decode("utf-8", errors="replace")
    parser = _TextExtractor()
    parser.feed(html_doc)
    parser.close()
    raw = "".join(parser.parts)
    lines = []
    for line in raw.split("\n"):
        line = _WS_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def split_sentences(text: str) -> list[str]:
    """Sentence segmentation on [?.!] boundaries, keep >0-token sentences.

    Mirrors the reference's OpenSubtitles segmentation rule
    (unlabel_generator.py:27-38): split on ? . !, whitespace-tokenize,
    drop empties. The >10-token floor there is a corpus-specific filter,
    exposed separately as a predicate (operators.selection.min_tokens).
    """
    out = []
    for frag in re.split(r"[?.!]", text.replace("\n", " ")):
        frag = _WS_RE.sub(" ", frag).strip()
        if frag:
            out.append(frag)
    return out


# ----------------------------------------------------------------------
# Arrow-vectorized UDFs (the ONLY Python that runs inside the Spark plan)
# ----------------------------------------------------------------------

@F.pandas_udf(T.StringType())
def extract_text_udf(html_col: pd.Series) -> pd.Series:
    return html_col.map(extract_text)


@F.pandas_udf(T.StringType())
def normalize_line_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: normalize_line(x) if x is not None else None)


@F.pandas_udf(T.ArrayType(T.StringType()))
def split_sentences_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: split_sentences(x) if x is not None else [])


def strip_punct_col(col):
    """predict.py:81 as a JVM-side expression (no Python needed).

    Java's \\w/\\s differ from Python's even with (?U), so the class is
    spelled out in Unicode categories (divergences found by the
    hypothesis cross-engine property test):
      - Python \\w = alphanumeric-or-underscore = categories L*, Nd, Nl,
        No plus '_'. Java (?U)\\w uses \\p{Digit}=Nd only (drops
        superscripts etc.) and ADDS combining marks Mn/Mc/Me that Python
        does not treat as word chars.
      - Python \\s = Unicode White_Space PLUS the information separators
        U+001C-001F, which Java's \\s (White_Space property) excludes.
    """
    return F.regexp_replace(
        col, "(?U)[^\\p{L}\\p{Nd}\\p{Nl}\\p{No}_\\s\\x1c-\\x1f]", ""
    )
