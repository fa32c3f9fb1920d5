"""S2 — recursive XML corpus scan (OpenSubtitles-style).

Reference: `unlabel_generator.py:12-40` — walk directories for `*.xml`,
pull `<w>` word nodes; a token CONTAINING ? . or ! is a sentence boundary
and is itself dropped; `"` tokens are dropped; a sentence is emitted only
when > min_tokens tokens long (reference uses 10). Reference quirk kept
verbatim: at a boundary, a buffer of <= min_tokens tokens is NOT reset
(only the emit branch clears it), so short fragments accumulate into the
next sentence (unlabel_generator.py:30-34).

Spark-first: `binaryFile` scan (splittable listing, one task per file
group) + one Arrow pass doing the stdlib `xml.etree` parse. The pure
function `xml_to_sentences` is shared with the test oracle, so the
operator is correct by construction.
"""

from __future__ import annotations

from typing import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SENTENCES_SCHEMA = "path string, sent_id bigint, text string"


def xml_to_sentences(payload: bytes | str, min_tokens: int = 10) -> list[str]:
    """Pure parser: <w> word nodes -> sentences (reference semantics)."""
    root = ElementTree.fromstring(payload)
    sents: list[str] = []
    cur: list[str] = []
    for w in root.iter("w"):
        tok = w.text or ""
        if "?" in tok or "." in tok or "!" in tok:
            if len(cur) > min_tokens:
                sents.append(" ".join(cur))
                cur = []
            continue
        if tok != '"':
            cur.append(tok)
    if len(cur) > min_tokens:  # trailing unterminated sentence
        sents.append(" ".join(cur))
    return sents


def xml_sentences(
    spark: SparkSession, path_glob: str, min_tokens: int = 10
) -> DataFrame:
    """Recursive *.xml scan -> (path, sent_id, text)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xml")
        .option("recursiveFileLookup", "true")
        .load(path_glob)
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, ids, texts = [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                for i, s in enumerate(xml_to_sentences(bytes(content), min_tokens)):
                    paths.append(path)
                    ids.append(i)
                    texts.append(s)
            yield pd.DataFrame({"path": paths, "sent_id": ids, "text": texts})

    return files.mapInPandas(run, SENTENCES_SCHEMA)
