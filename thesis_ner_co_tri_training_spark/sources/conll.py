"""S3/S4/S5 — labeled-corpus scans (OntoNotes CoNLL, ISW TSV, Tweets TSV).

Pure parsers mirror the reference preprocessors line-for-line (quirks
kept verbatim) and are shared with the test oracle; the Spark scan is a
binaryFile read + one Arrow pass per file (files are the parallelism
unit, exactly how a cluster ingests many per-split corpus shards).

  OntoNotes  preprocessor.py:131-162  word=col0 tag=col3; boundary =
             empty line or '-DOCSTART' prefix; trailing sentence kept.
  ISW        preprocessor.py:179-208  skip raw lines starting with
             'idx'/'0'/'NONE'; boundary when '?' or '.' occurs in col2;
             keep (col3 word, col6 tag) when col3 != 'NONE'; 'NONE' tags
             -> 'O' at the end.
  Tweets     preprocessor.py:210-257  skip '#' comments; boundary =
             stripped line starting with 'NONE'; word=col1 tag=col3;
             'NONE' -> 'O'.

Label vocabulary (A5): sorted distinct tags + [CLS]/[SEP] sentinels
(preprocessor.py:125-129, 173-177); the ISW variant applies the NONE->O
map AFTER sorting (reference quirk: order reflects 'NONE', not 'O').
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SENTS_SCHEMA = ("path string, sent_id bigint, text string, "
                "tags array<string>")


def parse_onto(lines: list[str]) -> list[tuple[str, list[str]]]:
    out, sentence, label = [], [], []
    for line in lines:
        line = line.strip()
        splits = line.split("\t")
        if len(line) == 0 or line.startswith("-DOCSTART"):
            if len(label) > 0 and len(sentence) > 0:
                out.append((" ".join(sentence), label))
                sentence, label = [], []
            continue
        sentence.append(splits[0])
        label.append(splits[3])
    if len(label) > 0 and len(sentence) > 0:
        out.append((" ".join(sentence), label))
    return out


def parse_isw(lines: list[str]) -> list[tuple[str, list[str]]]:
    out, sentence, label = [], [], []
    for raw in lines:
        if raw.startswith("idx") or raw.startswith("0") or raw.startswith("NONE"):
            continue
        line = raw.strip()
        splits = line.split("\t")
        if "?" in splits[2] or "." in splits[2]:
            if len(label) > 0 and len(sentence) > 0:
                out.append((" ".join(sentence), label))
                sentence, label = [], []
            continue
        if splits[3] != "NONE":
            sentence.append(splits[3])
            label.append(splits[6])
    if len(label) > 0 and len(sentence) > 0:
        out.append((" ".join(sentence), label))
    return [(s, [t if t != "NONE" else "O" for t in tags]) for s, tags in out]


def parse_tweets(lines: list[str]) -> list[tuple[str, list[str]]]:
    out, sentence, label = [], [], []
    for raw in lines:
        if raw.startswith("#"):
            continue
        line = raw.strip()
        splits = line.split("\t")
        if line.startswith("NONE"):
            if len(label) > 0 and len(sentence) > 0:
                out.append((" ".join(sentence), label))
                sentence, label = [], []
            continue
        sentence.append(splits[1])
        label.append(splits[3])
    if len(label) > 0 and len(sentence) > 0:
        out.append((" ".join(sentence), label))
    return [(s, [t if t != "NONE" else "O" for t in tags]) for s, tags in out]


PARSERS: dict[str, Callable[[list[str]], list[tuple[str, list[str]]]]] = {
    "onto": parse_onto,
    "isw": parse_isw,
    "tweets": parse_tweets,
}


def label_vocabulary(tags_flat: list[str], fmt: str = "onto") -> list[str]:
    """A5: sorted distinct + sentinels; ISW/Tweets map NONE->O after sort."""
    vocab = sorted(set(tags_flat))
    if fmt in ("isw", "tweets"):
        vocab = [t if t != "NONE" else "O" for t in vocab]
    return vocab + ["[CLS]", "[SEP]"]


def conll_scan(spark: SparkSession, path_glob: str, fmt: str = "onto",
               glob_filter: str = "*") -> DataFrame:
    """Distributed corpus scan -> (path, sent_id, text, tags).

    One task per file group; line order within a file (the parsers'
    correctness requirement) is preserved because each file is parsed
    whole inside its task.
    """
    parser = PARSERS[fmt]
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob_filter)
        .option("recursiveFileLookup", "true")
        .load(path_glob)
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, ids, texts, tags = [], [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                lines = bytes(content).decode("utf-8").splitlines(keepends=True)
                for i, (s, lbl) in enumerate(parser(lines)):
                    paths.append(path)
                    ids.append(i)
                    texts.append(s)
                    tags.append(lbl)
            if paths:
                # a zero-row chunk must yield NOTHING: pd.DataFrame of
                # empty lists infers float64 columns, which Arrow cannot
                # convert to array<string>
                yield pd.DataFrame({
                    "path": paths, "sent_id": ids, "text": texts,
                    "tags": tags,
                })

    return files.mapInPandas(run, SENTS_SCHEMA)
