"""JSON-lines corpus ingestion: the de-facto webtext exchange format.

Public corpora (C4, RefinedWeb/RedPajama dumps, OSCAR jsonl exports)
ship one JSON object per line — typically {"url": ..., "text": ...,
"timestamp": ...} plus free-form metadata. This reader maps that shape
onto the engine's pages schema with Spark's NATIVE json source:

  - an EXPLICIT schema (never schema inference — an inference pass reads
    the whole corpus twice and a poisoned line can widen a column for
    everyone; with a declared schema the JSON parser prunes to exactly
    the requested fields);
  - PERMISSIVE mode with a corrupt-record column, so a malformed line
    becomes a row with `parse_error` set instead of killing the job or
    silently vanishing (C5: no silent drops — the caller can count and
    route them);
  - .jsonl / .jsonl.gz / .json.gz all work (Spark's text-based sources
    decompress per file; gzip files are non-splittable so parallelism is
    file-granularity there, exactly like WARC).

Field names are parameters because every public dump spells them
slightly differently ("content", "raw_content", "date", ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CORRUPT = "_corrupt_jsonl"


def read_jsonl_pages(
    spark: SparkSession,
    path: str,
    url_field: str = "url",
    text_field: str = "text",
    ts_field: str = "timestamp",
) -> DataFrame:
    """JSONL file(s)/dir -> (url, warc_ts, text, parse_error).

    Timestamps are parsed as TIMESTAMP_NTZ (wall time as written — the
    engine's session-timezone-independence rule; ISO-8601 'Z' suffixes
    are wall-UTC in these dumps). Lines that fail to parse OR parse to
    an object missing the text field surface with parse_error set and
    null payload columns.
    """
    schema = (
        f"`{url_field}` string, `{text_field}` string, "
        f"`{ts_field}` string, `{_CORRUPT}` string"
    )
    raw = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    bad_line = F.col(_CORRUPT).isNotNull()
    no_text = F.col(text_field).isNull()
    # try_cast, NOT to_timestamp_ntz: under Spark 4's ANSI default an
    # unparseable timestamp string makes to_timestamp_ntz THROW, killing
    # the whole ingest job on one bad line. try_cast yields null...
    ts = F.regexp_replace(F.col(ts_field), r"Z$", "").try_cast(
        "timestamp_ntz")
    # ...and that null is then a countable error, not a silent one: a
    # null warc_ts would later be dropped without trace by any
    # watermark/window operator downstream (C5 rule). A ts field that is
    # absent/null in the source object stays a plain null warc_ts —
    # only present-but-unparseable values are flagged.
    bad_ts = F.col(ts_field).isNotNull() & ts.isNull()
    return raw.select(
        F.col(url_field).alias("url"),
        ts.alias("warc_ts"),
        F.col(text_field).alias("text"),
        F.when(bad_line, F.concat(F.lit("unparseable: "),
                                  F.substring(F.col(_CORRUPT), 1, 120)))
        .when(no_text, F.lit(f"missing field: {text_field}"))
        .when(bad_ts, F.concat(F.lit(f"bad timestamp ({ts_field}): "),
                               F.substring(F.col(ts_field), 1, 64)))
        .alias("parse_error"),
    )
