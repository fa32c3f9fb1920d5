"""JSONL corpus source: explicit-schema parse, corrupt-line surfacing,
gz handling, and feeding the fused pipeline."""

import gzip
import json


def _write(tmp_path, name, lines, gz=False):
    p = tmp_path / name
    data = "\n".join(lines).encode()
    p.write_bytes(gzip.compress(data) if gz else data)
    return str(p)


def test_jsonl_pages_parse_and_errors(spark, tmp_path):
    from thesis_ner_co_tri_training_spark.sources.jsonl import (
        read_jsonl_pages)

    lines = [
        json.dumps({"url": "http://a/1", "text": "hello world",
                    "timestamp": "2024-01-02T03:04:05Z"}),
        json.dumps({"url": "http://a/2", "text": "zwei texte",
                    "timestamp": "2024-01-02T03:04:06Z", "extra": 1}),
        '{"url": "http://a/3", "text": "bro',          # truncated JSON
        json.dumps({"url": "http://a/4",
                    "timestamp": "2024-01-02T03:04:07Z"}),  # no text
    ]
    df = read_jsonl_pages(spark, _write(tmp_path, "corpus.jsonl", lines))
    rows = {r["url"]: r for r in df.collect() if r["url"] is not None}
    assert rows["http://a/1"]["text"] == "hello world"
    assert rows["http://a/1"]["parse_error"] is None
    assert str(rows["http://a/1"]["warc_ts"]) == "2024-01-02 03:04:05"
    assert rows["http://a/2"]["parse_error"] is None
    assert rows["http://a/4"]["parse_error"] == "missing field: text"
    bad = [r for r in df.collect() if r["parse_error"]
           and r["parse_error"].startswith("unparseable")]
    assert len(bad) == 1 and df.count() == 4  # nothing silently dropped


def test_jsonl_gz_and_pipeline_feed(spark, tmp_path):
    from thesis_ner_co_tri_training_spark.operators.tagging import (
        tag_and_vote_pages_df)
    from thesis_ner_co_tri_training_spark.sources.jsonl import (
        read_jsonl_pages)
    from thesis_ner_co_tri_training_spark.sources.pages import gen_page

    lines = []
    for pid in range(30):
        page = gen_page(pid)
        lines.append(json.dumps({
            "url": page["url"], "text": page["text"],
            "timestamp": "2024-03-04T05:06:07Z"}))
    path = _write(tmp_path, "corpus.jsonl.gz", lines, gz=True)
    pages = read_jsonl_pages(spark, path)
    assert pages.filter("parse_error IS NOT NULL").count() == 0
    # already-extracted text: the fused tagger takes the text branch
    voted = tag_and_vote_pages_df(pages.select("url", "text"))
    assert voted.count() > 0
    assert set(voted.columns) >= {"url", "tokens", "tags", "confs"}


def test_jsonl_bad_timestamp_is_countable_not_silent(spark, tmp_path):
    """A present-but-unparseable timestamp must set parse_error (a null
    warc_ts would later vanish silently at any watermark/window — C5);
    an absent/null ts field stays a plain null warc_ts, unflagged."""
    from thesis_ner_co_tri_training_spark.sources.jsonl import (
        read_jsonl_pages)

    lines = [
        json.dumps({"url": "http://b/1", "text": "ok",
                    "timestamp": "2024-01-02T03:04:05Z"}),
        json.dumps({"url": "http://b/2", "text": "ok",
                    "timestamp": "April 25, 2019"}),      # unparseable
        json.dumps({"url": "http://b/3", "text": "ok"}),  # no ts field
    ]
    df = read_jsonl_pages(spark, _write(tmp_path, "ts.jsonl", lines))
    rows = {r["url"]: r for r in df.collect()}
    assert rows["http://b/1"]["parse_error"] is None
    assert rows["http://b/2"]["warc_ts"] is None
    assert rows["http://b/2"]["parse_error"].startswith("bad timestamp")
    assert "April 25" in rows["http://b/2"]["parse_error"]
    assert rows["http://b/3"]["warc_ts"] is None
    assert rows["http://b/3"]["parse_error"] is None
