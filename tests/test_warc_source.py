"""WARC source roundtrip: gen_page pages -> WARC file(s) -> read_warc ->
byte-identical html and the normal tagging flow downstream."""

import datetime as dt

from thesis_ner_co_tri_training_spark.operators.tagging import tag_and_vote_pages_df
from thesis_ner_co_tri_training_spark.sources.pages import gen_page
from thesis_ner_co_tri_training_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc,
)

N = 12


def _pages():
    out = []
    for i in range(N):
        p = gen_page(i)
        out.append({"url": p["url"], "warc_ts": p["warc_ts"], "html": p["html"]})
    return out


def test_warc_roundtrip_bytes():
    pages = _pages()
    import io

    # pure-python roundtrip (no Spark): bytes identical, order preserved
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".warc") as f:
        write_warc(pages, f.name)
        got = list(parse_warc_bytes(open(f.name, "rb").read()))
    assert [g[0] for g in got] == [p["url"] for p in pages]
    for (url, ts, body), p in zip(got, pages):
        want = p["html"] if isinstance(p["html"], bytes) else str(p["html"]).encode()
        assert body == bytes(want), url
        assert isinstance(ts, dt.datetime)


def test_read_warc_spark_and_downstream(spark, tmp_path):
    pages = _pages()
    d = tmp_path / "warcs"
    d.mkdir()
    write_warc(pages[: N // 2], str(d / "part-0.warc"))
    write_warc(pages[N // 2:], str(d / "part-1.warc.gz"), compress=True)

    df = read_warc(spark, str(d))
    rows = {r["url"]: bytes(r["html"]) for r in df.collect()}
    assert len(rows) == N
    for p in pages:
        want = p["html"] if isinstance(p["html"], bytes) else str(p["html"]).encode()
        assert rows[p["url"]] == bytes(want), p["url"]

    # the WARC output feeds the ordinary fused pipeline directly
    voted = tag_and_vote_pages_df(df.select("url", "html"))
    assert voted.count() > 0


def test_read_warc_malformed_file_records_error(spark, tmp_path):
    """A corrupt WARC file yields one parse_error row instead of killing
    the task or silently vanishing (C5: no silent drops)."""
    d = tmp_path / "warcs_bad"
    d.mkdir()
    write_warc(_pages()[:3], str(d / "good.warc"))
    (d / "bad.warc").write_bytes(b"WARC/1.0\r\nWARC-Type: response\r\nno-terminator")

    df = read_warc(spark, str(d))
    rows = df.collect()
    good = [r for r in rows if r["parse_error"] is None]
    bad = [r for r in rows if r["parse_error"] is not None]
    assert len(good) == 3
    assert len(bad) == 1 and "bad.warc" in bad[0]["warc_file"]
    assert bad[0]["url"] is None


def test_read_warc_desync_becomes_error_not_silent_drop(spark, tmp_path):
    """A record with a too-short Content-Length desyncs the parser
    mid-file; that must surface as a parse_error row — a silent `break`
    would drop every remaining record with parse_error null (C5)."""
    d = tmp_path / "warcs_desync"
    d.mkdir()
    good = _pages()[:4]
    write_warc(good, str(d / "good.warc"))
    # hand-build a file whose record 1 lies about its length: the parser
    # lands inside record 1's block and finds no WARC/ header
    body = b"HTTP/1.1 200 OK\r\n\r\n<html>x</html>"
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://d/1\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           + f"Content-Length: {len(body) - 10}\r\n".encode()
           + b"\r\n" + body + b"\r\n\r\n"
           b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://d/2\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           + f"Content-Length: {len(body)}\r\n".encode()
           + b"\r\n" + body + b"\r\n\r\n")
    (d / "desync.warc").write_bytes(rec)

    df = read_warc(spark, str(d))
    rows = df.collect()
    good_rows = [r for r in rows if r["parse_error"] is None]
    bad = [r for r in rows if r["parse_error"] is not None]
    assert len(good_rows) == 4
    assert len(bad) == 1 and "desync.warc" in bad[0]["warc_file"]
    assert "desync" in bad[0]["parse_error"]
