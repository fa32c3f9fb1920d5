"""WARC ingestion: Common-Crawl's container format -> the pages schema.

A WARC file is a sequence of records:

    WARC/1.0\r\n
    <warc-headers: Name: value \r\n ...>\r\n
    \r\n
    <Content-Length bytes of block>\r\n\r\n

For `WARC-Type: response` records the block is an HTTP response (status
line + headers + \r\n\r\n + body); the body is the page HTML. This reader
parses exactly that subset — enough to ingest a Common-Crawl-style dump
into the engine's (url, warc_ts, html) pages shape — in pure Python over
Spark's binaryFile source, Arrow-batched: one WARC file per task (WARC
files are not splittable without an index; Common Crawl ships ~1GB files,
so file-granularity parallelism is the real layout). gzip members
(.warc.gz) are handled per-file.

Writer helper `write_warc` exists for tests/fixtures: it round-trips
`sources.pages.gen_page` pages byte-identically.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_OUT_SCHEMA = (
    "url string, warc_ts timestamp_ntz, html binary, warc_file string, "
    "parse_error string"
)


def parse_warc_bytes(data: bytes) -> Iterator[tuple[str, datetime, bytes]]:
    """Yield (url, warc_date, html_body) for every response record."""
    if data[:2] == b"\x1f\x8b":  # gzip member(s)
        data = gzip.decompress(data)
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data[pos:].startswith(b"WARC/"):
            # Desync: a bad/short Content-Length landed us mid-block. A
            # silent `break` here would drop every remaining record with
            # parse_error null (violating the C5 no-silent-drops rule) —
            # raise so read_warc's per-file handler records the failure.
            raise ValueError(
                f"WARC desync at byte {pos}: expected record header, "
                f"got {data[pos:pos + 16]!r}"
            )
        head_end = data.index(b"\r\n\r\n", pos)
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode()
        length = int(headers.get("content-length", "0"))
        block = data[head_end + 4:head_end + 4 + length]
        pos = head_end + 4 + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = datetime.fromisoformat(
            headers.get("warc-date", "1970-01-01T00:00:00Z").replace("Z", "+00:00")
        ).astimezone(timezone.utc).replace(tzinfo=None)
        http_end = block.find(b"\r\n\r\n")
        body = block[http_end + 4:] if http_end >= 0 else block
        yield url, ts, body


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC dir/glob -> (url, warc_ts, html, warc_file).

    binaryFile scan (one file per row) -> mapInPandas parse. At crawl
    scale the parallel unit is the WARC file, matching how Common Crawl
    shards its dumps; downstream everything is the ordinary pages flow
    (tag_and_vote_pages_df consumes the html column directly).
    """
    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "warc_ts": [], "html": [],
                   "warc_file": [], "parse_error": []}
            for fname, content in zip(pdf["path"], pdf["content"]):
                # C5 rule (no silent drops): a malformed WARC file must
                # not kill the task NOR vanish — it becomes one row with
                # parse_error set, countable downstream in stage metrics.
                try:
                    records = list(parse_warc_bytes(bytes(content)))
                except Exception as exc:
                    out["url"].append(None)
                    out["warc_ts"].append(None)
                    out["html"].append(None)
                    out["warc_file"].append(fname)
                    out["parse_error"].append(f"{type(exc).__name__}: {exc}")
                    continue
                for url, ts, body in records:
                    out["url"].append(url)
                    out["warc_ts"].append(ts)
                    out["html"].append(body)
                    out["warc_file"].append(fname)
                    out["parse_error"].append(None)
            if out["warc_file"]:
                # zero-row chunks yield nothing (empty float64 columns
                # don't Arrow-convert to timestamp/binary)
                yield pd.DataFrame(out)

    return files.select("path", "content").mapInPandas(run, PAGES_OUT_SCHEMA)


def write_warc(pages: list[dict], out_path: str, compress: bool = False) -> None:
    """Test/fixture helper: pages (url, warc_ts, html) -> one WARC file."""
    buf = io.BytesIO()
    for p in pages:
        body = p["html"] if isinstance(p["html"], (bytes, bytearray)) else str(p["html"]).encode()
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + bytes(body)
        ts = p["warc_ts"]
        date = (ts if isinstance(ts, str)
                else ts.strftime("%Y-%m-%dT%H:%M:%SZ"))
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {p['url']}\r\n".encode()
            + f"WARC-Date: {date}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n"
        )
        buf.write(head + b"\r\n" + http + b"\r\n\r\n")
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data)
    with open(out_path, "wb") as fh:
        fh.write(data)
