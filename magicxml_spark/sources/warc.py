"""WARC (ISO 28500) web-archive source — the Common Crawl ingestion
path of a training-data pipeline.

Not a reference feature (the reference ingests catalog XML/CSV over
HTTP); this is part of the LLM-data-pipeline extension: raw crawl
archives land as .warc / .warc.gz files, and the pipeline needs them
as one row per response record with the HTTP envelope split off and
the HTML payload reduced to plain text (stdlib HTMLParser with
script/style/head skipping — see _TextExtractor).

Format per the public ISO 28500 / WARC 1.0 spec: records are
``WARC/1.x CRLF header-lines CRLF CRLF block CRLF CRLF`` with the block
length in ``Content-Length``; response records carry an HTTP/1.x
message as the block. Gzipped archives are MULTI-MEMBER (one gzip
member per record, the Common Crawl layout) — ``zlib`` decompresses
them member-by-member via ``unused_data``; whole-file single-member
gzip works through the same loop.

Spark shape: ``binaryFile`` ingest -> ``mapInPandas`` (Arrow batches,
one task per archive — embarrassingly parallel across files, the unit
Common Crawl already shards at ~1 GB). No driver-side parsing.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "warc_file string, record_offset bigint, warc_type string, "
    "record_id string, target_uri string, warc_date string, "
    "payload_type string, http_status int, http_content_type string, "
    "payload binary, text string"
)


def _gunzip_members(data: bytes) -> bytes:
    """Concatenate every gzip member (per-record members in Common
    Crawl archives; a single whole-file member degenerates to one)."""
    out = bytearray()
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out += d.decompress(rest)
        out += d.flush()
        rest = d.unused_data
    return bytes(out)


def _split_http(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an HTTP/1.x response block;
    (None, None, block) when the block is not an HTTP message."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    head, _, body = block.partition(b"\r\n\r\n")
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, block
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return status, ctype, body


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Parse one archive's records. Tolerant of trailing garbage and
    CRLF padding between records; stops at the first structurally
    unparseable record boundary (a truncated tail yields the records
    before it — crawl archives are routinely truncated)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLF padding
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for ln in data[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = ln.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        block = data[head_end + 4 : head_end + 4 + clen]
        yield {
            "offset": pos,
            "headers": headers,
            "block": block,
        }
        pos = head_end + 4 + clen


class _TextExtractor:
    """Plain-text HTML reduction for crawl payloads: script/style/head
    contents dropped, entities unescaped (stdlib HTMLParser does both),
    whitespace collapsed. Distinct from functions/html's P17 cleaner,
    which reproduces the reference's description normalization (keeps
    paragraph wrapping) rather than extracting crawl text."""

    _SKIP = {"script", "style", "noscript", "template", "head"}

    def __init__(self) -> None:
        from html.parser import HTMLParser

        outer = self

        class _P(HTMLParser):
            def __init__(self) -> None:
                super().__init__(convert_charrefs=True)
                self.depth = 0
                self.parts: list[str] = []

            def handle_starttag(self, tag, attrs):
                if tag in outer._SKIP:
                    self.depth += 1

            def handle_endtag(self, tag):
                if tag in outer._SKIP and self.depth:
                    self.depth -= 1

            def handle_data(self, data):
                if not self.depth and data.strip():
                    self.parts.append(data)

        self._parser_cls = _P

    def extract(self, html: str) -> str:
        p = self._parser_cls()
        try:
            p.feed(html)
            p.close()
        except Exception:
            pass
        return " ".join(" ".join(p.parts).split())


_EXTRACTOR = _TextExtractor()


def _html_to_text(body: bytes) -> str:
    return _EXTRACTOR.extract(body.decode("utf-8", "replace"))


def read_warc(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    record_types: tuple[str, ...] = ("response",),
    extract_text: bool = True,
) -> DataFrame:
    """One row per WARC record of the requested types across every
    archive under ``path``: WARC envelope fields, the HTTP status /
    content type for response records, the raw payload, and (for
    text/html payloads) the cleaned text."""
    from magicxml_spark.sources.binary_docs import read_binary

    types = tuple(t.lower() for t in record_types)
    want_text = extract_text

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for rec in iter_warc_records(bytes(content)):
                    h = rec["headers"]
                    wtype = h.get("warc-type", "")
                    if types and wtype.lower() not in types:
                        continue
                    status, ctype, body = _split_http(rec["block"])
                    payload_type = ctype or h.get("content-type")
                    is_html = bool(
                        payload_type and payload_type.split(";")[0].strip()
                        in ("text/html", "application/xhtml+xml")
                    )
                    rows.append(
                        (
                            path_,
                            rec["offset"],
                            wtype,
                            h.get("warc-record-id"),
                            h.get("warc-target-uri"),
                            h.get("warc-date"),
                            payload_type,
                            status,
                            ctype,
                            body,
                            _html_to_text(body) if (want_text and is_html) else None,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file",
                    "record_offset",
                    "warc_type",
                    "record_id",
                    "target_uri",
                    "warc_date",
                    "payload_type",
                    "http_status",
                    "http_content_type",
                    "payload",
                    "text",
                ],
            )

    return read_binary(spark, path, glob).mapInPandas(batches, WARC_SCHEMA)


def warc_to_documents(warc_df: DataFrame) -> DataFrame:
    """Project response records into the pipeline's ``documents`` shape
    (doc_id from the record id digest, url, fetch timestamp, text) —
    ready for the dedup / quality / curation operators downstream."""
    return (
        warc_df.filter(
            (F.col("http_status") == 200) & F.col("text").isNotNull()
        )
        .select(
            F.xxhash64("record_id").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.to_timestamp("warc_date").alias("fetched_at"),
            "text",
        )
    )
