"""From-scratch WARC (ISO 28500) source — the Common-Crawl input
format, parsed with no third-party deps.

A WARC file is a concatenation of records::

    WARC/1.0\r\n
    <header-name>: <value>\r\n ...
    \r\n
    <Content-Length bytes of block>
    \r\n\r\n

Response records carry an HTTP message as their block (status line +
headers + body); Common Crawl ships one gzip member PER RECORD, so a
``.warc.gz`` is a multi-member gzip stream (zlib decompressobj loop —
``gzip.decompress`` also handles it, but streaming member-at-a-time
keeps peak memory at one record).

Spark shape: ``spark.read.format("binaryFile")`` over the WARC paths →
one Arrow-batched ``mapInPandas`` stage emitting one row per response
record — the same executor-side parse-don't-ship pattern as the
archive expansion (operators/archives.py).  At 100 TB the unit of
parallelism is the WARC file (Common Crawl segments are ~1 GB), so the
scan parallelizes across files; records inside a file are sequential
by format design (gzip members), exactly like the reference's
per-specimen archive walk (file_decompression.py).

Reference parity: the S1/S3 scan+decompress family
(surfactant/cmd/generate.py directory walk + file_decompression.py)
re-expressed for the web-archive container format.
"""

from __future__ import annotations

import zlib
from typing import Iterator

CRLF = b"\r\n"


def split_gzip_members(data: bytes) -> list[bytes]:
    """Decompress a (possibly multi-member) gzip stream into the list
    of member payloads; non-gzip input comes back as ``[data]``."""
    if not data.startswith(b"\x1f\x8b"):
        return [data]
    out = []
    rest = data
    while rest.startswith(b"\x1f\x8b"):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(rest))
        if not d.eof:  # truncated member: keep what inflated, stop
            break
        rest = d.unused_data
    return out


def parse_warc_records(data: bytes) -> list[dict]:
    """Parse concatenated WARC records (already decompressed).

    Returns one dict per record: ``warc_type``, ``warc_target_uri``,
    ``warc_date``, ``record_id``, ``content_type`` (of the block),
    ``block`` (raw bytes).  Tolerates trailing garbage and truncated
    final records (parse stops, earlier records are kept) — the same
    truncation policy as the TAR/ZIP parsers (functions/archive.py).
    """
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos:pos + 2] == CRLF:
            pos += 2
        if not data[pos:pos + 5] == b"WARC/":
            break
        hdr_end = data.find(CRLF + CRLF, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(CRLF)
        for ln in lines[1:]:
            k, sep, v = ln.partition(b":")
            if sep:
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = hdr_end + 4
        if body_start + clen > n:
            break  # truncated final record
        records.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "warc_target_uri": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "record_id": headers.get("warc-record-id", ""),
                "content_type": headers.get("content-type", ""),
                "block": data[body_start:body_start + clen],
            }
        )
        pos = body_start + clen
    return records


def _dechunk(body: bytes) -> bytes:
    """Decode a Transfer-Encoding: chunked HTTP body (RFC 9112 §7.1):
    ``<hex-size>[;ext]CRLF <data> CRLF`` repeated until a 0-size chunk.
    Real Common Crawl response records carry chunked bodies, and leaving
    the hex framing interleaved in the html corrupts extraction.
    Lenient on malformed framing: returns the chunks decoded so far plus
    nothing else (truncated tail dropped, matching the record walker's
    truncation policy)."""
    out = []
    pos = 0
    n = len(body)
    while pos < n:
        ln_end = body.find(CRLF, pos)
        if ln_end < 0:
            break
        size_tok = body[pos:ln_end].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break  # terminal chunk; trailers ignored
        start = ln_end + 2
        if start + size > n:
            break  # truncated chunk
        out.append(body[start:start + size])
        pos = start + size + 2  # skip trailing CRLF
    return b"".join(out)


def split_http_response(block: bytes) -> tuple[int | None, str, bytes]:
    """HTTP response block → (status, content_type header, body).
    Chunked transfer coding is decoded (Common Crawl records preserve
    the on-wire framing).  Returns ``(None, "", block)`` when the block
    is not HTTP."""
    if not block.startswith(b"HTTP/"):
        return None, "", block
    hdr_end = block.find(CRLF + CRLF)
    if hdr_end < 0:
        return None, "", block
    head = block[:hdr_end].split(CRLF)
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError):
        return None, "", block
    ctype = ""
    chunked = False
    for ln in head[1:]:
        k, sep, v = ln.partition(b":")
        if not sep:
            continue
        key = k.strip().lower()
        if key == b"content-type":
            ctype = v.strip().decode("latin-1")
        elif key == b"transfer-encoding" and b"chunked" in v.lower():
            chunked = True
    body = block[hdr_end + 4:]
    if chunked:
        body = _dechunk(body)
    return status, ctype, body


WARC_PAGE_SCHEMA = (
    "path string, url string, warc_ts string, http_status int, "
    "content_type string, html binary"
)


def warc_pages_stage(batches) -> Iterator:
    """mapInPandas stage: binaryFile rows (path, content) → one row
    per WARC *response* record, in the input-table page shape
    (url, warc_ts, html binary)."""
    import pandas as pd

    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            data = b"".join(split_gzip_members(bytes(content)))
            for rec in parse_warc_records(data):
                if rec["warc_type"] != "response":
                    continue
                status, ctype, body = split_http_response(rec["block"])
                rows.append(
                    (
                        path,
                        rec["warc_target_uri"],
                        rec["warc_date"],
                        status,
                        ctype or rec["content_type"],
                        body,
                    )
                )
        yield pd.DataFrame(
            rows,
            columns=[
                "path", "url", "warc_ts", "http_status", "content_type",
                "html",
            ],
        )


def read_warc(spark, path: str):
    """WARC file(s) → pages DataFrame (url, warc_ts, html, ...) via
    binaryFile scan + one Arrow stage.  Column pruning note: the
    binaryFile source loads whole files (that is the container's
    nature); prune/partition at the FILE level (path globs, segment
    dirs) like any Common-Crawl job."""
    binf = spark.read.format("binaryFile").load(path)
    return binf.select("path", "content").mapInPandas(
        warc_pages_stage, schema=WARC_PAGE_SCHEMA
    )


def warc_to_pages(df):
    """WARC response rows → the pipeline's pages contract
    (schema.PAGES_SCHEMA): keep 200-status text/html records, parse
    the WARC-Date into a timestamp, carry the body as ``html``.
    ``text``/``lang`` stay NULL — the extraction stage fills them."""
    from pyspark.sql import functions as F

    return (
        df.where(
            (F.col("http_status") == 200)
            & F.col("content_type").startswith("text/html")
        )
        .select(
            "url",
            F.to_timestamp(
                F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
            ).alias("warc_ts"),
            "html",
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
    )


WET_SCHEMA = "path string, url string, warc_ts string, text string"


def wet_pages_stage(batches) -> Iterator:
    """mapInPandas stage: binaryFile rows → one row per WARC
    *conversion* record (the WET extracted-text format Common Crawl
    ships alongside raw WARC) — (path, url, warc_ts, text)."""
    import pandas as pd

    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            data = b"".join(split_gzip_members(bytes(content)))
            for rec in parse_warc_records(data):
                if rec["warc_type"] != "conversion":
                    continue
                rows.append(
                    (
                        path,
                        rec["warc_target_uri"],
                        rec["warc_date"],
                        rec["block"].decode("utf-8", errors="replace"),
                    )
                )
        yield pd.DataFrame(rows, columns=["path", "url", "warc_ts", "text"])


def read_wet(spark, path: str):
    """WET file(s) → extracted-text DataFrame (url, warc_ts, text):
    same binaryFile + one-Arrow-stage shape as read_warc, but the
    records are conversion records whose block is already plain
    text — the input most text-pipeline jobs actually start from."""
    binf = spark.read.format("binaryFile").load(path)
    return binf.select("path", "content").mapInPandas(
        wet_pages_stage, schema=WET_SCHEMA
    )


def read_cdx(spark, path: str):
    """CDX-J capture-index reader: each line is
    ``<urlkey> <timestamp14> <json>`` (Common Crawl / OpenWayback
    cdxj).  Entirely JVM-side — one regexp split + ``from_json``, no
    Python UDF — so at 100 TB the index scan stays in whole-stage
    codegen and malformed lines become NULL-url rows that are
    filtered, not errors.

    Output: (urlkey, ts string, url, mime, status long, digest,
    length long, offset long, filename) — feed
    ``temporal.latest_capture`` for newest-per-url dedup before
    fetching bodies."""
    from pyspark.sql import functions as F

    lines = spark.read.text(path)
    rx = r"^(\S+) (\d+) (\{.*\})$"
    j = F.from_json(
        F.regexp_extract("value", rx, 3),
        "url string, mime string, status string, digest string, "
        "length string, offset string, filename string",
    )
    return (
        lines.select(
            F.regexp_extract("value", rx, 1).alias("urlkey"),
            F.regexp_extract("value", rx, 2).alias("ts"),
            j.alias("j"),
        )
        .select(
            "urlkey",
            "ts",
            F.col("j.url").alias("url"),
            F.col("j.mime").alias("mime"),
            F.col("j.status").cast("long").alias("status"),
            F.col("j.digest").alias("digest"),
            F.col("j.length").cast("long").alias("length"),
            F.col("j.offset").cast("long").alias("offset"),
            F.col("j.filename").alias("filename"),
        )
        .where(F.col("url").isNotNull())
    )
