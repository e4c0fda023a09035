"""WARC source: records are built with a from-scratch forward writer
(like the archive/JPEG tests), so the parser must invert real
bitstreams rather than fixtures it produced itself."""

import gzip

from surfactant_spark.sources.warc import (
    parse_warc_records,
    read_warc,
    split_gzip_members,
    split_http_response,
)


def _record(rtype: str, uri: str, date: str, block: bytes) -> bytes:
    hdrs = [
        b"WARC/1.0",
        f"WARC-Type: {rtype}".encode(),
        f"WARC-Record-ID: <urn:uuid:{rtype}-{len(block)}>".encode(),
        f"WARC-Date: {date}".encode(),
        f"Content-Length: {len(block)}".encode(),
    ]
    if uri:
        hdrs.insert(2, f"WARC-Target-URI: {uri}".encode())
    return b"\r\n".join(hdrs) + b"\r\n\r\n" + block + b"\r\n\r\n"


def _http(body: bytes, ctype: str = "text/html") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\n"
        + f"Content-Type: {ctype}\r\n".encode()
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
    )


def _sample_warc() -> bytes:
    return (
        _record("warcinfo", "", "2026-01-01T00:00:00Z", b"software: test\r\n")
        + _record(
            "request",
            "http://a.com/x",
            "2026-01-02T00:00:00Z",
            b"GET /x HTTP/1.1\r\nHost: a.com\r\n\r\n",
        )
        + _record(
            "response",
            "http://a.com/x",
            "2026-01-02T00:00:00Z",
            _http(b"<html>alpha</html>"),
        )
        + _record(
            "response",
            "http://b.com/y",
            "2026-01-03T00:00:00Z",
            _http(b"<html>beta</html>"),
        )
    )


def test_parse_warc_records_and_http_split():
    recs = parse_warc_records(_sample_warc())
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "request", "response", "response",
    ]
    status, ctype, body = split_http_response(recs[2]["block"])
    assert (status, ctype, body) == (200, "text/html", b"<html>alpha</html>")
    # non-HTTP block passes through
    assert split_http_response(b"raw bytes") == (None, "", b"raw bytes")


def test_parse_warc_truncation_keeps_earlier_records():
    data = _sample_warc()
    # cut into the final record's body
    recs = parse_warc_records(data[:-12])
    assert len(recs) == 3  # last response dropped, rest kept


def test_split_gzip_members_multi():
    a, b = b"first-member", b"second-member"
    stream = gzip.compress(a) + gzip.compress(b)
    assert split_gzip_members(stream) == [a, b]
    assert split_gzip_members(b"plain") == [b"plain"]
    # truncated second member: first survives
    out = split_gzip_members(gzip.compress(a) + gzip.compress(b)[:-4])
    assert out[0] == a


def test_read_warc_spark_stage(spark, tmp_path):
    # one gzip member per record — the Common-Crawl layout
    members = parse_warc_records(_sample_warc())
    raw = _sample_warc()
    # re-split raw by record boundaries to gzip each one separately
    chunks, pos = [], 0
    for _ in range(4):
        nxt = raw.find(b"WARC/1.0", pos + 1)
        nxt = len(raw) if nxt < 0 else nxt
        chunks.append(raw[pos:nxt])
        pos = nxt
    gz = b"".join(gzip.compress(c) for c in chunks)
    (tmp_path / "seg.warc.gz").write_bytes(gz)
    (tmp_path / "plain.warc").write_bytes(raw)

    rows = read_warc(spark, str(tmp_path)).collect()
    # both files parse: 2 response records each
    assert len(rows) == 4
    by_url = sorted({(r.url, bytes(r.html)) for r in rows})
    assert by_url == [
        ("http://a.com/x", b"<html>alpha</html>"),
        ("http://b.com/y", b"<html>beta</html>"),
    ]
    assert all(r.http_status == 200 for r in rows)
    assert all(r.content_type == "text/html" for r in rows)
    assert {r.warc_ts for r in rows} == {
        "2026-01-02T00:00:00Z", "2026-01-03T00:00:00Z",
    }


def test_warc_roundtrip_into_identical_kg(spark, tmp_path):
    """Pages wrapped into WARC records and read back through the WARC
    source must produce the SAME knowledge graph as the original
    frame — the source is a faithful on-ramp, not a lossy one."""
    import gzip as _gzip

    from surfactant_spark.plans.catalog import SnapshotCatalog
    from surfactant_spark.plans.pipeline import run_pipeline
    from surfactant_spark.sources.pages import synth_pages
    from surfactant_spark.sources.warc import warc_to_pages

    pages = synth_pages(spark, 200)
    rows = pages.collect()
    warc = b"".join(
        _gzip.compress(
            _record(
                "response",
                r.url,
                r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                _http(bytes(r.html)),
            )
        )
        for r in rows
    )
    (tmp_path / "pages.warc.gz").write_bytes(warc)

    via_warc = warc_to_pages(read_warc(spark, str(tmp_path)))
    res_w = run_pipeline(
        spark, via_warc, SnapshotCatalog(str(tmp_path / "cat_w")),
        corpus_fingerprint="warc-200",
    )
    res_p = run_pipeline(
        spark, pages, SnapshotCatalog(str(tmp_path / "cat_p")),
        corpus_fingerprint="plain-200",
    )
    ew = {(r.subj, r.pred, r.obj) for r in res_w.edges.collect()}
    ep = {(r.subj, r.pred, r.obj) for r in res_p.edges.collect()}
    assert ew == ep and len(ew) > 0


def test_read_wet_conversion_records(spark, tmp_path):
    from surfactant_spark.sources.warc import read_wet

    wet = (
        _record("warcinfo", "", "2026-01-01T00:00:00Z", b"fmt: wet\r\n")
        + _record(
            "conversion", "http://a.com/x", "2026-01-02T00:00:00Z",
            "alpha extracted text é".encode("utf-8"),
        )
        + _record(
            "conversion", "http://b.com/y", "2026-01-03T00:00:00Z",
            b"beta text",
        )
        # response records must be ignored by the WET reader
        + _record(
            "response", "http://c.com/z", "2026-01-04T00:00:00Z",
            _http(b"<html>nope</html>"),
        )
    )
    p = tmp_path / "seg.warc.wet.gz"
    p.write_bytes(gzip.compress(wet))
    rows = {r.url: r for r in read_wet(spark, str(p)).collect()}
    assert set(rows) == {"http://a.com/x", "http://b.com/y"}
    assert rows["http://a.com/x"].text == "alpha extracted text é"
    assert rows["http://b.com/y"].warc_ts == "2026-01-03T00:00:00Z"


def test_read_cdx_parses_and_casts(spark, tmp_path):
    from surfactant_spark.sources.warc import read_cdx

    lines = "\n".join(
        [
            'com,a)/x 20260102000000 {"url": "http://a.com/x", "mime": '
            '"text/html", "status": "200", "digest": "AAA", "length": '
            '"1234", "offset": "0", "filename": "seg-00.warc.gz"}',
            'com,b)/y 20260103000000 {"url": "http://b.com/y", "mime": '
            '"application/pdf", "status": "404", "digest": "BBB", '
            '"length": "99", "offset": "4567", "filename": "seg-01.warc.gz"}',
            "garbage line without json",
        ]
    )
    p = tmp_path / "indexes.cdxj"
    p.write_text(lines)
    rows = {r.urlkey: r for r in read_cdx(spark, str(p)).collect()}
    assert set(rows) == {"com,a)/x", "com,b)/y"}  # garbage dropped
    a = rows["com,a)/x"]
    assert (a.ts, a.url, a.status, a.length, a.offset) == (
        "20260102000000", "http://a.com/x", 200, 1234, 0
    )
    assert rows["com,b)/y"].filename == "seg-01.warc.gz"


def test_split_http_response_dechunks():
    """Transfer-Encoding: chunked bodies (real Common Crawl records) are
    de-chunked — hex framing must not leak into the html column."""
    from surfactant_spark.sources.warc import split_http_response

    body = b"7\r\n<html>h\r\n6\r\nello</\r\n5\r\nhtml>\r\n0\r\n\r\n"
    block = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + body
    )
    status, ctype, out = split_http_response(block)
    assert (status, ctype) == (200, "text/html")
    assert out == b"<html>hello</html>"

    # non-chunked responses unchanged
    plain = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>x</p>"
    )
    assert split_http_response(plain)[2] == b"<p>x</p>"

    # malformed framing: decoded prefix survives, garbage tail dropped
    bad = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"4\r\ngood\r\nZZ\r\nnope"
    )
    assert split_http_response(bad)[2] == b"good"
