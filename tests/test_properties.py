"""Property-based tests (hypothesis) for the pure extraction core —
the invariants the distributed pipeline relies on."""

from hypothesis import given, settings
from hypothesis import strategies as st

from surfactant_spark.functions.extract import (
    html_to_text,
    maybe_gunzip,
    posix_normpath,
    resolve_href,
)
from surfactant_spark.oracle.pyoracle import detect_mentions_text
from surfactant_spark.dictionary import compile_dictionary
from surfactant_spark.testing.corpus import canonical_text, make_page, page_body_parts, render_html


_seg = st.text(alphabet="abcdef123.", min_size=0, max_size=5)


@given(st.lists(_seg, max_size=8))
@settings(max_examples=200, deadline=None)
def test_normpath_idempotent_and_clean(segs):
    p = "/" + "/".join(segs)
    out = posix_normpath(p)
    assert posix_normpath(out) == out  # idempotent
    assert "//" not in out
    assert not any(s == ".." for s in out.split("/"))  # abs paths: no '..' survives
    assert out.startswith("/")


@given(st.integers(0, 5000), st.integers(1, 4))
@settings(max_examples=60, deadline=None)
def test_render_extract_roundtrip(pid, scale):
    """Extraction inverts rendering at any body scale — the
    byte-identity invariant."""
    n = 10_000
    html = render_html(pid, n, scale).decode()
    title, paras = page_body_parts(pid, scale)
    assert html_to_text(html) == canonical_text(title, paras)


@given(st.integers(0, 10_000))
@settings(max_examples=60, deadline=None)
def test_make_page_gunzip_total(pid):
    pg = make_page(pid, 10_001)
    content = maybe_gunzip(pg.html)
    assert content.startswith(b"<html>")
    assert html_to_text(content.decode()) == pg.text


@given(st.text(alphabet="abcxyz/.:?#", min_size=0, max_size=20))
@settings(max_examples=300, deadline=None)
def test_resolve_href_total_and_absolute(href):
    """resolve_href never throws; yields absolute http(s) urls or None;
    never emits a query string or fragment; is idempotent on its own
    absolute-url output."""
    out = resolve_href("http://h.org/a/b/c.html", href)
    assert out is None or out.startswith(("http://", "https://"))
    if out is not None:
        assert "#" not in out and "?" not in out
        assert resolve_href("http://h.org/x.html", out) == out


@given(
    st.text(alphabet="abc123.-", min_size=1, max_size=10),
    st.lists(st.sampled_from(["x", "yy", "..", "."]), max_size=6),
)
@settings(max_examples=200, deadline=None)
def test_resolve_href_protocol_relative(host, segs):
    """//host/path inherits the SOURCE scheme and the HREF host —
    never the source host (the round-1 mis-resolution)."""
    path = "/".join(segs)
    out = resolve_href("https://src.org/d/p.html", f"//{host}/{path}")
    assert out is not None and out.startswith(f"https://{host}/")
    assert "src.org" not in out
    out_http = resolve_href("http://src.org/d/p.html", f"//{host}/{path}")
    assert out_http.startswith(f"http://{host}/")


def test_resolve_href_golden_forms():
    src = "https://h.example.org/d1/s2/page.html"
    cases = {
        "//cdn.net/lib/a.js": "https://cdn.net/lib/a.js",
        "//cdn.net": "https://cdn.net/",  # bare network-path ref → root
        "//": None,  # hostless network-path ref
        "/a/b.html?q=1#f": "https://h.example.org/a/b.html",
        "p2.html?x=2": "https://h.example.org/d1/s2/p2.html",
        "#top": "https://h.example.org/d1/s2/page.html",
        "": "https://h.example.org/d1/s2/page.html",
        "?only=query": "https://h.example.org/d1/s2/page.html",
        "../../../../esc.html": "https://h.example.org/esc.html",
        "http://x.org/a/../b.html#s": "http://x.org/b.html",
        "mailto:a@b": None,
        "javascript:void(0)": None,
    }
    for href, exp in cases.items():
        assert resolve_href(src, href) == exp, (href, resolve_href(src, href), exp)


@given(st.text(alphabet=" abgelmnoptz0123456789.-/", min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_mention_detection_total_and_first_match(text):
    """Detector is total on arbitrary text; at most one match per
    entity_key (first-match-wins invariant)."""
    compiled = compile_dictionary()
    out = detect_mentions_text(text, compiled)
    keys = [k for k, *_ in out]
    assert len(keys) == len(set(keys))


_member_name = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-/", min_size=1, max_size=40
).filter(lambda s: not s.endswith("/") and not s.startswith("/") and "//" not in s)


@given(
    st.lists(
        st.tuples(_member_name, st.binary(max_size=200)),
        min_size=1, max_size=6, unique_by=lambda t: t[0],
    )
)
@settings(max_examples=60, deadline=None)
def test_zip_parser_round_trips_stdlib_archives(members):
    """Property: any stdlib-built ZIP (stored) parses back to exactly
    its members, names and bytes (S3 archive family)."""
    import io
    import zipfile

    from surfactant_spark.functions.archive import zip_members

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for n, d in members:
            zf.writestr(zipfile.ZipInfo(n, (1980, 1, 1, 0, 0, 0)), d)
    assert zip_members(buf.getvalue()) == members


@given(
    st.lists(
        st.tuples(_member_name, st.binary(max_size=200)),
        min_size=1, max_size=6, unique_by=lambda t: t[0],
    )
)
@settings(max_examples=60, deadline=None)
def test_tar_parser_round_trips_stdlib_archives(members):
    import io
    import tarfile

    from surfactant_spark.functions.archive import tar_members

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for n, d in members:
            ti = tarfile.TarInfo(n)
            ti.size, ti.mtime = len(d), 0
            tf.addfile(ti, io.BytesIO(d))
    assert tar_members(buf.getvalue()) == members


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_binary_parsers_total_on_junk(b):
    """Every header parser is total: junk → None or a dict, never an
    exception (the log-and-continue policy)."""
    from surfactant_spark.functions.archive import archive_members
    from surfactant_spark.functions.binmeta import parse_binary_meta
    from surfactant_spark.functions.mediadec import decode_media

    out = parse_binary_meta(b)
    assert out is None or isinstance(out, dict)
    assert isinstance(archive_members(b), list)
    m = decode_media(b)
    assert m is None or isinstance(m, dict)


@given(st.binary(min_size=0, max_size=5000))
@settings(max_examples=60, deadline=None)
def test_maybe_decompress_round_trips_every_codec(payload):
    """compress→sniff→decompress is exact for gzip/bzip2/xz, and raw
    payload bytes are returned untouched with codec=None (totality)."""
    import bz2
    import gzip
    import lzma

    from surfactant_spark.functions.archive import maybe_decompress

    assert maybe_decompress(gzip.compress(payload, mtime=0)) == ("gzip", payload)
    assert maybe_decompress(bz2.compress(payload)) == ("bzip2", payload)
    assert maybe_decompress(lzma.compress(payload, format=lzma.FORMAT_XZ)) == (
        "xz", payload,
    )
    # non-compressed inputs pass through (unless they start with a real
    # magic, in which case they must still never raise)
    codec, out = maybe_decompress(payload)
    if codec is None:
        assert out == payload


@given(st.text(alphabet="abcdefgh0123456789-_", min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_sample_key_range_and_independent_restatement(key):
    """The sampling hash lands in [0, 65536) and two independent
    derivations agree: hex-prefix parse vs big-endian digest bytes —
    membership is a pure function of (salt, key), nothing else."""
    import hashlib

    digest = hashlib.md5(f"s0|{key}".encode())
    via_hex = int(digest.hexdigest()[:4], 16)
    via_bytes = int.from_bytes(digest.digest()[:2], "big")
    assert via_hex == via_bytes
    assert 0 <= via_hex < (1 << 16)


def test_sample_key_spark_python_parity(spark):
    """Spark's sample_key column equals the pure-Python md5 derivation
    for a batch of keys (the cross-engine determinism the sampling
    oracles rely on)."""
    import hashlib

    from pyspark.sql import functions as F

    from surfactant_spark.operators.sampling import sample_key

    keys = [f"doc-{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "doc_id string")
    got = {r.doc_id: r.sk for r in
           df.select("doc_id", sample_key(F.col("doc_id")).alias("sk")).collect()}
    for k in keys:
        assert got[k] == int(hashlib.md5(f"s0|{k}".encode()).hexdigest()[:4], 16)


# ---------------------------------------------------------------------------
# Decoder properties: encode-with-random-content → decode must invert
# ---------------------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 6), st.integers(1, 6),
    st.lists(st.integers(0, 4), min_size=6, max_size=6),
    st.integers(0, 4),
    st.data(),
)
def test_png_roundtrip_random(w, h, filters, color_pick, data):
    """Any pixel content × any per-row filter type × any color type
    round-trips exactly through the PNG encoder/decoder pair."""
    from surfactant_spark.functions.mediadec import decode_png
    from tests.test_mediadec import make_png

    color = [0, 2, 3, 4, 6][color_pick]
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    plte = None
    if color == 3:
        plte = [(i * 17 % 256, i * 29 % 256, i * 43 % 256) for i in range(8)]
        rows = [
            tuple(
                (data.draw(st.integers(0, 7)),) for _x in range(w)
            )
            for _y in range(h)
        ]
    else:
        rows = [
            tuple(
                tuple(data.draw(st.integers(0, 255)) for _c in range(ch))
                for _x in range(w)
            )
            for _y in range(h)
        ]
    dec = decode_png(make_png([list(r) for r in rows], color=color,
                              filters=filters[:h], plte=plte))
    assert dec is not None and (dec["width"], dec["height"]) == (w, h)
    # expected RGB projection
    for y in range(h):
        for x in range(w):
            px = rows[y][x]
            if color == 0:
                want = (px[0],) * 3
            elif color == 2:
                want = px
            elif color == 3:
                want = plte[px[0]]
            elif color == 4:
                want = (px[0],) * 3
            else:
                want = px[:3]
            assert dec["rows"][y][x] == tuple(want), (color, x, y)


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 3), st.integers(1, 3), st.data())
def test_gif_roundtrip_random(bw, bh, data):
    from surfactant_spark.functions.mediadec import decode_gif
    from tests.test_mediadec import PAL4, make_gif

    w, h = bw * 3, bh * 2
    rows = [[data.draw(st.integers(0, 3)) for _ in range(w)] for _ in range(h)]
    dec = decode_gif(make_gif(rows, PAL4))
    assert dec is not None
    assert dec["rows"] == [[PAL4[v] for v in row] for row in rows]


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_jpeg_gray_roundtrip_random(data):
    """Random 8×8 luma content survives the full entropy+DCT round trip
    within integer-rounding error (flat quant tables)."""
    from surfactant_spark.functions.jpegdec import decode_jpeg
    from tests.test_jpegdec import encode_gray

    pix = [data.draw(st.integers(0, 255)) for _ in range(64)]
    dec = decode_jpeg(encode_gray(pix, 8, 8))
    assert dec is not None
    got = [dec["rows"][y][x][0] for y in range(8) for x in range(8)]
    assert max(abs(a - b) for a, b in zip(got, pix)) <= 2
