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


@given(st.text(alphabet="abcxyz/.:", min_size=0, max_size=20))
@settings(max_examples=200, deadline=None)
def test_resolve_href_total_and_absolute(href):
    """resolve_href never throws and yields absolute http urls or None."""
    out = resolve_href("http://h.org/a/b/c.html", href)
    assert out is None or out.startswith("http://")


@given(st.text(alphabet=" abgelmnoptz0123456789.-/", min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_mention_detection_total_and_first_match(text):
    """Detector is total on arbitrary text; at most one match per
    entity_key (first-match-wins invariant)."""
    compiled = compile_dictionary()
    out = detect_mentions_text(text, compiled)
    keys = [k for k, *_ in out]
    assert len(keys) == len(set(keys))
