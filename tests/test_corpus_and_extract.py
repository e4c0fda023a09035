"""Corpus determinism + extraction byte-identity.

Mirrors the reference's stable-output care (sorted elfDependencies,
surfactant/infoextractors/elf_file.py:172-173) and its posix_normpath
unit tests (tests/relationships/test_posix_utils.py).
"""

import gzip

from surfactant_spark.functions.extract import (
    html_to_text,
    maybe_gunzip,
    posix_normpath,
    resolve_href,
    split_url,
)
from surfactant_spark.testing.corpus import DUP_MOD, GZIP_MOD, make_page


def test_make_page_deterministic():
    a = make_page(17, 1000)
    b = make_page(17, 1000)
    assert a.html == b.html and a.text == b.text and a.url == b.url


def test_duplicate_rule_shares_content():
    pid = DUP_MOD - 1  # duplicate of pid-1
    dup = make_page(pid, 1000)
    orig = make_page(pid - 1, 1000)
    assert maybe_gunzip(dup.html) == maybe_gunzip(orig.html)
    assert dup.url != orig.url
    assert dup.text == orig.text


def test_gzip_rule():
    pid = 3
    assert pid % GZIP_MOD == 3
    pg = make_page(pid, 1000)
    assert pg.html[:2] == b"\x1f\x8b"
    assert gzip.decompress(pg.html).startswith(b"<html>")


def test_extraction_byte_identity_sample():
    for pid in range(0, 300):
        pg = make_page(pid, 300)
        s = maybe_gunzip(pg.html).decode("utf-8")
        assert html_to_text(s) == pg.text, pid


def test_posix_normpath():
    assert posix_normpath("/a/b/../c") == "/a/c"
    assert posix_normpath("/a//b/./c/") == "/a/b/c"
    assert posix_normpath("/../a") == "/a"
    assert posix_normpath("a/../../b") == "b"
    assert posix_normpath("/d1/s2/../../d3/x.html") == "/d3/x.html"


def test_resolve_href_forms():
    src = "http://h.example.org/d1/s2/page5.html"
    assert resolve_href(src, "http://other.org/x/y.html") == "http://other.org/x/y.html"
    assert resolve_href(src, "/a/b.html") == "http://h.example.org/a/b.html"
    assert resolve_href(src, "../../d3/s4/p.html") == "http://h.example.org/d3/s4/p.html"
    assert resolve_href(src, "p2.html") == "http://h.example.org/d1/s2/p2.html"
    assert resolve_href(src, "mailto:x@y") is None
    assert resolve_href(src, "javascript:void(0)") is None
    assert split_url("not a url") is None


def test_corrupt_gzip_falls_back_to_raw():
    assert maybe_gunzip(b"\x1f\x8btruncated!!") == b"\x1f\x8btruncated!!"
    assert maybe_gunzip(b"") == b""


def test_spark_extraction_matches_text_column(spark):
    from pyspark.sql import functions as F

    from surfactant_spark.operators.extract import extract_pages
    from surfactant_spark.sources.pages import synth_pages

    pages = synth_pages(spark, 200)
    ext = extract_pages(pages)
    joined = ext.alias("e").join(pages.alias("p"), "url").where(
        F.col("e.text") != F.col("p.text")
    )
    assert joined.count() == 0
