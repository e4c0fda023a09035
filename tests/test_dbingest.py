"""Offline pattern-DB ingest: RetireJS-shaped feed → dictionary rows,
content-hash freshness skip, exact-hash identification join — the
database_utils.py:166-189 / js_file.py:54-118 analogs without network.
"""

import hashlib
import json

import pytest

from surfactant_spark.dbingest import (
    hash_rows,
    identify_by_hash,
    ingest_pattern_db,
    parse_retirejs,
    retirejs_to_rows,
    text_rows,
)

FEED = {
    "alphalib": {
        "extractors": {
            "filename": [r"alphalib-(§§version§§)(\.min)?\.js"],
            "filecontent": [r"/\*! alphalib v(§§version§§)", r"badregex(["],
            "hashes": ["AABB01", "ccdd02"],
        }
    },
    "betajs": {
        "extractors": {
            "filecontent": [r"betajs/(§§version§§)"],
        }
    },
    "no-extractors": {"vulnerabilities": []},
}


def test_parse_and_row_mapping():
    clean = parse_retirejs(json.dumps(FEED))
    # invalid regex dropped, hashes lowercased, extractor-less lib skipped
    assert set(clean) == {"alphalib", "betajs"}
    assert clean["alphalib"]["filecontent"] == [r"/\*! alphalib v(§§version§§)"]
    assert clean["alphalib"]["hashes"] == ["aabb01", "ccdd02"]
    rows = retirejs_to_rows(clean)
    kinds = {(r[0], r[1]) for r in rows}
    assert ("alphalib", "content") in kinds
    assert ("alphalib", "filename") in kinds
    assert ("alphalib", "hash") in kinds
    assert ("betajs", "content") in kinds
    # deterministic: same input, same order
    assert rows == retirejs_to_rows(parse_retirejs(json.dumps(FEED)))
    # text_rows feeds compile_dictionary; filename/hash rows excluded
    assert {r[1] for r in text_rows(rows)} == {"content"}
    assert hash_rows(rows) == [("aabb01", "alphalib"), ("ccdd02", "alphalib")]


def test_parse_hostile_input():
    assert parse_retirejs("not json {") == {}
    assert parse_retirejs('["top-level-array"]') == {}
    assert parse_retirejs('{"lib": null}') == {}


def test_ingest_freshness_skip(tmp_path):
    feed = tmp_path / "feed.json"
    state = str(tmp_path / "state")
    feed.write_text(json.dumps(FEED))
    r1 = ingest_pattern_db(str(feed), state)
    assert r1.updated and r1.n_libraries == 2 and r1.rows
    # unchanged feed → parse skipped, identical rows from cache
    r2 = ingest_pattern_db(str(feed), state)
    assert not r2.updated and r2.rows == r1.rows and r2.feed_hash == r1.feed_hash
    # changed feed → re-parse
    feed.write_text(json.dumps({**FEED, "gammalib": {
        "extractors": {"filecontent": [r"gammalib (§§version§§)"]}}}))
    r3 = ingest_pattern_db(str(feed), state)
    assert r3.updated and r3.n_libraries == 3 and r3.feed_hash != r1.feed_hash
    # force re-parses even when unchanged
    r4 = ingest_pattern_db(str(feed), state, force=True)
    assert r4.updated and r4.rows == r3.rows


def test_ingested_rows_compile_and_detect(spark):
    """End-to-end: feed rows → compile_dictionary → detect_mentions
    finds a planted filecontent mention with the version group."""
    from surfactant_spark.dictionary import compile_dictionary
    from surfactant_spark.operators.mentions import detect_mentions

    rows = retirejs_to_rows(parse_retirejs(json.dumps(FEED)))
    compiled = compile_dictionary(text_rows(rows))
    assert {p.entity_key for p in compiled.patterns} == {"alphalib", "betajs"}
    content = spark.createDataFrame(
        [("c1", "en", "/*! alphalib v2.14.1 | MIT */ rest of bundle"),
         ("c2", "en", "nothing here")],
        "content_sha256 string, lang string, text string",
    )
    got = detect_mentions(content, compiled).collect()
    assert [(r.content_sha256, r.entity_key, r.version) for r in got] == [
        ("c1", "alphalib", "2.14.1")
    ]


def test_identify_by_hash(spark):
    rows = retirejs_to_rows(parse_retirejs(json.dumps(FEED)))
    content = spark.createDataFrame(
        [("AABB01",), ("ffff99",), ("ccdd02",), ("ccdd02",)],
        "content_sha256 string",
    )
    got = identify_by_hash(content, hash_rows(rows)).collect()
    assert {(r.content_sha256, r.entity_key) for r in got} == {
        ("aabb01", "alphalib"), ("ccdd02", "alphalib")
    }
    # empty DB → empty result with stable schema
    empty = identify_by_hash(content, [])
    assert empty.columns == ["content_sha256", "entity_key"]
    assert empty.count() == 0


def test_ingest_feed_with_bom_and_weird_bytes(tmp_path):
    feed = tmp_path / "feed.json"
    feed.write_bytes(b'\xef\xbb\xbf{"x": {"extractors": {"filecontent": ["ab(c)"]}}}')
    state = str(tmp_path / "state")
    r = ingest_pattern_db(str(feed), state)
    # BOM breaks json.loads → parse yields {} but ingest stays total
    assert r.rows == [] or r.rows  # no exception is the contract
    assert r.feed_hash == hashlib.sha256(feed.read_bytes()).hexdigest()


def test_identify_by_filename(spark):
    """Reference filename semantics (js_file.py:112-125, 140-149):
    first matching ≥1-group pattern per library wins, zero-group
    patterns are observational no-ops, query strings don't confuse
    the basename, libraries match independently."""
    from surfactant_spark.dbingest import filename_rows, identify_by_filename

    rows = retirejs_to_rows(parse_retirejs(json.dumps(FEED)))
    pairs = filename_rows(rows) + [
        # zero-group decoy FIRST: matches everything *.js but must
        # neither emit nor block the later capturing pattern
        ("gamma", r"\.js"),
        ("gamma", r"gamma[.-](§§version§§)\.js"),
        ("gamma", r"gamma-(§§version§§)-legacy\.js"),  # never reached for matches of the previous
    ]
    urls = spark.createDataFrame(
        [("https://cdn.x/lib/alphalib-2.14.1.min.js?v=7",),
         ("https://cdn.x/gamma.9.2.js",),
         ("https://cdn.x/alphalib-3.0.js#frag",),
         ("https://cdn.x/unrelated.js",)],
        "url string",
    )
    got = {(r.url, r.entity_key, r.version)
           for r in identify_by_filename(urls, pairs).collect()}
    assert got == {
        ("https://cdn.x/lib/alphalib-2.14.1.min.js?v=7", "alphalib", "2.14.1"),
        ("https://cdn.x/alphalib-3.0.js#frag", "alphalib", "3.0"),
        ("https://cdn.x/gamma.9.2.js", "gamma", "9.2"),
    }
    # empty pattern set → stable empty schema
    empty = identify_by_filename(urls, [])
    assert empty.columns == ["url", "entity_key", "version"] and empty.count() == 0


def test_filename_precedence_over_content(spark):
    """A file whose NAME matched takes filename identifications ONLY —
    its content matches are discarded (js_file.py:112-133 early
    return); content applies solely to filename-miss files."""
    from surfactant_spark.dbingest import (
        identify_by_filename,
        identify_with_filename_precedence,
    )

    pages = spark.createDataFrame(
        [("https://cdn.x/alphalib-2.0.js", "s1"),
         ("https://cdn.x/bundle.js", "s2"),
         ("https://cdn.x/plain.js", "s3")],
        "url string, content_sha256 string",
    )
    fids = identify_by_filename(
        pages, [("alphalib", r"alphalib-(§§version§§)\.js")]
    )
    content_ids = spark.createDataFrame(
        [("s1", "betajs", "9.9"),   # must be suppressed: s1's url matched by name
         ("s2", "betajs", "1.2")],
        "content_sha256 string, entity_key string, version string",
    )
    got = {(r.url, r.entity_key, r.version, r.matched_via)
           for r in identify_with_filename_precedence(pages, fids, content_ids).collect()}
    assert got == {
        ("https://cdn.x/alphalib-2.0.js", "alphalib", "2.0", "filename"),
        ("https://cdn.x/bundle.js", "betajs", "1.2", "content"),
    }


EMBA_CFG = """\
# EMBA native-lib cfg fixture — comment lines skipped
libcrypto;strict;;"";;
libcrypto;strict;;"";;
libssl;;;"OpenSSL (\\d+\\.\\d+\\.\\d+[a-z]?)";;
libssl;;;"TLSv1";;
zlib;;;"inflate (\\d+\\.\\d+\\.\\d+) Copyright"";;
libweird;;;"unclosed[(";;
libother;fuzzy;;"ignored-mode";;
short;line
"""


def test_parse_emba_cfg():
    from surfactant_spark.dbingest import emba_to_rows, parse_emba_cfg

    db = parse_emba_cfg(EMBA_CFG)
    # strict → lib name as filename literal, deduped across lines
    assert db["libcrypto"]["filename"] == ["libcrypto"]
    assert db["libcrypto"]["filecontent"] == []
    # '' mode → filecontent regexes accumulate in order
    assert db["libssl"]["filecontent"] == [
        r"OpenSSL (\d+\.\d+\.\d+[a-z]?)", "TLSv1"]
    # reference quote quirk: leading " + trailing "" strips ONE pair,
    # preserving one trailing quote
    assert db["zlib"]["filecontent"] == [r'inflate (\d+\.\d+\.\d+) Copyright"']
    # invalid regex skipped; unknown mode ignored; short line skipped
    assert "libweird" not in db and "libother" not in db and "short" not in db
    rows = emba_to_rows(db)
    assert ("libcrypto", "filename_literal", "libcrypto", None) in rows
    assert ("libssl", "content", "TLSv1", None) in rows
    # content rows flow into the text dictionary; literals don't
    from surfactant_spark.dbingest import filename_literal_rows, text_rows
    assert {r[1] for r in text_rows(rows)} == {"content"}
    assert filename_literal_rows(rows) == [("libcrypto", "libcrypto")]


def test_emba_ingest_freshness(tmp_path):
    from surfactant_spark.dbingest import ingest_pattern_db

    feed = tmp_path / "emba.cfg"
    feed.write_text(EMBA_CFG)
    state = str(tmp_path / "state")
    r1 = ingest_pattern_db(str(feed), state, fmt="emba")
    assert r1.updated and r1.n_libraries == 3
    r2 = ingest_pattern_db(str(feed), state, fmt="emba")
    assert not r2.updated and r2.rows == r1.rows
    feed.write_text(EMBA_CFG + 'libnew;strict;;"";;\n')
    r3 = ingest_pattern_db(str(feed), state, fmt="emba")
    assert r3.updated and r3.n_libraries == 4
    import pytest as _pt
    with _pt.raises(ValueError):
        ingest_pattern_db(str(feed), state, fmt="nope")


def test_identify_by_filename_literal(spark):
    from surfactant_spark.dbingest import (
        emba_to_rows,
        filename_literal_rows,
        identify_by_filename_literal,
        parse_emba_cfg,
    )

    pairs = filename_literal_rows(emba_to_rows(parse_emba_cfg(EMBA_CFG)))
    pairs += [("ssl", "libssl")]
    urls = spark.createDataFrame(
        [("http://h/fw/libcrypto.so.3?dl=1",),     # containment hit
         ("http://h/fw/libcrypto/readme.txt",),    # dir component, not basename
         ("http://h/fw/libssl.so.3",),
         ("http://h/fw/unrelated.bin",)],
        "url string",
    )
    got = {(r.url, r.entity_key)
           for r in identify_by_filename_literal(urls, pairs).collect()}
    assert got == {
        ("http://h/fw/libcrypto.so.3?dl=1", "libcrypto"),
        ("http://h/fw/libssl.so.3", "ssl"),
    }
    empty = identify_by_filename_literal(urls, [])
    assert empty.columns == ["url", "entity_key"] and empty.count() == 0
