"""File/format identification (F1/F2 analogs): magic-table breadth,
Python-sniffer ≡ codegen-chain parity, extension + shebang typing."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from surfactant_spark.functions.filetype import (
    KIND_OF,
    MAGIC_TABLE,
    classify_format,
    ext_type,
    ext_type_expr,
    shebang_expr,
    shebang_interp,
    sniff_format,
)


def _blob_for(tag: str) -> bytes:
    conds = dict(MAGIC_TABLE)[tag]
    size = max(off + len(m) for off, m in conds) + 16
    b = bytearray(b"\x00" * size)
    for off, m in conds:
        b[off:off + len(m)] = m
    return bytes(b)


def test_magic_table_breadth_and_self_identification():
    tags = [t for t, _ in MAGIC_TABLE]
    assert len(tags) >= 20  # reference id_magic.py distinguishes ~20
    # most-specific-first: every synthetic blob identifies as its own
    # tag except the deliberate container overlaps
    overlap_ok = {"zip_empty": {"zip_empty"}, "riff": {"riff"}}
    for tag in tags:
        got = sniff_format(_blob_for(tag))
        assert got in overlap_ok.get(tag, {tag}), (tag, got)
    assert sniff_format(b"plain text here") == "unknown"
    assert sniff_format(b"") == "unknown"


def test_codegen_chain_matches_python_sniffer(spark):
    blobs = [(t, _blob_for(t)) for t, _ in MAGIC_TABLE]
    blobs += [("nothing", b"plain bytes"), ("short", b"P"), ("empty", b"")]
    df = spark.createDataFrame(
        [(name, b) for name, b in blobs], "name string, content binary"
    )
    rows = classify_format(df).collect()
    for r in rows:
        assert r.format == sniff_format(bytes(r.content or b"")), r.name


def test_kind_mapping_covers_every_tag():
    media_kinds = {"image", "audio", "video", "archive", "package",
                   "document", "binary"}
    for tag, _ in MAGIC_TABLE:
        assert KIND_OF.get(tag, "unknown") in media_kinds | {"unknown"}, tag


EXT_CASES = {
    "a/b/page.html": "html",
    "x.tar.gz": "archive",
    "UPPER.PNG": "image",
    "file.pdf?download=1": "pdf",
    "script.py": "script",
    "lib.so": "binary",
    "noext": "unknown",
    "page.html#frag": "html",
}


def test_ext_type_python_and_column(spark):
    for name, exp in EXT_CASES.items():
        assert ext_type(name) == exp, name
    df = spark.createDataFrame([(n,) for n in EXT_CASES], "fname string")
    rows = df.select("fname", ext_type_expr("fname").alias("t")).collect()
    for r in rows:
        assert r.t == EXT_CASES[r.fname], r.fname


def test_hexline_vote_semantics(spark):
    from surfactant_spark.functions.filetype import hexline_vote, hexline_vote_expr

    intel, srec = ":10246200464C", "S113AF00464C5541D3"
    cases = {
        "\n".join([intel] * 3): "intelhex",
        "\n".join([srec] * 2): "srec",
        "\n".join([intel, srec, srec]): "srec",        # majority
        "\n".join([intel, srec]): "intelhex",          # tie → intelhex (>=)
        "no records here\nat all": None,
        ":zz too short": None,
        # vote reads only the first 100 lines
        "\n".join(["x"] * 100 + [intel] * 50): None,
    }
    for text, exp in cases.items():
        assert hexline_vote(text) == exp, (text[:30], exp)
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    for r in df.select("text", hexline_vote_expr("text").alias("v")).collect():
        assert r.v == cases[r.text], r.text[:30]


def test_uuid4_validity():
    from surfactant_spark.functions.filetype import is_valid_uuid4

    assert is_valid_uuid4("123e4567-e89b-42d3-a456-426614174000")
    assert is_valid_uuid4("123E4567-E89B-42D3-A456-426614174000")  # case
    assert not is_valid_uuid4("123e4567-e89b-12d3-a456-426614174000")  # v1
    assert not is_valid_uuid4("123e4567-e89b-42d3-c456-426614174000")  # variant
    assert not is_valid_uuid4("not-a-uuid")
    assert not is_valid_uuid4("")
    assert not is_valid_uuid4(None)


SHEBANG_CASES = {
    "#!/usr/bin/python3\nprint(1)": "python3",
    "#!/bin/sh -e\necho hi": "sh",
    "#!/usr/bin/env perl\n...": "perl",
    "#! /usr/bin/env ruby\n": None,  # space after #! → env token first
    "no shebang": None,
    "": None,
    "#!\n": None,
}


def test_shebang_python_and_column(spark):
    # the spaced form: shebang_interp tolerates it, resolving to ruby
    assert shebang_interp("#! /usr/bin/env ruby\n") == "ruby"
    for text, exp in SHEBANG_CASES.items():
        if text.startswith("#! "):
            continue
        assert shebang_interp(text) == exp, repr(text)
    df = spark.createDataFrame(
        [(t,) for t in SHEBANG_CASES if not t.startswith("#! ")], "text string"
    )
    rows = df.select("text", shebang_expr("text").alias("i")).collect()
    for r in rows:
        assert r.i == SHEBANG_CASES[r.text], repr(r.text)
