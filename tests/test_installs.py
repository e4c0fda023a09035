"""J5 `Installs` edges: RPM header file-digest parsing + hash join.

Golden fixture shaped like the reference's generate tests
(reference tests/cmd/test_generate.py:12-113): a synthesized minimal
RPM (lead + signature header + main header with basenames/dirnames/
dirindexes/filedigests) flows through parse_rpm → installs_edges and
must yield exactly the expected package→file edge set
(reference semantics: relationships/rpmfile_relationship.py:20-65).
"""

import hashlib
import struct

import pytest

from surfactant_spark.functions.binmeta import (
    parse_binary_meta,
    parse_rpm,
    rpm_associated_files,
    rpm_digest_algo,
)
from surfactant_spark.operators.merge import installs_edges


def _mk_header(entries):
    """RPM header section from (tag, typ, values): index + data store.
    typ 4=INT32 (4-aligned), 6=STRING, 8=STRING_ARRAY."""
    store = bytearray()
    index = b""
    for tag, typ, values in entries:
        if typ == 4:
            while len(store) % 4:
                store.append(0)
            off = len(store)
            for v in values:
                store += struct.pack(">I", v)
            count = len(values)
        elif typ == 6:
            off = len(store)
            store += values.encode() + b"\x00"
            count = 1
        elif typ == 8:
            off = len(store)
            for v in values:
                store += v.encode() + b"\x00"
            count = len(values)
        else:
            raise AssertionError(typ)
        index += struct.pack(">iIII", tag, typ, off, count)
    head = b"\x8e\xad\xe8\x01" + b"\x00" * 4
    head += struct.pack(">II", len(entries), len(store))
    return head + index + bytes(store)


def _mk_rpm(name, version, files, algo="sha256"):
    """files: list of (dirname, basename, digest)."""
    lead = b"\xed\xab\xee\xdb" + bytes([3, 0]) + struct.pack(">h", 0)
    lead += b"\x00\x00" + name.encode().ljust(66, b"\x00")
    lead += b"\x00" * (96 - len(lead))
    sig = _mk_header([(269, 6, "cafe")])  # minimal signature section
    pad = b"\x00" * ((8 - len(sig) % 8) % 8)
    dirnames = sorted({d for d, _, _ in files})
    main = _mk_header([
        (1000, 6, name),
        (1001, 6, version),
        (1002, 6, "1.el9"),
        (1022, 6, "x86_64"),
        (1047, 8, ["libfoo"]),
        (1113, 8, ["1.0"]),
        (1116, 4, [dirnames.index(d) for d, _, _ in files]),
        (1117, 8, [b for _, b, _ in files]),
        (1118, 8, dirnames),
        (1035, 8, [h for _, _, h in files]),
    ])
    return lead + sig + pad + main


def _sha(s):
    return hashlib.sha256(s.encode()).hexdigest()


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


FILES = [
    ("/usr/bin/", "tool", _sha("tool-bytes")),
    ("/usr/lib/", "libfoo.so.1", _sha("lib-bytes")),
    ("/usr/share/doc/", "README", ""),  # ghost entry: falsy digest skipped
]


def test_parse_rpm_header_fields_and_digests():
    b = _mk_rpm("foopkg", "2.5", FILES)
    meta = parse_rpm(b)
    assert meta["name"] == "foopkg"
    assert meta["version"] == "2.5"
    assert meta["release"] == "1.el9"
    assert meta["arch"] == "x86_64"
    assert meta["provides"] == "libfoo 1.0"
    assert meta["file_algo"] == "sha256"
    assert rpm_associated_files(meta) == [
        ("/usr/bin/tool", _sha("tool-bytes")),
        ("/usr/lib/libfoo.so.1", _sha("lib-bytes")),
        ("/usr/share/doc/README", ""),
    ]
    # the firstresult parser chain picks the RPM branch
    assert parse_binary_meta(b)["format"] == "rpm"


def test_parse_rpm_truncated_header_falls_back_to_lead():
    b = _mk_rpm("barpkg", "1.0", FILES)[:110]
    meta = parse_rpm(b)
    assert meta["name"] == "barpkg" and "associated_files" not in meta


def test_rpm_digest_algo_lengths():
    assert rpm_digest_algo("a" * 32) == "md5"
    assert rpm_digest_algo("a" * 40) == "sha1"
    assert rpm_digest_algo("a" * 64) == "sha256"
    assert rpm_digest_algo("a" * 128) == "sha512"
    assert rpm_digest_algo("zz") is None


def test_installs_edges_golden_end_to_end(spark):
    """Parsed RPM metadata → packages frame → Installs edges against a
    file-node table; sha256 and md5 branches + unknown-algo skip."""
    rpm_sha = parse_rpm(_mk_rpm("foopkg", "2.5", FILES))
    md5_files = [("/opt/", "a.bin", _md5("a")), ("/opt/", "b.bin", _md5("b"))]
    rpm_md5 = parse_rpm(_mk_rpm("oldpkg", "0.9", md5_files))
    assert rpm_md5["file_algo"] == "md5"
    sha1_files = [("/x/", "c", hashlib.sha1(b"c").hexdigest())]
    rpm_sha1 = parse_rpm(_mk_rpm("oddpkg", "0.1", sha1_files))

    pkgs = spark.createDataFrame(
        [
            (m["name"], m.get("file_algo"), dict(rpm_associated_files(m)))
            for m in (rpm_sha, rpm_md5, rpm_sha1)
        ],
        "pkg_id string, file_algo string, associated_files map<string,string>",
    )
    file_rows = [
        ("n-tool", _sha("tool-bytes"), _md5("x1")),
        ("n-lib", _sha("lib-bytes"), _md5("x2")),
        ("n-a", _sha("other"), _md5("a")),
        ("n-c", None, _md5("zzz")),  # sha1-only package can never match
    ]
    files = spark.createDataFrame(file_rows, "file_id string, sha256 string, md5 string")
    with pytest.warns(RuntimeWarning, match="file_algo"):
        got = {(r.subj, r.pred, r.obj) for r in installs_edges(pkgs, files).collect()}
    assert got == {
        ("foopkg", "Installs", "n-tool"),
        ("foopkg", "Installs", "n-lib"),
        ("oldpkg", "Installs", "n-a"),
    }


def test_installs_edges_no_hash_columns(spark):
    pkgs = spark.createDataFrame(
        [("p", "sha256", {"/a": "b" * 64})],
        "pkg_id string, file_algo string, associated_files map<string,string>",
    )
    files = spark.createDataFrame([("f",)], "file_id string")
    assert installs_edges(pkgs, files).count() == 0
