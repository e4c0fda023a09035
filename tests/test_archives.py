"""S3 archive parsers + recursive expansion fixpoint with Contains
edges — the file_decompression.py:46-264 / generate.py:303-356 analog.
"""

import gzip
import hashlib
import io
import tarfile
import zipfile

from surfactant_spark.functions.archive import (
    archive_members,
    is_tar,
    is_zip,
    tar_members,
    zip_members,
)


def _zip_bytes(members, compression=zipfile.ZIP_STORED):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression) as zf:
        for n, d in members:
            zf.writestr(zipfile.ZipInfo(n, (1980, 1, 1, 0, 0, 0)), d)
    return buf.getvalue()


def _tar_bytes(members):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for n, d in members:
            ti = tarfile.TarInfo(n)
            ti.size, ti.mtime = len(d), 0
            tf.addfile(ti, io.BytesIO(d))
    return buf.getvalue()


MEMBERS = [("a.txt", b"alpha"), ("dir/b.bin", b"\x00\x01beta"), ("c", b"")]


def test_zip_stored_and_deflate_round_trip():
    for comp in (zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED):
        b = _zip_bytes(MEMBERS, comp)
        assert is_zip(b)
        assert zip_members(b) == MEMBERS


def test_zip_skips_directories_and_tolerates_junk():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("d/", b"")
        zf.writestr("d/x.txt", b"payload")
    got = zip_members(buf.getvalue())
    assert got == [("d/x.txt", b"payload")]
    assert zip_members(b"PK\x03\x04garbage") == []
    assert zip_members(b"not an archive") == []


def test_tar_round_trip_and_long_prefix():
    b = _tar_bytes(MEMBERS)
    assert is_tar(b)
    assert tar_members(b) == MEMBERS
    # >100-char path forces the ustar prefix field
    long_name = "/".join(["verylongdirectorysegment"] * 5) + "/leaf.txt"
    b2 = _tar_bytes([(long_name, b"deep")])
    assert tar_members(b2) == [(long_name, b"deep")]
    assert tar_members(b"\x00" * 1024) == []
    assert tar_members(b"junk") == []


def test_archive_members_dispatch():
    assert archive_members(_zip_bytes(MEMBERS)) == MEMBERS
    assert archive_members(_tar_bytes(MEMBERS)) == MEMBERS
    assert archive_members(b"plain text") == []


def test_expand_archives_nested_with_contains_edges(spark):
    """zip( tar.gz( inner members ), plain ) expands transitively:
    gzip → tar → members, each level linked by a Contains edge; a
    member duplicated across containers is recorded once (sha256-keyed
    skip, the EXTRACT_DIRS cache analog)."""
    from surfactant_spark.operators.archives import (
        archive_contains_edges,
        expand_archives,
    )

    inner = _tar_bytes([("lib/core.so", b"ELFDATA"), ("doc.txt", b"docs")])
    targz = gzip.compress(inner, mtime=0)
    outer = _zip_bytes([("bundle.tar.gz", targz), ("top.txt", b"docs")])
    # "docs" appears both at top level and inside the tar → one node

    files = spark.createDataFrame(
        [("scan/outer.zip", bytearray(outer))], "path string, content binary"
    )
    expanded = expand_archives(files).cache()
    paths = {r.path for r in expanded.collect()}
    assert "scan/outer.zip" in paths
    assert "scan/outer.zip!/bundle.tar.gz" in paths
    assert "scan/outer.zip!/bundle.tar.gz!/<gunzipped>" in paths
    assert any(p.endswith("!/lib/core.so") for p in paths)
    # duplicated content recorded once
    assert expanded.count() == 5  # outer, targz, tar, core.so, docs
    sha_docs = hashlib.sha256(b"docs").hexdigest()
    assert expanded.where(f"file_id = '{sha_docs}'").count() == 1

    edges = {(r.subj, r.pred, r.obj) for r in
             archive_contains_edges(expanded).collect()}
    sha = {
        "outer": hashlib.sha256(outer).hexdigest(),
        "targz": hashlib.sha256(targz).hexdigest(),
        "tar": hashlib.sha256(inner).hexdigest(),
        "so": hashlib.sha256(b"ELFDATA").hexdigest(),
    }
    assert (sha["outer"], "Contains", sha["targz"]) in edges
    assert (sha["targz"], "Contains", sha["tar"]) in edges
    assert (sha["tar"], "Contains", sha["so"]) in edges
    assert (sha["outer"], "Contains", sha_docs) in edges
    assert len(edges) == 4
    expanded.unpersist()


def test_maybe_decompress_codecs_and_hostile_input():
    """gzip/bzip2/xz sniff-and-decode round-trips; corrupt, truncated,
    and non-compressed inputs are returned untouched with codec=None
    (log-and-continue: one bad blob never fails a partition)."""
    import bz2
    import lzma

    from surfactant_spark.functions.archive import maybe_decompress

    payload = b"the quick brown fox" * 100
    assert maybe_decompress(gzip.compress(payload, mtime=0)) == ("gzip", payload)
    assert maybe_decompress(bz2.compress(payload)) == ("bzip2", payload)
    xz = lzma.compress(payload, format=lzma.FORMAT_XZ)
    assert maybe_decompress(xz) == ("xz", payload)
    for hostile in (
        b"",
        b"plain text",
        b"\x1f\x8btruncated!!",
        b"BZh9truncated",
        b"\xfd7zXZ\x00garbage",
        gzip.compress(payload)[:-5],   # truncated stream: no partial output
        bz2.compress(payload)[:-5],
        xz[:-5],
    ):
        assert maybe_decompress(hostile) == (None, hostile)


def test_expand_archives_tar_bz2_and_tar_xz(spark):
    """Compressed tars re-enter the fixpoint through the codec sniff:
    tar.bz2 and tar.xz each expand to the decompression pseudo-node and
    then the tar members (file_decompression.py:163-264 parity for the
    stdlib-coverable codecs; rar is the documented non-goal)."""
    import bz2
    import lzma

    from surfactant_spark.operators.archives import expand_archives

    # distinct payloads — identical ones would dedup on sha256 and the
    # second container would (correctly) stop at the compressed node
    tar_a = _tar_bytes([("lib/z.so", b"ZDATA")])
    tar_b = _tar_bytes([("lib/y.so", b"YDATA")])
    files = spark.createDataFrame(
        [
            ("a.tar.bz2", bytearray(bz2.compress(tar_a))),
            ("b.tar.xz", bytearray(lzma.compress(tar_b, format=lzma.FORMAT_XZ))),
        ],
        "path string, content binary",
    )
    paths = {r.path for r in expand_archives(files).collect()}
    assert "a.tar.bz2!/<bunzipped>" in paths
    assert "b.tar.xz!/<unxzed>" in paths
    assert "a.tar.bz2!/<bunzipped>!/lib/z.so" in paths
    assert "b.tar.xz!/<unxzed>!/lib/y.so" in paths


def test_expand_archives_cycle_terminates(spark):
    """A zip containing ITSELF cannot be built, but a gzip whose payload
    is not smaller re-enters with identical sha and must be dropped by
    the seen-set — the fixpoint terminates under max_depth."""
    from surfactant_spark.operators.archives import expand_archives

    z = _zip_bytes([("self.txt", b"fixed")])
    files = spark.createDataFrame(
        [("a.zip", bytearray(z)), ("b.zip", bytearray(z))],
        "path string, content binary",
    )
    expanded = expand_archives(files, max_depth=3)
    # identical archives dedup to one node; one member
    assert expanded.count() == 2
