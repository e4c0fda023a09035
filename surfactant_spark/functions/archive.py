"""Archive member extraction — the S3 decompression family
(surfactant/infoextractors/file_decompression.py:46-264) beyond gzip.

Dependency-free parses of the public on-disk layouts:

* ZIP — End-of-Central-Directory record scanned from the tail, central
  directory entries resolved to local file headers (PKWARE APPNOTE
  layout); stored and deflate members (zlib raw-window inflate).
* TAR — 512-byte ustar headers: name(+prefix), octal size, typeflag;
  regular-file members only, like the reference's unpack-then-scan.

Every function is total: malformed input yields an empty member list
(the log-and-continue policy of file_decompression.py:158-161 — one
bad blob must never fail a partition).  Member *paths* are kept as
stored; callers normalize/filter (zip-slip style names are data here,
not filesystem writes — nothing is extracted to disk).
"""

from __future__ import annotations

import bz2
import lzma
import struct
import zlib

GZIP_MAGIC = b"\x1f\x8b"
BZ2_MAGIC = b"BZh"
XZ_MAGIC = b"\xfd7zXZ\x00"
ZIP_EOCD = b"PK\x05\x06"
ZIP_CDIR = b"PK\x01\x02"
ZIP_LOCAL = b"PK\x03\x04"
_MAX_MEMBERS = 10_000
_MAX_MEMBER_BYTES = 1 << 28  # 256 MiB per member: decompression-bomb guard


def maybe_decompress(b: bytes) -> tuple[str | None, bytes]:
    """``(codec, payload)`` for the single-stream compressors the
    reference unpacks — gzip, bzip2, xz (stdlib ``zlib``/``bz2``/
    ``lzma``; file_decompression.py:163-264).  RAR needs a third-party
    extractor and stays a documented non-goal (SURVEY §2.1).

    ``(None, b)`` when not compressed, corrupt, truncated, or over the
    decompression-bomb cap — a partial payload is never returned (a
    truncated stream is data corruption, not a smaller file).  Total:
    one bad blob must never fail a partition."""
    try:
        if b[:2] == GZIP_MAGIC:
            d = zlib.decompressobj(31)  # wbits 31 = gzip wrapper
            out = d.decompress(b, _MAX_MEMBER_BYTES)
            return ("gzip", out) if d.eof else (None, b)
        if b[:3] == BZ2_MAGIC and len(b) > 4 and 0x31 <= b[3] <= 0x39:
            d = bz2.BZ2Decompressor()
            out = d.decompress(b, _MAX_MEMBER_BYTES)
            return ("bzip2", out) if d.eof else (None, b)
        if b[:6] == XZ_MAGIC:
            d = lzma.LZMADecompressor()
            out = d.decompress(b, _MAX_MEMBER_BYTES)
            return ("xz", out) if d.eof else (None, b)
    except Exception:
        return (None, b)
    return (None, b)


def is_zip(b: bytes) -> bool:
    return b[:4] in (ZIP_LOCAL, ZIP_EOCD) or b[:4] == b"PK\x07\x08"


def is_tar(b: bytes) -> bool:
    """ustar magic at offset 257 ('ustar\\0' or GNU 'ustar  ')."""
    return len(b) >= 263 and b[257:262] == b"ustar"


def zip_members(b: bytes) -> list[tuple[str, bytes]]:
    """(name, bytes) for every regular-file member, central-directory
    order.  Directories (trailing '/') are skipped; unsupported
    compression methods contribute no member (logged-by-omission, the
    reference's per-format fallback)."""
    out: list[tuple[str, bytes]] = []
    eocd = b.rfind(ZIP_EOCD, max(0, len(b) - 65557))
    if eocd < 0:
        return out
    try:
        # cd_off is unsigned in the PKWARE APPNOTE layout — a signed
        # unpack would go negative for central directories at ≥ 2 GiB
        # and silently yield an empty member list
        n_total, cd_size, cd_off = struct.unpack_from("<HII", b, eocd + 10)[0:3]
    except struct.error:
        return out
    if cd_off >= len(b):
        return out
    p = cd_off
    for _ in range(min(n_total, _MAX_MEMBERS)):
        if b[p:p + 4] != ZIP_CDIR or p + 46 > len(b):
            break
        (method, ) = struct.unpack_from("<H", b, p + 10)
        csize, usize = struct.unpack_from("<II", b, p + 20)
        nlen, elen, clen = struct.unpack_from("<HHH", b, p + 28)
        (lho,) = struct.unpack_from("<I", b, p + 42)
        name = b[p + 46:p + 46 + nlen].decode("utf-8", "replace")
        p += 46 + nlen + elen + clen
        if name.endswith("/") or usize > _MAX_MEMBER_BYTES:
            continue
        # local header: its own name/extra lengths may differ from the
        # central directory's — data starts after the LOCAL lengths
        if b[lho:lho + 4] != ZIP_LOCAL or lho + 30 > len(b):
            continue
        lnlen, lelen = struct.unpack_from("<HH", b, lho + 26)
        data = b[lho + 30 + lnlen + lelen:lho + 30 + lnlen + lelen + csize]
        if method == 0:  # stored
            out.append((name, data))
        elif method == 8:  # deflate (raw window)
            try:
                raw = zlib.decompressobj(-15).decompress(data, _MAX_MEMBER_BYTES)
                out.append((name, raw))
            except zlib.error:
                continue
    return out


def tar_members(b: bytes) -> list[tuple[str, bytes]]:
    """(name, bytes) for every regular-file member (typeflag '0' or
    NUL), header order; ustar prefix field honored."""
    out: list[tuple[str, bytes]] = []
    p = 0
    while p + 512 <= len(b) and len(out) < _MAX_MEMBERS:
        hdr = b[p:p + 512]
        if hdr == b"\x00" * 512:
            break
        name = hdr[0:100].split(b"\x00", 1)[0].decode("utf-8", "replace")
        if not name:
            break
        try:
            size = int(hdr[124:136].split(b"\x00")[0].strip() or b"0", 8)
        except ValueError:
            break
        if size < 0 or size > _MAX_MEMBER_BYTES:
            break
        typeflag = hdr[156:157]
        prefix = hdr[345:500].split(b"\x00", 1)[0].decode("utf-8", "replace")
        if prefix and hdr[257:262] == b"ustar":
            name = f"{prefix}/{name}"
        data_end = p + 512 + size
        if typeflag in (b"0", b"\x00") and data_end <= len(b):
            out.append((name, b[p + 512:data_end]))
        p += 512 + ((size + 511) // 512) * 512
    return out


def archive_members(b: bytes) -> list[tuple[str, bytes]]:
    """First matching format's members; [] when not an archive.
    Single-stream compressors (gzip/bzip2/xz) are handled by
    ``maybe_decompress`` — a compressed tar re-enters the expansion
    fixpoint as a tar (the reference's recursive unpack,
    file_decompression.py:146-161)."""
    try:
        if is_zip(b):
            return zip_members(b)
        if is_tar(b):
            return tar_members(b)
    except Exception:
        return []
    return []
