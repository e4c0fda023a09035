"""E7 OLE/CFB golden tests on a synthesized compound file — MS-CFB
header + FAT/DIFAT + directory + mini-stream SummaryInformation, the
structures the reference reads through olefile
(surfactant/infoextractors/ole_file.py:83-127).
"""

import struct

from surfactant_spark.functions.binmeta import parse_binary_meta, parse_ole

MSI_CLSID = bytes.fromhex("84100c00" "0000" "0000" "c000" "000000000046")
ENDOFCHAIN, FREESECT, FATSECT = 0xFFFFFFFE, 0xFFFFFFFF, 0xFFFFFFFD


def _summary_stream(props):
    """MS-OLEPS SummaryInformation property set with VT_LPSTR values."""
    pairs = sorted(props.items())
    sec_head = 8 + 8 * len(pairs)
    vals, offs = b"", []
    for _pid, v in pairs:
        offs.append(sec_head + len(vals))
        enc = v.encode() + b"\x00"
        vals += struct.pack("<II", 0x1E, len(enc)) + enc
        vals += b"\x00" * ((4 - len(vals) % 4) % 4)
    section = struct.pack("<II", sec_head + len(vals), len(pairs))
    for (pid, _), off in zip(pairs, offs):
        section += struct.pack("<II", pid, off)
    section += vals
    head = struct.pack("<HHI", 0xFFFE, 0, 0x20A) + b"\x00" * 16
    head += struct.pack("<I", 1)
    fmtid = bytes.fromhex("e0859ff2f94f1068ab9108002b27b3d9")
    head += fmtid + struct.pack("<I", 48)
    assert len(head) == 48
    return head + section


def _dir_entry(name, etype, clsid=b"\x00" * 16, start=0, size=0):
    raw = name.encode("utf-16-le") + b"\x00\x00"
    e = raw.ljust(64, b"\x00")
    e += struct.pack("<HBB", len(raw), etype, 1)
    e += struct.pack("<III", FREESECT, FREESECT, FREESECT)  # siblings/child
    e += clsid + struct.pack("<I", 0)  # state bits
    e += b"\x00" * 16  # ctime + mtime
    e += struct.pack("<IQ", start, size)
    assert len(e) == 128
    return e


def make_cfb(clsid=MSI_CLSID, props=None):
    """sector map: 0=FAT, 1=directory, 2=miniFAT, 3..=mini-stream."""
    props = props if props is not None else {
        2: "Prod Doc", 3: "MyProduct", 4: "ACME", 6: "hello", 9: "5"
    }
    summary = _summary_stream(props)
    n_mini = (len(summary) + 63) // 64
    ministream = summary.ljust(((n_mini * 64 + 511) // 512) * 512, b"\x00")
    n_ms_sectors = len(ministream) // 512

    directory = (
        _dir_entry("Root Entry", 5, clsid, start=3, size=len(ministream))
        + _dir_entry("\x05SummaryInformation", 2, start=0, size=len(summary))
    ).ljust(512, b"\x00")

    minifat = b""
    for i in range(n_mini):
        minifat += struct.pack("<I", i + 1 if i + 1 < n_mini else ENDOFCHAIN)
    minifat = minifat.ljust(512, b"\xff")

    fat = [FATSECT, ENDOFCHAIN, ENDOFCHAIN]  # FAT, dir, miniFAT
    for i in range(n_ms_sectors):  # ministream container chain
        fat.append(3 + i + 1 if i + 1 < n_ms_sectors else ENDOFCHAIN)
    fat_sector = b"".join(struct.pack("<I", x) for x in fat).ljust(512, b"\xff")

    header = bytearray(512)
    header[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x3E)   # minor version
    struct.pack_into("<H", header, 26, 3)      # major version
    struct.pack_into("<H", header, 28, 0xFFFE) # byte order
    struct.pack_into("<H", header, 30, 9)      # sector shift (512)
    struct.pack_into("<H", header, 32, 6)      # mini shift (64)
    struct.pack_into("<I", header, 44, 1)      # num FAT sectors
    struct.pack_into("<I", header, 48, 1)      # first directory sector
    struct.pack_into("<I", header, 56, 4096)   # mini cutoff
    struct.pack_into("<I", header, 60, 2)      # first miniFAT sector
    struct.pack_into("<I", header, 64, 1)      # num miniFAT sectors
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # no extended DIFAT
    struct.pack_into("<I", header, 76, 0)      # DIFAT[0] = sector 0
    for i in range(1, 109):
        struct.pack_into("<I", header, 76 + 4 * i, FREESECT)

    return bytes(header) + fat_sector + directory + minifat + ministream


def test_cfb_msi_clsid_and_summary_properties():
    meta = parse_ole(make_cfb())
    assert meta["format"] == "ole"
    assert meta["clsid"] == "000c1084-0000-0000-c000-000000000046"
    assert meta["clsid_type"] == "MSI"
    assert meta["subject"] == "MyProduct"     # → name hint (conf 80)
    assert meta["revision_number"] == "5"     # → version hint
    assert meta["author"] == "ACME"           # → vendor hint
    assert meta["comments"] == "hello"
    assert meta["title"] == "Prod Doc"
    assert parse_binary_meta(make_cfb())["format"] == "ole"


def test_cfb_non_installer_clsid_untyped():
    meta = parse_ole(make_cfb(clsid=b"\x11" * 16))
    assert "clsid_type" not in meta and meta["clsid"].startswith("11111111-")


def test_cfb_truncated_degrades():
    b = make_cfb()
    meta = parse_ole(b[:600])  # header + part of FAT only
    assert meta is not None and meta["format"] == "ole"
    assert parse_ole(b"\x00" * 512) is None
