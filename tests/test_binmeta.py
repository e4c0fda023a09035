"""Binary-header metadata extraction (E-family analog): hand-built
valid headers per format, golden field assertions, totality on junk,
and the Arrow extraction stage."""

import struct

from surfactant_spark.functions.binmeta import (
    parse_binary_meta,
    parse_elf,
    parse_java_class,
    parse_macho,
    parse_pe,
    parse_rpm_lead,
    parse_uimage,
)


def elf64_blob(e_type=3, e_machine=0x3E, endian="<"):
    ident = b"\x7fELF" + bytes([2, 1 if endian == "<" else 2, 1]) + b"\x00" * 9
    return ident + struct.pack(endian + "HH", e_type, e_machine) + b"\x00" * 44


def pe_blob(machine=0x8664, dll=False):
    characteristics = 0x0002 | (0x2000 if dll else 0)
    head = b"MZ" + b"\x00" * 0x3A + struct.pack("<I", 0x40)
    coff = b"PE\x00\x00" + struct.pack("<HHIIIHH", machine, 3, 1700000000, 0, 0, 224,
                                       characteristics)
    return head + coff + b"\x00" * 16


def macho_blob(cputype=0x01000007, filetype=6):
    return b"\xcf\xfa\xed\xfe" + struct.pack("<iII", cputype, 3, filetype) + b"\x00" * 16


def java_blob(major=55, minor=0):
    return b"\xca\xfe\xba\xbe" + struct.pack(">HH", minor, major) + b"\x00" * 8


def rpm_blob(name="pkg-1.0"):
    lead = b"\xed\xab\xee\xdb" + bytes([3, 0]) + struct.pack(">hh", 0, 1)
    return lead + name.encode().ljust(66, b"\x00") + b"\x00" * 30


def uimage_blob(name="kernel-img"):
    head = b"\x27\x05\x19\x56" + b"\x00" * 8 + struct.pack(">I", 12345) + b"\x00" * 16
    return head + name.encode().ljust(32, b"\x00") + b"\x00" * 8


def test_elf_fields():
    m = parse_elf(elf64_blob())
    assert m == {"format": "elf", "class": "elf64", "endian": "lsb",
                 "type": "dyn", "machine": "x86_64"}
    m = parse_elf(elf64_blob(e_type=2, e_machine=0xB7, endian=">"))
    assert m["type"] == "exec" and m["machine"] == "aarch64" and m["endian"] == "msb"


def test_pe_fields():
    m = parse_pe(pe_blob(dll=True))
    assert m == {"format": "pe", "machine": "x86_64", "n_sections": "3",
                 "is_dll": "true"}
    assert parse_pe(pe_blob(machine=0x014C, dll=False))["is_dll"] == "false"


def test_macho_java_rpm_uimage_fields():
    assert parse_macho(macho_blob()) == {
        "format": "macho", "bits": "64", "cputype": "x86_64", "filetype": "dylib"}
    assert parse_java_class(java_blob()) == {
        "format": "javaclass", "major": "55", "minor": "0", "min_se": "11"}
    assert parse_rpm_lead(rpm_blob())["name"] == "pkg-1.0"
    assert parse_uimage(uimage_blob()) == {
        "format": "uimage", "name": "kernel-img", "data_size": "12345"}


def test_fat_macho_magic_not_misparsed_as_class():
    # 0xCAFEBABE with an implausible class version (fat arch count 2)
    fat = b"\xca\xfe\xba\xbe" + struct.pack(">I", 2) + b"\x00" * 24
    assert parse_java_class(fat) is None


def test_totality_on_junk():
    for junk in (b"", b"MZ", b"\x7fELF", b"\x00" * 200, b"plain text"):
        parse_binary_meta(junk)  # must not raise
    assert parse_binary_meta(b"random bytes" * 10) is None


def test_arrow_extraction_stage(spark):
    from surfactant_spark.operators.multimodal import extract_binary_meta

    blobs = [
        ("b0", elf64_blob()), ("b1", pe_blob(dll=True)), ("b2", macho_blob()),
        ("b3", java_blob()), ("b4", rpm_blob()), ("b5", uimage_blob()),
        ("b6", b"not a binary"), ("b7", None),
    ]
    df = spark.createDataFrame(blobs, "media_id string, content binary")
    rows = {r.media_id: r for r in extract_binary_meta(df).collect()}
    assert rows["b0"].format == "elf" and rows["b0"].meta["machine"] == "x86_64"
    assert rows["b1"].format == "pe" and rows["b1"].meta["is_dll"] == "true"
    assert rows["b2"].format == "macho" and rows["b2"].meta["filetype"] == "dylib"
    assert rows["b3"].format == "javaclass" and rows["b3"].meta["min_se"] == "11"
    assert rows["b4"].format == "rpm" and rows["b4"].meta["name"] == "pkg-1.0"
    assert rows["b5"].format == "uimage" and rows["b5"].meta["name"] == "kernel-img"
    assert rows["b6"].format is None and rows["b6"].meta == {}
    assert rows["b7"].format is None
