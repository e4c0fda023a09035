"""ECMA-335 metadata parse from a synthesized .NET PE — E2 depth.

The fixture is built struct-by-struct from the public layouts (PE
optional header data directory 14 → IMAGE_COR20_HEADER → BSJB root →
`#~` + `#Strings` streams), the shape the reference reads through
dnfile (surfactant/infoextractors/pe_file.py:193-218).
"""

import struct

from surfactant_spark.functions.binmeta import parse_binary_meta, parse_pe
from surfactant_spark.functions.dotnetmeta import (
    dotnet_assembly_refs,
    dotnet_implmap,
    parse_dotnet_metadata,
)


class _Strings:
    def __init__(self):
        self.buf = bytearray(b"\x00")
        self.idx = {}

    def add(self, s: str) -> int:
        if s not in self.idx:
            self.idx[s] = len(self.buf)
            self.buf += s.encode() + b"\x00"
        return self.idx[s]


def _tilde_stream(strings, *, assembly, refs, modrefs, implmap):
    """#~ stream with Module, ModuleRef, ImplMap, Assembly, AssemblyRef
    tables, 2-byte heap indexes (heapsizes=0)."""
    # Module: gen(2) Name(S=2) Mvid(G=2) EncId(2) EncBase(2) = 10 bytes
    tables = {0x00: [struct.pack("<HHHHH", 0, strings.add("mod.exe"), 0, 0, 0)]}
    tables[0x1A] = [struct.pack("<H", strings.add(m)) for m in modrefs]
    tables[0x1C] = [
        struct.pack("<HHHH", 0, 0, strings.add(fn), scope_1based)
        for (fn, scope_1based) in implmap
    ]
    name, culture, ver = assembly
    tables[0x20] = [struct.pack(
        "<IHHHHIHHH", 0x8004, *ver, 0, 0, strings.add(name), strings.add(culture)
    )]
    tables[0x23] = [
        struct.pack("<HHHHIHHHH", *v, 0, 0, strings.add(n), strings.add(c), 0)
        for (n, c, v) in refs
    ]
    present = sorted(tables)
    valid = 0
    for t in present:
        valid |= 1 << t
    head = struct.pack("<IBBBBQQ", 0, 2, 0, 0, 0, valid, 0)
    counts = b"".join(struct.pack("<I", len(tables[t])) for t in present)
    rows = b"".join(b"".join(tables[t]) for t in present)
    return head + counts + rows


def make_dotnet_pe(*, assembly=("MyApp", "", (1, 2, 3, 4)),
                   refs=(), modrefs=(), implmap=()):
    strings = _Strings()
    tilde = _tilde_stream(strings, assembly=assembly, refs=list(refs),
                          modrefs=list(modrefs), implmap=list(implmap))
    sheap = bytes(strings.buf)

    # metadata root: BSJB + streams (#~, #Strings)
    version = b"v4.0.30319\x00\x00"
    streams = [(b"#~\x00\x00", tilde), (b"#Strings\x00\x00\x00\x00", sheap)]
    hdr_len = 16 + len(version) + 4 + sum(8 + len(n) for n, _ in streams)
    md = bytearray()
    md += b"BSJB" + struct.pack("<HHI", 1, 1, 0) + struct.pack("<I", len(version))
    md += version + struct.pack("<HH", 0, len(streams))
    off = hdr_len
    for n, data in streams:
        md += struct.pack("<II", off, len(data)) + n
        off += len(data)
    assert len(md) == hdr_len
    for _, data in streams:
        md += data

    # one .text section at rva 0x1000 / raw 0x200: cor20 header then metadata
    cor20 = struct.pack("<IHHII", 72, 2, 5,
                        0x1000 + 72, len(md))  # cb, ver, MetaData rva/size
    cor20 += b"\x00" * (72 - len(cor20))
    sect_data = cor20 + bytes(md)

    e_lfanew = 0x80
    mz = b"MZ" + b"\x00" * 0x3A + struct.pack("<I", e_lfanew)
    mz += b"\x00" * (e_lfanew - len(mz))
    size_opt = 0xE0  # PE32 optional header
    coff = struct.pack("<HHIIIHH", 0x8664, 1, 0, 0, 0, size_opt, 0x2002)
    opt = bytearray(struct.pack("<H", 0x10B)) + b"\x00" * (size_opt - 2)
    # data directory 14 (COM descriptor) at opt offset 96 + 14*8
    struct.pack_into("<II", opt, 96 + 14 * 8, 0x1000, 72)
    sect = (b".text\x00\x00\x00"
            + struct.pack("<IIII", len(sect_data), 0x1000, len(sect_data), 0x200)
            + b"\x00" * 16)
    head = mz + b"PE\x00\x00" + coff + bytes(opt) + sect
    head += b"\x00" * (0x200 - len(head))
    return head + sect_data


def test_dotnet_assembly_and_refs():
    pe = make_dotnet_pe(
        assembly=("MyApp", "", (1, 2, 3, 4)),
        refs=[("System.Runtime", "", (8, 0, 0, 0)),
              ("MyLib", "de", (2, 1, 0, 0))],
        modrefs=["kernel32.dll", "libnative"],
        implmap=[("CreateFileW", 1), ("do_work", 2)],
    )
    meta = parse_pe(pe)
    assert meta["is_clr"] == "true"
    assert meta["assembly_name"] == "MyApp"
    assert meta["assembly_version"] == "1.2.3.4"
    assert dotnet_assembly_refs(meta) == [
        {"Name": "System.Runtime", "Culture": "", "Version": "8.0.0.0"},
        {"Name": "MyLib", "Culture": "de", "Version": "2.1.0.0"},
    ]
    assert dotnet_implmap(meta) == [
        {"Name": "kernel32.dll", "Function": "CreateFileW"},
        {"Name": "libnative", "Function": "do_work"},
    ]
    assert parse_binary_meta(pe)["format"] == "pe"


def test_non_clr_pe_has_no_dotnet_fields():
    pe = make_dotnet_pe()
    # zero out the COM-descriptor data directory
    ba = bytearray(pe)
    opt_off = 0x80 + 4 + 20
    struct.pack_into("<II", ba, opt_off + 96 + 14 * 8, 0, 0)
    meta = parse_pe(bytes(ba))
    assert "is_clr" not in meta and "assembly_name" not in meta


def test_truncated_metadata_degrades_to_coff():
    pe = make_dotnet_pe(refs=[("A", "", (1, 0, 0, 0))])
    meta = parse_pe(pe[:0x240])  # cor20 present, metadata cut off
    assert meta["format"] == "pe"  # no exception, COFF fields intact


def test_parse_dotnet_metadata_rejects_junk():
    assert parse_dotnet_metadata(b"XXXXGARBAGE" * 10, 0) is None
