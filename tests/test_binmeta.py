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


def elf64_dynamic_blob(needed=("libc.so.6", "libz.so.1"), soname="libme.so.2",
                       runpath="$ORIGIN/../lib", flags_1=None):
    """Minimal well-formed ELF64 with PT_LOAD (identity vaddr=offset)
    and PT_DYNAMIC: ehdr + 2 phdrs + dynamic array + strtab."""
    ehdr_sz, phent = 64, 56
    # layout: [ehdr][phdr0][phdr1][dynamic...][strtab]
    strtab = b"\x00"
    str_off = {}
    def s(name):
        nonlocal strtab
        if name not in str_off:
            str_off[name] = len(strtab)
            strtab += name.encode() + b"\x00"
        return str_off[name]

    dyn = []
    for n in needed:
        dyn.append((1, s(n)))          # DT_NEEDED
    dyn.append((14, s(soname)))        # DT_SONAME
    dyn.append((29, s(runpath)))       # DT_RUNPATH
    if flags_1 is not None:
        dyn.append((0x6FFFFFFB, flags_1))  # DT_FLAGS_1
    dyn_pos = ehdr_sz + 2 * phent
    n_dyn = len(dyn) + 2               # + DT_STRTAB + DT_NULL
    strtab_pos = dyn_pos + n_dyn * 16
    dyn.append((5, strtab_pos))        # DT_STRTAB (vaddr == offset)
    dyn.append((0, 0))                 # DT_NULL
    dyn_bytes = b"".join(struct.pack("<qQ", t, v) for t, v in dyn)
    total = strtab_pos + len(strtab)

    ident = b"\x7fELF" + bytes([2, 1, 1]) + b"\x00" * 9
    ehdr = ident + struct.pack("<HHIQQQIHHHHHH",
        3, 0x3E, 1,          # e_type=DYN, e_machine=x86_64, version
        0,                   # e_entry
        ehdr_sz,             # e_phoff
        0, 0,                # e_shoff, e_flags
        ehdr_sz, phent, 2,   # e_ehsize, e_phentsize, e_phnum
        0, 0, 0)             # shentsize, shnum, shstrndx
    def phdr(p_type, off, sz):
        return struct.pack("<IIQQQQQQ", p_type, 5, off, off, off, sz, sz, 0x1000)
    blob = (ehdr + phdr(1, 0, total) + phdr(2, dyn_pos, n_dyn * 16)
            + dyn_bytes + strtab)
    assert len(blob) == total
    return blob


def pe_blob(machine=0x8664, dll=False):
    characteristics = 0x0002 | (0x2000 if dll else 0)
    head = b"MZ" + b"\x00" * 0x3A + struct.pack("<I", 0x40)
    coff = b"PE\x00\x00" + struct.pack("<HHIIIHH", machine, 3, 1700000000, 0, 0, 224,
                                       characteristics)
    return head + coff + b"\x00" * 16


def pe_import_blob(dlls=("KERNEL32.dll", "ws2_32.dll")):
    """Minimal PE32+ with one section holding the import directory
    (identity-ish rva→raw mapping via the section header)."""
    e_lfanew = 0x40
    size_opt = 112 + 16 * 8  # PE32+ fixed part + 16 data directories
    sec0 = e_lfanew + 24 + size_opt
    raw_ptr = sec0 + 40            # section data right after the table
    va = 0x1000
    # section payload: descriptors (dlls + terminator) then names
    names_rel = (len(dlls) + 1) * 20
    rels, names = [], b""
    for d in dlls:
        rels.append(names_rel + len(names))
        names += d.encode() + b"\x00"
    descs = b""
    for r in rels:
        descs += struct.pack("<IIIII", 0, 0, 0, va + r, 0)
    descs += struct.pack("<IIIII", 0, 0, 0, 0, 0)
    payload = descs + names

    head = b"MZ" + b"\x00" * 0x3A + struct.pack("<I", e_lfanew)
    coff = b"PE\x00\x00" + struct.pack("<HHIIIHH", 0x8664, 1, 1700000000, 0, 0,
                                       size_opt, 0x0002)
    opt = struct.pack("<H", 0x20B) + b"\x00" * 106 + struct.pack("<I", 16)
    ddirs = struct.pack("<II", 0, 0) + struct.pack("<II", va, len(descs))
    ddirs += b"\x00" * 8 * 14
    section = (b".idata\x00\x00"
               + struct.pack("<IIII", len(payload), va, len(payload), raw_ptr)
               + b"\x00" * 16)
    blob = head + coff + opt + ddirs + section
    assert len(blob) == raw_ptr, (len(blob), raw_ptr)
    return blob + payload


def macho_blob(cputype=0x01000007, filetype=6):
    return b"\xcf\xfa\xed\xfe" + struct.pack("<iII", cputype, 3, filetype) + b"\x00" * 16


def macho_dylib_blob(deps=("/usr/lib/libSystem.B.dylib", "@rpath/libfoo.dylib"),
                     install="@rpath/libme.dylib", rpath="@loader_path/../lib"):
    """Mach-O 64 LE with LC_LOAD_DYLIB × deps, LC_ID_DYLIB, LC_RPATH."""
    def dylib_cmd(cmd, name):
        payload = name.encode() + b"\x00"
        size = 24 + len(payload)
        size += (-size) % 8  # 8-byte aligned
        return struct.pack("<IIIIII", cmd, size, 24, 0, 0x10000, 0x10000) \
            + payload.ljust(size - 24, b"\x00")

    def rpath_cmd(path):
        payload = path.encode() + b"\x00"
        size = 12 + len(payload)
        size += (-size) % 8
        return struct.pack("<III", 0x8000001C, size, 12) \
            + payload.ljust(size - 12, b"\x00")

    cmds = b"".join(dylib_cmd(0x0C, d) for d in deps)
    cmds += dylib_cmd(0x0D, install) + rpath_cmd(rpath)
    n = len(deps) + 2
    hdr = b"\xcf\xfa\xed\xfe" + struct.pack(
        "<iIIIII", 0x01000007, 3, 6, n, len(cmds), 0
    ) + b"\x00" * 4
    return hdr + cmds


def java_blob(major=55, minor=0):
    return b"\xca\xfe\xba\xbe" + struct.pack(">HH", minor, major) + b"\x00" * 8


def java_class_blob():
    """Minimal valid class file: cp = [Utf8 com/ex/Main, Class #1,
    Utf8 java/lang/Object, Class #3, Utf8 java/util/List, Class #5,
    Long (2 slots)], this_class = #2, super = #4."""
    def utf8(s):
        return b"\x01" + struct.pack(">H", len(s)) + s.encode()

    def clazz(idx):
        return b"\x07" + struct.pack(">H", idx)

    cp = [utf8("com/ex/Main"), clazz(1), utf8("java/lang/Object"), clazz(3),
          utf8("java/util/List"), clazz(5),
          b"\x05" + struct.pack(">q", 42)]  # Long: takes 2 slots
    cp_count = 1 + len(cp) + 1  # +1 slot for the Long's second slot
    body = struct.pack(">H", cp_count) + b"".join(cp)
    body += struct.pack(">HHH", 0x0021, 2, 4)  # access, this=#2, super=#4
    return b"\xca\xfe\xba\xbe" + struct.pack(">HH", 0, 55) + body


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


def test_elf_dynamic_needed_soname_runpath():
    m = parse_elf(elf64_dynamic_blob())
    assert m["needed"] == "libc.so.6|libz.so.1"  # sorted, '|'-joined
    assert m["soname"] == "libme.so.2"
    assert m["runpath"] == "$ORIGIN/../lib"
    assert m["type"] == "dyn" and m["machine"] == "x86_64"
    # truncated dynamic segment degrades to ident fields, never raises
    trunc = elf64_dynamic_blob()[:80]
    m2 = parse_elf(trunc)
    assert m2["machine"] == "x86_64" and "needed" not in m2


def test_pe_fields():
    m = parse_pe(pe_blob(dll=True))
    assert m == {"format": "pe", "machine": "x86_64", "n_sections": "3",
                 "is_dll": "true"}
    assert parse_pe(pe_blob(machine=0x014C, dll=False))["is_dll"] == "false"


def test_pe_import_table():
    m = parse_pe(pe_import_blob())
    assert m["imports"] == "KERNEL32.dll|ws2_32.dll"  # sorted
    assert m["machine"] == "x86_64" and m["n_sections"] == "1"
    # truncated import section degrades to COFF fields, never raises
    m2 = parse_pe(pe_import_blob()[:200])
    assert m2["machine"] == "x86_64" and "imports" not in m2


def test_macho_java_rpm_uimage_fields():
    assert parse_macho(macho_blob()) == {
        "format": "macho", "bits": "64", "cputype": "x86_64", "filetype": "dylib"}
    jm = parse_java_class(java_blob())
    assert (jm["format"], jm["major"], jm["minor"], jm["min_se"]) == (
        "javaclass", "55", "0", "11")
    assert parse_rpm_lead(rpm_blob())["name"] == "pkg-1.0"
    assert parse_uimage(uimage_blob()) == {
        "format": "uimage", "name": "kernel-img", "data_size": "12345"}


def test_java_constant_pool_imports_exports():
    m = parse_java_class(java_class_blob())
    assert m["exports"] == "com/ex/Main"
    assert m["imports"] == "java/lang/Object|java/util/List"
    assert m["min_se"] == "11"
    # truncated pool degrades to version-only, never raises
    trunc = java_class_blob()[:16]
    m2 = parse_java_class(trunc)
    assert m2["major"] == "55" and "exports" not in m2


def test_macho_load_commands():
    m = parse_macho(macho_dylib_blob())
    # deps sorted, '|'-joined (same convention as ELF needed)
    assert m["deps"] == "/usr/lib/libSystem.B.dylib|@rpath/libfoo.dylib"
    assert m["install_name"] == "@rpath/libme.dylib"
    assert m["rpaths"] == "@loader_path/../lib"
    assert m["cputype"] == "x86_64" and m["filetype"] == "dylib"
    # truncated command list degrades to header fields
    m2 = parse_macho(macho_dylib_blob()[:40])
    assert m2["cputype"] == "x86_64" and "deps" not in m2


def test_fat_macho_magic_not_misparsed_as_class():
    # 0xCAFEBABE with an implausible class version (fat arch count 2)
    fat = b"\xca\xfe\xba\xbe" + struct.pack(">I", 2) + b"\x00" * 24
    assert parse_java_class(fat) is None


def test_totality_on_junk():
    for junk in (b"", b"MZ", b"\x7fELF", b"\x00" * 200, b"plain text"):
        parse_binary_meta(junk)  # must not raise
    assert parse_binary_meta(b"random bytes" * 10) is None


def test_java_export_index_join(spark):
    """E5 + J4 end-to-end: parse class blobs → broadcast export index →
    exploded-imports equi-join = Uses edges, self-edges excluded
    (surfactant/relationships/java_relationship.py:11-51 shape)."""
    from pyspark.sql import functions as F

    from surfactant_spark.operators.multimodal import extract_binary_meta

    def clazz(name, imports):
        def utf8(s):
            return b"\x01" + struct.pack(">H", len(s)) + s.encode()

        def cref(idx):
            return b"\x07" + struct.pack(">H", idx)

        cp = [utf8(name), cref(1)]
        for imp in imports:
            cp.append(utf8(imp))
            cp.append(cref(len(cp) - 1 + 1))  # utf8 idx just appended
        body = struct.pack(">H", len(cp) + 1) + b"".join(cp)
        body += struct.pack(">HHH", 0x0021, 2, 0)
        return b"\xca\xfe\xba\xbe" + struct.pack(">HH", 0, 55) + body

    blobs = [
        ("jA", clazz("a/A", ["b/B", "c/C"])),
        ("jB", clazz("b/B", ["c/C"])),
        ("jC", clazz("c/C", [])),
    ]
    df = spark.createDataFrame(blobs, "media_id string, content binary")
    meta = extract_binary_meta(df).where(F.col("format") == "javaclass")
    exports = meta.select(
        F.col("meta").getItem("exports").alias("cls"),
        F.col("media_id").alias("supplier"),
    )
    imports = meta.select(
        "media_id",
        F.explode(F.split(F.col("meta").getItem("imports"), r"\|")).alias("cls"),
    ).where(F.col("cls") != "")
    uses = (
        imports.join(F.broadcast(exports), "cls")
        .where(F.col("media_id") != F.col("supplier"))
        .select("media_id", "supplier")
    )
    got = {(r.media_id, r.supplier) for r in uses.collect()}
    assert got == {("jA", "jB"), ("jA", "jC"), ("jB", "jC")}


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


def _vblock(key, value=b"", wtype=0, children=()):
    """One VS_VERSIONINFO block: wLength/wValueLength/wType/szKey(pad)
    value(pad) children — the public VERSIONINFO layout."""
    key_b = key.encode("utf-16-le") + b"\x00\x00"
    head_len = 6 + len(key_b)
    voff = (head_len + 3) & ~3
    body = b"\x00" * (voff - head_len) + value
    coff = (voff + len(value) + 3) & ~3
    body += b"\x00" * (coff - voff - len(value))
    for c in children:
        body += c + b"\x00" * ((4 - len(c) % 4) % 4)
    vlen = len(value) // 2 if wtype == 1 else len(value)
    return struct.pack("<HHH", head_len + len(body), vlen, wtype) + key_b + body


def _vstring(key, text):
    val = text.encode("utf-16-le") + b"\x00\x00"
    return _vblock(key, val, wtype=1)


def pe_version_resource_blob(strings):
    """PE32+ with a .rsrc section: RT_VERSION → name → lang → data →
    VS_VERSION_INFO(StringFileInfo(StringTable(String…)))."""
    table = _vblock("040904b0", children=[_vstring(k, v) for k, v in strings])
    sfi = _vblock("StringFileInfo", children=[table])
    ver = _vblock("VS_VERSION_INFO", value=b"\x00" * 52, children=[sfi])

    rsrc_rva, raw = 0x2000, 0x400
    def rdir(entries):  # [(id, off, is_dir)]
        out = struct.pack("<IIHHHH", 0, 0, 0, 0, 0, len(entries))
        for i, off, is_dir in entries:
            out += struct.pack("<II", i, off | (0x80000000 if is_dir else 0))
        return out

    # layout inside .rsrc: root(24) l2(24) l3(24) dataentry(16) verdata
    root = rdir([(16, 24, True)])
    l2 = rdir([(0, 48, True)])
    l3 = rdir([(0x409, 72, False)])
    data_entry = struct.pack("<IIII", rsrc_rva + 88, len(ver), 0, 0)
    rsrc = root + l2 + l3 + data_entry + ver

    e_lfanew = 0x80
    mz = b"MZ" + b"\x00" * 0x3A + struct.pack("<I", e_lfanew)
    mz += b"\x00" * (e_lfanew - len(mz))
    size_opt = 0xF0  # PE32+
    coff = struct.pack("<HHIIIHH", 0x8664, 1, 0, 0, 0, size_opt, 0x2102)
    opt = bytearray(struct.pack("<H", 0x20B)) + b"\x00" * (size_opt - 2)
    struct.pack_into("<II", opt, 112 + 2 * 8, rsrc_rva, len(rsrc))  # data dir 2
    sect = (b".rsrc\x00\x00\x00"
            + struct.pack("<IIII", len(rsrc), rsrc_rva, len(rsrc), raw)
            + b"\x00" * 16)
    head = (mz + b"PE\x00\x00" + coff + bytes(opt) + sect).ljust(raw, b"\x00")
    return head + rsrc


def test_pe_fileinfo_string_table():
    from surfactant_spark.functions.binmeta import parse_pe, pe_fileinfo

    blob = pe_version_resource_blob([
        ("CompanyName", "ACME Corp"),
        ("ProductName", "Widget"),
        ("ProductVersion", "4.2.0"),
        ("FileVersion", "4.2.0.1"),
    ])
    meta = parse_pe(blob)
    fi = pe_fileinfo(meta)
    assert fi == {
        "CompanyName": "ACME Corp",
        "ProductName": "Widget",
        "ProductVersion": "4.2.0",
        "FileVersion": "4.2.0.1",
    }


def test_pe_without_resources_has_no_fileinfo():
    from surfactant_spark.functions.binmeta import parse_pe
    meta = parse_pe(pe_blob())
    assert "fileinfo" not in meta


def test_aout_both_endians_and_chain_order():
    from surfactant_spark.functions.binmeta import parse_aout, parse_binary_meta

    little = struct.pack("<I", 0x0107 | (0x64 << 16)) + b"\x00" * 28  # 386 OMAGIC
    big = struct.pack(">I", 0x010B | (0xB7 << 16)) + b"\x00" * 28     # aarch64 ZMAGIC
    assert parse_aout(little) == {"format": "aout", "endian": "little",
                                  "machine": "386"}
    assert parse_aout(big) == {"format": "aout", "endian": "big",
                               "machine": "aarch64"}
    assert parse_aout(b"\x00" * 32) is None
    assert parse_binary_meta(little)["format"] == "aout"
    # ELF wins over the ambiguous a.out magic (parser-chain order)
    assert parse_binary_meta(elf64_blob())["format"] == "elf"


def pe_delay_import_blob(dlls=("delayed1.dll", "delayed2.dll")):
    """PE32+ with data directory 13 → delay descriptors in a section."""
    e_lfanew = 0x40
    size_opt = 112 + 16 * 8
    sec0 = e_lfanew + 24 + size_opt
    raw_ptr = sec0 + 40
    va = 0x1000
    names_rel = (len(dlls) + 1) * 32
    rels, names = [], b""
    for d in dlls:
        rels.append(names_rel + len(names))
        names += d.encode() + b"\x00"
    descs = b""
    for r in rels:
        descs += struct.pack("<8I", 1, va + r, 0, 0, 0, 0, 0, 0)
    descs += struct.pack("<8I", *([0] * 8))
    payload = descs + names

    head = b"MZ" + b"\x00" * 0x3A + struct.pack("<I", e_lfanew)
    coff = b"PE\x00\x00" + struct.pack("<HHIIIHH", 0x8664, 1, 0, 0, 0,
                                       size_opt, 0x0002)
    opt = bytearray(struct.pack("<H", 0x20B)) + b"\x00" * (size_opt - 2)
    struct.pack_into("<I", opt, 108, 16)  # NumberOfRvaAndSizes
    struct.pack_into("<II", opt, 112 + 13 * 8, va, len(descs))
    section = (b".didat\x00\x00"
               + struct.pack("<IIII", len(payload), va, len(payload), raw_ptr)
               + b"\x00" * 16)
    blob = head + coff + bytes(opt) + section
    assert len(blob) == raw_ptr, (len(blob), raw_ptr)
    return blob + payload


def pe_bound_import_blob(dlls=("bound1.dll", "bound2.dll")):
    """PE with data directory 11 → bound-import table in the headers
    (RVA == file offset, as loaders require)."""
    e_lfanew = 0x40
    size_opt = 112 + 16 * 8
    tbl_off = e_lfanew + 24 + size_opt  # right after optional header
    entries = b""
    names = b""
    names_rel = (len(dlls) + 1) * 8
    for d in dlls:
        entries += struct.pack("<IHH", 1, names_rel + len(names), 0)
        names += d.encode() + b"\x00"
    entries += struct.pack("<IHH", 0, 0, 0)
    payload = entries + names

    head = b"MZ" + b"\x00" * 0x3A + struct.pack("<I", e_lfanew)
    coff = struct.pack("<HHIIIHH", 0x8664, 0, 0, 0, 0, size_opt, 0x0002)
    opt = bytearray(struct.pack("<H", 0x20B)) + b"\x00" * (size_opt - 2)
    struct.pack_into("<II", opt, 112 + 11 * 8, tbl_off, len(payload))
    blob = head + b"PE\x00\x00" + coff + bytes(opt)
    assert len(blob) == tbl_off
    return blob + payload


def test_pe_delay_and_bound_imports():
    from surfactant_spark.functions.binmeta import parse_pe

    m = parse_pe(pe_delay_import_blob())
    assert m["delay_imports"] == "delayed1.dll|delayed2.dll"
    m2 = parse_pe(pe_bound_import_blob())
    assert m2["bound_imports"] == "bound1.dll|bound2.dll"
    # plain PE: neither field
    m3 = parse_pe(pe_blob())
    assert "delay_imports" not in m3 and "bound_imports" not in m3


def test_elf_interpreter_and_flags():
    """PT_INTERP + DT_FLAGS surface as interpreter / flags fields
    (reference elfInterpreter, elfDynamicFlags: elf_file.py:56-195)."""
    from surfactant_spark.functions.binmeta import parse_elf

    interp = b"/lib64/ld-linux-x86-64.so.2\x00"
    ehdr_sz, phent = 64, 56
    ident = b"\x7fELF" + bytes([2, 1, 1]) + b"\x00" * 9
    ehdr = ident + struct.pack("<HHIQQQIHHHHHH",
        2, 0x3E, 1, 0, ehdr_sz, 0, 0, ehdr_sz, phent, 1, 0, 0, 0)
    ioff = ehdr_sz + phent
    phdr = struct.pack("<IIQQQQQQ", 3, 4, ioff, ioff, ioff,
                       len(interp), len(interp), 1)
    m = parse_elf(ehdr + phdr + interp)
    assert m["interpreter"] == "/lib64/ld-linux-x86-64.so.2"
    assert m["type"] == "exec"
