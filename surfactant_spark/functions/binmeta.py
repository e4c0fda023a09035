"""Typed metadata extraction from binary headers — the E-family analog
(surfactant/infoextractors/elf_file.py, pe_file.py, mach_o_file.py,
java_file.py, rpm_file.py, uimage_file.py) as dependency-free parsers
over public format layouts.

The reference leans on libraries (pyelftools, pefile, …); none ship in
this container, so these parse exactly the fixed-offset header fields
the relationship joins and stat aggregations consume: type/machine/
class for ELF, machine/characteristics for PE/COFF, cputype for
Mach-O, class-file version for Java, lead name for RPM, image name for
uImage.  Every parser is total: malformed input returns None rather
than raising (a single bad blob must never fail a partition — the
reference's log-and-continue policy, file_decompression.py:158-161).

All offsets/constants are from the public format specifications
(ELF: System V ABI; PE/COFF: Microsoft PE spec; Mach-O: loader.h;
Java: JVM spec §4.1; RPM: rpm lead struct; uImage: U-Boot image.h).
"""

from __future__ import annotations

import struct

ELF_MACHINES = {
    0x03: "x86", 0x28: "arm", 0x3E: "x86_64", 0xB7: "aarch64",
    0xF3: "riscv", 0x08: "mips", 0x14: "ppc", 0x15: "ppc64",
    0x16: "s390", 0x2A: "superh",
}
ELF_TYPES = {1: "rel", 2: "exec", 3: "dyn", 4: "core"}

PE_MACHINES = {
    0x014C: "x86", 0x8664: "x86_64", 0x01C0: "arm", 0xAA64: "aarch64",
    0x0200: "ia64", 0x01C4: "armnt",
}
PE_DLL_FLAG = 0x2000  # IMAGE_FILE_DLL in Characteristics

MACHO_CPUTYPES = {
    7: "x86", 0x01000007: "x86_64", 12: "arm", 0x0100000C: "aarch64",
    18: "ppc", 0x01000012: "ppc64",
}
MACHO_FILETYPES = {1: "object", 2: "exec", 6: "dylib", 8: "bundle"}


# dynamic-section tags (System V ABI; DT_FLAGS_1 from the Solaris/glibc
# extension range)
_DT_NULL, _DT_NEEDED, _DT_STRTAB = 0, 1, 5
_DT_SONAME, _DT_RPATH, _DT_RUNPATH = 14, 15, 29
_DT_FLAGS, _DT_FLAGS_1 = 30, 0x6FFFFFFB
_DF_1_NODEFLIB = 0x0800  # object must not search default library paths
_PT_LOAD, _PT_DYNAMIC, _PT_INTERP = 1, 2, 3


def _elf_dynamic(b: bytes, endian: str) -> dict[str, str]:
    """Walk ELF64 program headers → PT_DYNAMIC → DT_NEEDED /
    DT_SONAME / DT_RPATH / DT_RUNPATH, resolving the string table
    through the PT_LOAD vaddr→offset mapping — the elfDependencies
    source the reference feeds into the Uses join
    (elf_file.py:56-195; deps sorted for stable output per
    elf_file.py:172-173)."""
    e_phoff, = struct.unpack_from(endian + "Q", b, 32)
    e_phentsize, e_phnum = struct.unpack_from(endian + "HH", b, 54)
    loads: list[tuple[int, int, int]] = []  # (vaddr, offset, filesz)
    dyn_off = dyn_sz = None
    interp = None
    for i in range(min(e_phnum, 64)):
        off = e_phoff + i * e_phentsize
        p_type, = struct.unpack_from(endian + "I", b, off)
        p_offset, p_vaddr = struct.unpack_from(endian + "QQ", b, off + 8)
        p_filesz, = struct.unpack_from(endian + "Q", b, off + 32)
        if p_type == _PT_LOAD:
            loads.append((p_vaddr, p_offset, p_filesz))
        elif p_type == _PT_DYNAMIC:
            dyn_off, dyn_sz = p_offset, p_filesz
        elif p_type == _PT_INTERP and p_filesz:
            raw = b[p_offset:p_offset + min(p_filesz, 256)]
            interp = raw.split(b"\x00", 1)[0].decode("utf-8", "replace")
    if dyn_off is None:
        return {"interpreter": interp} if interp else {}

    def v2o(vaddr: int) -> int | None:
        for pv, po, sz in loads:
            if pv <= vaddr < pv + sz:
                return vaddr - pv + po
        return None

    entries: list[tuple[int, int]] = []
    strtab_v = None
    for off in range(dyn_off, min(dyn_off + dyn_sz, len(b) - 15), 16):
        tag, val = struct.unpack_from(endian + "qQ", b, off)
        if tag == _DT_NULL:
            break
        entries.append((tag, val))
        if tag == _DT_STRTAB:
            strtab_v = val
    if strtab_v is None:
        return {}
    str_off = v2o(strtab_v)
    if str_off is None:
        return {}

    def cstr(rel: int) -> str:
        start = str_off + rel
        end = b.find(b"\x00", start)
        return b[start:end].decode("utf-8", errors="replace") if end > start else ""

    needed = sorted(cstr(v) for t, v in entries if t == _DT_NEEDED)
    out: dict[str, str] = {}
    if needed:
        out["needed"] = "|".join(n for n in needed if n)
    for tag, key in ((_DT_SONAME, "soname"), (_DT_RPATH, "rpath"),
                     (_DT_RUNPATH, "runpath")):
        vals = [cstr(v) for t, v in entries if t == tag]
        if vals and vals[0]:
            out[key] = vals[0]
    # DT_FLAGS_1 drives search-path semantics: DF_1_NODEFLIB suppresses
    # the default library dirs in the Uses probe join — the switch the
    # reference reads from elfDynamicFlags1
    # (elf_relationship.py:186-206, elf_file.py:64-79)
    flags1 = [v for t, v in entries if t == _DT_FLAGS_1]
    if flags1:
        out["flags_1"] = hex(flags1[0])
        if flags1[0] & _DF_1_NODEFLIB:
            out["nodeflib"] = "true"
    flags = [v for t, v in entries if t == _DT_FLAGS]
    if flags:
        out["flags"] = hex(flags[0])
    if interp:
        out["interpreter"] = interp  # the elfInterpreter field (PT_INTERP)
    return out


def parse_elf(b: bytes) -> dict[str, str] | None:
    """ELF ident + e_type/e_machine + dynamic-linking metadata
    (elf_file.py:56-195 core fields).  The dynamic walk is best-effort:
    malformed tables degrade to the ident fields."""
    if len(b) < 20 or b[:4] != b"\x7fELF":
        return None
    ei_class = {1: "elf32", 2: "elf64"}.get(b[4])
    ei_data = {1: "lsb", 2: "msb"}.get(b[5])
    if ei_class is None or ei_data is None:
        return None
    endian = "<" if ei_data == "lsb" else ">"
    e_type, e_machine = struct.unpack_from(endian + "HH", b, 16)
    out = {
        "format": "elf",
        "class": ei_class,
        "endian": ei_data,
        "type": ELF_TYPES.get(e_type, f"unknown({e_type})"),
        "machine": ELF_MACHINES.get(e_machine, f"unknown({e_machine})"),
    }
    if ei_class == "elf64" and len(b) >= 64:
        try:
            out.update(_elf_dynamic(b, endian))
        except Exception:
            pass  # ident fields only (log-and-continue policy)
    return out


def _pe_data_dir(b: bytes, e_lfanew: int, idx: int) -> tuple[int, int]:
    """(rva, size) of optional-header data directory ``idx``
    (PE32/PE32+ layouts differ by 16 bytes before the directories)."""
    opt = e_lfanew + 24
    (magic,) = struct.unpack_from("<H", b, opt)
    dd = opt + (112 if magic == 0x20B else 96)
    if dd + 8 * idx + 8 > len(b):
        return 0, 0
    return struct.unpack_from("<II", b, dd + 8 * idx)


def _pe_rva2off(b: bytes, e_lfanew: int, n_sections: int, size_opt: int):
    """RVA → file-offset resolver through the section table."""
    sec0 = e_lfanew + 24 + size_opt
    sections = []
    for i in range(min(n_sections, 96)):
        off = sec0 + i * 40
        vsize, vaddr, rawsz, rawptr = struct.unpack_from("<IIII", b, off + 8)
        sections.append((vaddr, max(vsize, rawsz), rawptr))

    def rva2off(rva: int) -> int | None:
        for va, sz, raw in sections:
            if va <= rva < va + sz:
                return rva - va + raw
        return None

    return rva2off


def _pe_imports(b: bytes, e_lfanew: int, n_sections: int, size_opt: int) -> str:
    """Imported DLL names from the import directory — the peImport
    source feeding the reference's PE Uses join
    (pe_file.py:145-149, pe_relationship.py:19-78).  RVAs resolve
    through the section table; sorted '|'-joined, '' when absent."""
    imp_rva, imp_sz = _pe_data_dir(b, e_lfanew, 1)  # entry 1 = imports
    if imp_rva == 0:
        return ""
    rva2off = _pe_rva2off(b, e_lfanew, n_sections, size_opt)

    def cstr(off: int) -> str:
        end = b.find(b"\x00", off)
        return b[off:end].decode("ascii", errors="replace") if end > off else ""

    names = set()
    desc = rva2off(imp_rva)
    if desc is None:
        return ""
    for i in range(0, min(imp_sz, 64 * 20), 20):
        if desc + i + 20 > len(b):
            break
        fields = struct.unpack_from("<IIIII", b, desc + i)
        if not any(fields):
            break
        name_off = rva2off(fields[3])
        if name_off is not None:
            n = cstr(name_off)
            if n:
                names.add(n)
    return "|".join(sorted(names))


def _pe_delay_imports(b: bytes, e_lfanew: int, n_sections: int,
                      size_opt: int) -> str:
    """Delay-loaded DLL names (data directory 13; 32-byte descriptors
    with DllNameRVA at offset 4) — the peDelayImport list
    (pe_file.py:158-162)."""
    rva, sz = _pe_data_dir(b, e_lfanew, 13)
    if rva == 0:
        return ""
    rva2off = _pe_rva2off(b, e_lfanew, n_sections, size_opt)
    desc = rva2off(rva)
    if desc is None:
        return ""
    names = set()
    for i in range(0, min(sz, 64 * 32), 32):
        if desc + i + 32 > len(b):
            break
        fields = struct.unpack_from("<8I", b, desc + i)
        if not any(fields):
            break
        name_off = rva2off(fields[1])
        if name_off is not None:
            end = b.find(b"\x00", name_off)
            if end > name_off:
                names.add(b[name_off:end].decode("ascii", "replace"))
    return "|".join(sorted(names))


def _pe_bound_imports(b: bytes, e_lfanew: int) -> str:
    """Bound-import DLL names (data directory 11; descriptors with a
    name offset relative to the table start, which lives in the
    headers, not a section) — the peBoundImport list
    (pe_file.py:152-156)."""
    rva, sz = _pe_data_dir(b, e_lfanew, 11)
    if rva == 0:
        return ""
    # the bound import table sits before the sections: RVA == offset
    names = set()
    p = rva
    for _ in range(64):
        if p + 8 > len(b):
            break
        ts, name_off, n_fwd = struct.unpack_from("<IHH", b, p)
        if ts == 0 and name_off == 0:
            break
        start = rva + name_off
        end = b.find(b"\x00", start)
        if end > start:
            names.add(b[start:end].decode("ascii", "replace"))
        p += 8 * (1 + n_fwd)
    return "|".join(sorted(names))


def parse_pe(b: bytes) -> dict[str, str] | None:
    """MZ → e_lfanew → 'PE\\0\\0' → COFF machine/characteristics +
    imported DLL names (pe_file.py:116-232 core fields; is_dll from
    IMAGE_FILE_DLL).  Import parsing is best-effort: malformed tables
    degrade to the COFF fields."""
    if len(b) < 0x40 or b[:2] != b"MZ":
        return None
    (e_lfanew,) = struct.unpack_from("<I", b, 0x3C)
    if e_lfanew + 24 > len(b) or b[e_lfanew:e_lfanew + 4] != b"PE\x00\x00":
        return None
    machine, n_sections, _ts = struct.unpack_from("<HHI", b, e_lfanew + 4)
    (size_opt,) = struct.unpack_from("<H", b, e_lfanew + 20)
    (characteristics,) = struct.unpack_from("<H", b, e_lfanew + 22)
    out = {
        "format": "pe",
        "machine": PE_MACHINES.get(machine, f"unknown({machine})"),
        "n_sections": str(n_sections),
        "is_dll": str(bool(characteristics & PE_DLL_FLAG)).lower(),
    }
    if size_opt >= 96:
        try:
            imports = _pe_imports(b, e_lfanew, n_sections, size_opt)
            if imports:
                out["imports"] = imports
        except Exception:
            pass  # COFF fields only (log-and-continue policy)
        try:
            dotnet = _pe_dotnet(b, e_lfanew, n_sections, size_opt)
            if dotnet is not None:
                out["is_clr"] = "true"
                out.update(dotnet)
        except Exception:
            pass
        try:
            fi = _pe_fileinfo(b, e_lfanew, n_sections, size_opt)
            if fi:
                out["fileinfo"] = "\n".join(f"{k}\t{v}" for k, v in fi)
        except Exception:
            pass
        for key, fn in (
            ("delay_imports",
             lambda: _pe_delay_imports(b, e_lfanew, n_sections, size_opt)),
            ("bound_imports", lambda: _pe_bound_imports(b, e_lfanew)),
        ):
            try:
                v = fn()
                if v:
                    out[key] = v
            except Exception:
                pass
    return out


_RT_VERSION = 16


def _pe_fileinfo(b: bytes, e_lfanew: int, n_sections: int,
                 size_opt: int) -> list[tuple[str, str]]:
    """StringFileInfo entries from the RT_VERSION resource — the
    FileInfo table the reference reads via pefile's FileInfo attribute
    (pe_file.py:182-189): resource directory (data directory 2) →
    type 16 → first name → first language → VS_VERSIONINFO block tree →
    StringFileInfo → StringTable → (key, value) pairs."""
    rsrc_rva, rsrc_sz = _pe_data_dir(b, e_lfanew, 2)
    if rsrc_rva == 0:
        return []
    rva2off = _pe_rva2off(b, e_lfanew, n_sections, size_opt)
    base = rva2off(rsrc_rva)
    if base is None:
        return []

    def first_child(dir_off: int, want_id: int | None) -> int | None:
        """Offset (relative to base) of a child entry's target; high bit
        of the offset marks a subdirectory."""
        if base + dir_off + 16 > len(b):
            return None
        n_named, n_ids = struct.unpack_from("<HH", b, base + dir_off + 12)
        for i in range(n_named + n_ids):
            ent = base + dir_off + 16 + 8 * i
            name, off = struct.unpack_from("<II", b, ent)
            if want_id is None or name == want_id:
                return off
        return None

    off = first_child(0, _RT_VERSION)
    for _ in range(2):  # name level, then language level: first entry
        if off is None or not off & 0x80000000:
            return []
        off = first_child(off & 0x7FFFFFFF, None)
    if off is None or off & 0x80000000:
        return []
    data_rva, data_sz = struct.unpack_from("<II", b, base + off)
    blk = rva2off(data_rva)
    if blk is None:
        return []
    ver = b[blk:blk + min(data_sz, 1 << 16)]

    def block(off: int) -> tuple[int, str, int, int] | None:
        """(total_len, key, value_off, value_len_bytes) of the version
        block at off; None when malformed."""
        if off + 6 > len(ver):
            return None
        ln, vlen, wtype = struct.unpack_from("<HHH", ver, off)
        if ln == 0:
            return None
        # the key's UTF-16 NUL ends on an even boundary from the key start
        k = off + 6
        while k + 2 <= len(ver) and ver[k:k + 2] != b"\x00\x00":
            k += 2
        key = ver[off + 6:k].decode("utf-16-le", "replace")
        voff = (k + 2 + 3) & ~3
        return ln, key, voff, vlen * (2 if wtype == 1 else 1)

    out: list[tuple[str, str]] = []
    root = block(0)
    if root is None or root[1] != "VS_VERSION_INFO":
        return []
    child = (root[2] + root[3] + 3) & ~3
    while child + 6 <= min(root[0], len(ver)):
        c = block(child)
        if c is None:
            break
        if c[1] == "StringFileInfo":
            tbl = block((c[2] + 3) & ~3)
            if tbl is not None:
                s_off = (tbl[2] + 3) & ~3
                while s_off + 6 <= min(child + c[0], len(ver)):
                    s = block(s_off)
                    if s is None:
                        break
                    val = ver[s[2]:s[2] + s[3]].decode(
                        "utf-16-le", "replace").rstrip("\x00")
                    out.append((s[1], val))
                    s_off = (s_off + s[0] + 3) & ~3
        child = (child + c[0] + 3) & ~3
    return out


def pe_fileinfo(meta: dict[str, str]) -> dict[str, str]:
    """Decode the ``fileinfo`` encoding back to the reference's
    FileInfo dict shape (pe_file.py:182-189)."""
    out: dict[str, str] = {}
    for line in meta.get("fileinfo", "").split("\n"):
        if "\t" in line:
            k, v = line.split("\t", 1)
            out[k] = v
    return out


def _pe_dotnet(b: bytes, e_lfanew: int, n_sections: int,
               size_opt: int) -> dict[str, str] | None:
    """CLI header (data directory 14) → metadata root → ECMA-335 table
    decode (dotnetmeta.py) — the dotnetAssembly / dotnetAssemblyRef /
    dotnetImplMap sources of pe_file.py:193-218."""
    from .dotnetmeta import parse_dotnet_metadata

    cor_rva, cor_sz = _pe_data_dir(b, e_lfanew, 14)  # COM descriptor
    if cor_rva == 0 or cor_sz == 0:
        return None
    rva2off = _pe_rva2off(b, e_lfanew, n_sections, size_opt)
    cor = rva2off(cor_rva)
    if cor is None or cor + 16 > len(b):
        return None
    md_rva, _md_size = struct.unpack_from("<II", b, cor + 8)
    md = rva2off(md_rva)
    if md is None:
        return None
    return parse_dotnet_metadata(b, md)


_LC_LOAD_DYLIB, _LC_ID_DYLIB, _LC_RPATH = 0x0C, 0x0D, 0x8000001C


def parse_macho(b: bytes) -> dict[str, str] | None:
    """Mach-O header + load-command walk: cputype/filetype plus
    LC_LOAD_DYLIB dependencies, LC_ID_DYLIB install name, and LC_RPATH
    entries (mach_o_file.py:60-185 — the deps/rpaths the reference's
    Mach-O Uses resolution consumes).  Strings are NUL-terminated at a
    per-command offset; malformed commands degrade to header fields."""
    if len(b) < 16:
        return None
    magics = {
        b"\xfe\xed\xfa\xce": (">", False), b"\xce\xfa\xed\xfe": ("<", False),
        b"\xfe\xed\xfa\xcf": (">", True), b"\xcf\xfa\xed\xfe": ("<", True),
    }
    m = magics.get(b[:4])
    if m is None:
        return None
    endian, is64 = m
    cputype, _cpusub, filetype = struct.unpack_from(endian + "iII", b, 4)
    out = {
        "format": "macho",
        "bits": "64" if is64 else "32",
        "cputype": MACHO_CPUTYPES.get(cputype, f"unknown({cputype})"),
        "filetype": MACHO_FILETYPES.get(filetype, f"unknown({filetype})"),
    }
    try:
        (ncmds,) = struct.unpack_from(endian + "I", b, 16)
        pos = 32 if is64 else 28
        deps, rpaths, install = [], [], None

        def lc_str(cmd_start: int, cmd_size: int) -> str:
            (off,) = struct.unpack_from(endian + "I", b, cmd_start + 8)
            end = b.find(b"\x00", cmd_start + off, cmd_start + cmd_size)
            return b[cmd_start + off:end].decode("utf-8", errors="replace") \
                if end > cmd_start + off else ""

        for _ in range(min(ncmds, 256)):
            if pos + 8 > len(b):
                break
            cmd, cmdsize = struct.unpack_from(endian + "II", b, pos)
            if cmdsize < 8 or pos + cmdsize > len(b):
                break
            if cmd == _LC_LOAD_DYLIB:
                deps.append(lc_str(pos, cmdsize))
            elif cmd == _LC_ID_DYLIB:
                install = lc_str(pos, cmdsize)
            elif cmd == _LC_RPATH:
                rpaths.append(lc_str(pos, cmdsize))
            pos += cmdsize
        if deps:
            out["deps"] = "|".join(sorted(d for d in deps if d))
        if install:
            out["install_name"] = install
        if rpaths:
            out["rpaths"] = "|".join(r for r in rpaths if r)
    except Exception:
        pass  # header fields only (log-and-continue policy)
    return out


# constant-pool entry payload sizes by tag (JVM spec §4.4); Utf8 (1) is
# variable, Long/Double (5/6) occupy two pool slots
_CP_FIXED = {3: 4, 4: 4, 7: 2, 8: 2, 9: 4, 10: 4, 11: 4, 12: 4,
             15: 3, 16: 2, 17: 4, 18: 4, 19: 2, 20: 2}


def parse_java_class(b: bytes) -> dict[str, str] | None:
    """Class-file version + constant-pool class references — the
    javaImports/javaExports source (java_file.py:68-98): exports =
    this_class name, imports = every other CONSTANT_Class entry
    (sorted, '|'-joined; array-member refs excluded).  major - 44 = SE.
    Truncated/malformed pools degrade to the version-only fields."""
    if len(b) < 10 or b[:4] != b"\xca\xfe\xba\xbe":
        return None
    minor, major = struct.unpack_from(">HH", b, 4)
    if major < 45 or major > 80:  # fat Mach-O shares the magic
        return None
    out = {
        "format": "javaclass",
        "major": str(major),
        "minor": str(minor),
        "min_se": str(major - 44),
    }
    try:
        (cp_count,) = struct.unpack_from(">H", b, 8)
        pos = 10
        utf8: dict[int, str] = {}
        class_refs: dict[int, int] = {}  # cp index → utf8 index
        i = 1
        while i < cp_count:
            tag = b[pos]
            pos += 1
            if tag == 1:
                (ln,) = struct.unpack_from(">H", b, pos)
                utf8[i] = b[pos + 2:pos + 2 + ln].decode("utf-8", errors="replace")
                pos += 2 + ln
            elif tag in (5, 6):
                pos += 8
                i += 1  # longs/doubles take two slots
            elif tag in _CP_FIXED:
                if tag == 7:
                    (name_idx,) = struct.unpack_from(">H", b, pos)
                    class_refs[i] = name_idx
                pos += _CP_FIXED[tag]
            else:
                raise ValueError(f"bad cp tag {tag}")
            i += 1
        _access, this_class = struct.unpack_from(">HH", b, pos)
        names = {
            ci: utf8.get(ni, "") for ci, ni in class_refs.items()
        }
        exports = names.get(this_class, "")
        imports = sorted(
            n for ci, n in names.items()
            if ci != this_class and n and not n.startswith("[")
        )
        out["exports"] = exports
        out["imports"] = "|".join(imports)
    except Exception:
        pass  # version-only on malformed pools (log-and-continue policy)
    return out


def parse_rpm_lead(b: bytes) -> dict[str, str] | None:
    """RPM lead: version + type + NUL-terminated name at offset 10
    (rpm_file.py:128-208 name/version hint source)."""
    if len(b) < 96 or b[:4] != b"\xed\xab\xee\xdb":
        return None
    major, minor = b[4], b[5]
    (rpm_type,) = struct.unpack_from(">h", b, 6)
    name = b[10:76].split(b"\x00", 1)[0].decode("ascii", errors="replace")
    return {
        "format": "rpm",
        "lead_version": f"{major}.{minor}",
        "type": {0: "binary", 1: "source"}.get(rpm_type, f"unknown({rpm_type})"),
        "name": name,
    }


# RPM header tag numbers (public rpm.org file-format spec / rpmtag.h)
_RPMTAG_STR = {
    1000: "name", 1001: "version", 1002: "release", 1004: "summary",
    1020: "url", 1021: "os", 1022: "arch", 1044: "sourcerpm",
}
_RPMTAG_DIRINDEXES = 1116
_RPMTAG_BASENAMES = 1117
_RPMTAG_DIRNAMES = 1118
_RPMTAG_FILEDIGESTS = 1035  # historically FILEMD5S — same tag number
_RPMTAG_PROVIDENAME, _RPMTAG_PROVIDEVERSION = 1047, 1113
_RPMTAG_REQUIRENAME, _RPMTAG_REQUIREVERSION = 1049, 1050


def _rpm_header(b: bytes, off: int) -> tuple[dict[int, object], int] | None:
    """One RPM header section (magic 8e ad e8 01, 4 reserved, nindex,
    hsize, nindex 16-byte index entries, hsize data bytes).  Returns
    (tag → decoded value, offset past the data store)."""
    if len(b) < off + 16 or b[off:off + 3] != b"\x8e\xad\xe8":
        return None
    nindex, hsize = struct.unpack_from(">II", b, off + 8)
    store = off + 16 + 16 * nindex
    end = store + hsize
    if nindex > 65536 or end > len(b):
        return None
    tags: dict[int, object] = {}
    for i in range(nindex):
        tag, typ, doff, count = struct.unpack_from(">iIII", b, off + 16 + 16 * i)
        p = store + doff
        if p >= end:
            continue
        if typ in (6, 9):  # STRING / I18NSTRING (first locale)
            tags[tag] = b[p:end].split(b"\x00", 1)[0].decode("utf-8", "replace")
        elif typ == 8:  # STRING_ARRAY
            vals, q = [], p
            for _ in range(count):
                nul = b.find(b"\x00", q, end)
                if nul < 0:
                    break
                vals.append(b[q:nul].decode("utf-8", "replace"))
                q = nul + 1
            tags[tag] = vals
        elif typ == 4 and p + 4 * count <= end:  # INT32 array
            tags[tag] = list(struct.unpack_from(f">{count}I", b, p))
        elif typ == 3 and p + 2 * count <= end:  # INT16 array
            tags[tag] = list(struct.unpack_from(f">{count}H", b, p))
    return tags, end


def rpm_digest_algo(digest: str) -> str | None:
    """Hash algorithm from hex-digest length — the reference's
    length-based detection (rpm_file.py:38-55; standard hex sizes)."""
    return {32: "md5", 40: "sha1", 64: "sha256", 128: "sha512"}.get(len(digest))


def parse_rpm(b: bytes) -> dict[str, str] | None:
    """RPM lead + signature header + main header: simple string tags,
    provides/requires pairs, and the per-file digest map that feeds the
    ``Installs`` edge join (rpm_file.py:133-213 field set;
    relationships/rpmfile_relationship.py:20-65 consumer).

    ``associated_files`` is encoded as newline-separated
    ``path<TAB>digest`` entries (decode with
    :func:`rpm_associated_files`); ``file_algo`` is detected from
    digest length like the reference's ``algo_from_len``."""
    out = parse_rpm_lead(b)
    if out is None:
        return None
    sig = _rpm_header(b, 96)
    if sig is None:
        return out  # lead-only fallback (log-and-continue policy)
    _, sig_end = sig
    hdr = _rpm_header(b, (sig_end + 7) & ~7)  # signature pads to 8 bytes
    if hdr is None:
        return out
    tags, _ = hdr
    for tag, key in _RPMTAG_STR.items():
        if tag in tags and isinstance(tags[tag], str):
            out[key] = tags[tag]
    for name_tag, ver_tag, key in (
        (_RPMTAG_PROVIDENAME, _RPMTAG_PROVIDEVERSION, "provides"),
        (_RPMTAG_REQUIRENAME, _RPMTAG_REQUIREVERSION, "requires"),
    ):
        names, vers = tags.get(name_tag), tags.get(ver_tag)
        if isinstance(names, list) and isinstance(vers, list) and len(names) == len(vers):
            out[key] = "|".join(f"{n} {v}".rstrip() for n, v in zip(names, vers))
    basenames = tags.get(_RPMTAG_BASENAMES)
    dirnames = tags.get(_RPMTAG_DIRNAMES)
    dirindexes = tags.get(_RPMTAG_DIRINDEXES)
    digests = tags.get(_RPMTAG_FILEDIGESTS)
    if (
        isinstance(basenames, list) and isinstance(dirnames, list)
        and isinstance(dirindexes, list) and isinstance(digests, list)
        and len(basenames) == len(dirindexes) == len(digests)
    ):
        entries, algo = [], None
        for base, di, dg in zip(basenames, dirindexes, digests):
            if not 0 <= di < len(dirnames):
                continue
            entries.append(f"{dirnames[di]}{base}\t{dg}")
            if algo is None and dg:
                algo = rpm_digest_algo(dg)
        if entries:
            out["associated_files"] = "\n".join(entries)
            if algo:
                out["file_algo"] = algo
    return out


def rpm_associated_files(meta: dict[str, str]) -> list[tuple[str, str]]:
    """Decode :func:`parse_rpm`'s ``associated_files`` encoding back to
    (path, digest) pairs; empty-digest entries (ghost/dir files) kept —
    the Installs join filters them like the reference's falsy check
    (rpmfile_relationship.py:31-32)."""
    enc = meta.get("associated_files", "")
    if not enc:
        return []
    return [tuple(line.split("\t", 1)) for line in enc.split("\n") if "\t" in line]


# --- a.out (E9) -----------------------------------------------------------

# exec-header magics and machine ids from the public BSD exec.h /
# aout_mids.h tables (the same sources the reference cites,
# a_out_file.py:26-30); subset covering the ids that remain decodable
_AOUT_MAGICS = {0x111, 0x108, 0x107, 0x0CC, 0x10B}
_AOUT_MIDS = {
    0x00: "unknown", 0x01: "m68010", 0x02: "m68020", 0x03: "sparc",
    0x04: "r3000", 0x64: "386", 0x67: "arm", 0x86: "netbsd/i386",
    0x8A: "netbsd/sparc", 0x8D: "netbsd/alpha", 0x8F: "netbsd/arm32",
    0x97: "mips1", 0x98: "mips2", 0x9C: "netbsd/sparc64",
    0x9D: "netbsd/amd64", 0xB7: "aarch64", 0xB9: "riscv",
}


def parse_aout(b: bytes) -> dict[str, str] | None:
    """Classic a.out exec header: 16-bit magic + machine id byte, both
    endiannesses probed like the reference's dual check
    (filetypeid/id_magic.py:163-175, a_out_file.py:88-101).  The magic
    is only 16 bits, so this parser runs LAST in the chain — ambiguity
    is inherent to the format and mirrored from the reference."""
    if len(b) < 32:
        return None
    for bo in ("big", "little"):
        word = int.from_bytes(b[:4], byteorder=bo)
        if word & 0xFFFF in _AOUT_MAGICS:
            mid = (word >> 16) & 0xFF
            if mid in _AOUT_MIDS:
                return {
                    "format": "aout",
                    "endian": bo,
                    "machine": _AOUT_MIDS[mid],
                }
    return None


# --- OLE / CFB (E7) -------------------------------------------------------

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN, _FREESECT = 0xFFFFFFFE, 0xFFFFFFFF
_CLSID_TYPES = {
    "000c1082-0000-0000-c000-000000000046": "MST",
    "000c1084-0000-0000-c000-000000000046": "MSI",
    "000c1086-0000-0000-c000-000000000046": "MSP",
}
# PIDSI property ids → olefile SUMMARY_ATTRIBS naming, the field set the
# reference turns into name/version/vendor hints (ole_file.py:83-127)
_PIDSI = {2: "title", 3: "subject", 4: "author", 5: "keywords",
          6: "comments", 7: "template", 8: "last_saved_by",
          9: "revision_number"}


def _cfb_clsid(raw: bytes) -> str:
    d1, d2, d3 = struct.unpack_from("<IHH", raw, 0)
    return (f"{d1:08x}-{d2:04x}-{d3:04x}-{raw[8:10].hex()}-{raw[10:16].hex()}")


def _propset_strings(b: bytes) -> dict[str, str]:
    """\\x05SummaryInformation property-set stream → PIDSI string/int
    values (MS-OLEPS layout: header, FMTID+offset, one section of
    (propid, offset) pairs with typed values)."""
    out: dict[str, str] = {}
    (n_sets,) = struct.unpack_from("<I", b, 24)
    if n_sets < 1:
        return out
    (sec_off,) = struct.unpack_from("<I", b, 44)
    _cb, n_props = struct.unpack_from("<II", b, sec_off)
    for i in range(min(n_props, 64)):
        pid, poff = struct.unpack_from("<II", b, sec_off + 8 + 8 * i)
        key = _PIDSI.get(pid)
        if key is None:
            continue
        vt = struct.unpack_from("<I", b, sec_off + poff)[0] & 0xFFFF
        vp = sec_off + poff + 4
        if vt == 0x1E:  # VT_LPSTR: int32 byte count incl. NUL
            (ln,) = struct.unpack_from("<I", b, vp)
            out[key] = b[vp + 4:vp + 4 + ln].split(b"\x00", 1)[0].decode(
                "latin-1")
        elif vt == 0x1F:  # VT_LPWSTR: int32 char count incl. NUL
            (ln,) = struct.unpack_from("<I", b, vp)
            out[key] = b[vp + 4:vp + 4 + 2 * ln].decode(
                "utf-16-le", "replace").split("\x00", 1)[0]
        elif vt in (2, 3, 0x13):  # VT_I2/I4/UI4
            out[key] = str(struct.unpack_from("<i", b, vp)[0])
    return out


def parse_ole(b: bytes) -> dict[str, str] | None:
    """OLE/CFB (MS-CFB layout): header → FAT (DIFAT) → directory-entry
    walk.  Root-storage CLSID types MSI/MSP/MST installers and the
    SummaryInformation stream (regular or mini-stream) yields the
    doc-property hints — the reference's olefile-based extraction
    (surfactant/infoextractors/ole_file.py:83-127) without the
    dependency.  Total: malformed structures degrade to the fields
    already decoded."""
    if len(b) < 512 or b[:8] != _CFB_MAGIC:
        return None
    out = {"format": "ole"}
    try:
        (ssz_shift,) = struct.unpack_from("<H", b, 30)
        (mini_shift,) = struct.unpack_from("<H", b, 32)
        ssz, msz = 1 << ssz_shift, 1 << mini_shift
        (first_dir,) = struct.unpack_from("<I", b, 48)
        (mini_cutoff,) = struct.unpack_from("<I", b, 56)
        (first_minifat,) = struct.unpack_from("<I", b, 60)
        difat = list(struct.unpack_from("<109I", b, 76))
        fat = b""
        for s in difat:
            if s in (_FREESECT, _ENDOFCHAIN):
                continue
            fat += b[(s + 1) * ssz:(s + 2) * ssz]

        def fat_next(sec: int) -> int:
            off = sec * 4
            if off + 4 > len(fat):
                return _ENDOFCHAIN
            return struct.unpack_from("<I", fat, off)[0]

        def chain(start: int, limit: int = 4096) -> bytes:
            data, sec, n = [], start, 0
            while sec not in (_ENDOFCHAIN, _FREESECT) and n < limit:
                data.append(b[(sec + 1) * ssz:(sec + 2) * ssz])
                sec = fat_next(sec)
                n += 1
            return b"".join(data)

        dirdata = chain(first_dir)
        entries = []
        for off in range(0, len(dirdata) - 127, 128):
            nlen, = struct.unpack_from("<H", dirdata, off + 64)
            etype = dirdata[off + 66]
            if etype == 0 or nlen < 2:
                continue
            name = dirdata[off:off + nlen - 2].decode("utf-16-le", "replace")
            clsid = dirdata[off + 80:off + 96]
            start, = struct.unpack_from("<I", dirdata, off + 116)
            size, = struct.unpack_from("<Q", dirdata, off + 120)
            entries.append((name, etype, clsid, start, size))
        root = next((e for e in entries if e[1] == 5), None)
        if root is not None:
            clsid = _cfb_clsid(root[2])
            out["clsid"] = clsid
            if clsid in _CLSID_TYPES:
                out["clsid_type"] = _CLSID_TYPES[clsid]
        summary = next((e for e in entries if e[0] == "\x05SummaryInformation"), None)
        if summary is not None:
            _, _, _, start, size = summary
            if size < mini_cutoff and root is not None:
                ministream = chain(root[3])[:root[4]]
                minifat = chain(first_minifat)
                data, sec, n = [], start, 0
                while sec not in (_ENDOFCHAIN, _FREESECT) and n < 4096:
                    data.append(ministream[sec * msz:(sec + 1) * msz])
                    off = sec * 4
                    sec = (struct.unpack_from("<I", minifat, off)[0]
                           if off + 4 <= len(minifat) else _ENDOFCHAIN)
                    n += 1
                stream = b"".join(data)[:size]
            else:
                stream = chain(start)[:size]
            out.update(_propset_strings(stream))
    except Exception:
        pass  # partial fields only (log-and-continue policy)
    return out


def parse_uimage(b: bytes) -> dict[str, str] | None:
    """U-Boot legacy image: 32-byte name at offset 32
    (uimage_file.py:236-239 name-hint source, confidence 40)."""
    if len(b) < 64 or b[:4] != b"\x27\x05\x19\x56":
        return None
    name = b[32:64].split(b"\x00", 1)[0].decode("ascii", errors="replace")
    (size,) = struct.unpack_from(">I", b, 12)
    return {"format": "uimage", "name": name, "data_size": str(size)}


_PARSERS = [parse_elf, parse_pe, parse_macho, parse_java_class,
            parse_rpm, parse_ole, parse_uimage, parse_aout]


def parse_binary_meta(b: bytes) -> dict[str, str] | None:
    """First parser whose magic matches — the firstresult hook-chain
    semantics (surfactant/plugin/hookspecs.py:17)."""
    for p in _PARSERS:
        out = p(b)
        if out is not None:
            return out
    return None
