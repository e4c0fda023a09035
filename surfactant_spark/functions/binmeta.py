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


def parse_elf(b: bytes) -> dict[str, str] | None:
    """ELF ident + e_type/e_machine (elf_file.py:56-195 core fields)."""
    if len(b) < 20 or b[:4] != b"\x7fELF":
        return None
    ei_class = {1: "elf32", 2: "elf64"}.get(b[4])
    ei_data = {1: "lsb", 2: "msb"}.get(b[5])
    if ei_class is None or ei_data is None:
        return None
    endian = "<" if ei_data == "lsb" else ">"
    e_type, e_machine = struct.unpack_from(endian + "HH", b, 16)
    return {
        "format": "elf",
        "class": ei_class,
        "endian": ei_data,
        "type": ELF_TYPES.get(e_type, f"unknown({e_type})"),
        "machine": ELF_MACHINES.get(e_machine, f"unknown({e_machine})"),
    }


def parse_pe(b: bytes) -> dict[str, str] | None:
    """MZ → e_lfanew → 'PE\\0\\0' → COFF machine/characteristics
    (pe_file.py:116-232 core fields; is_dll from IMAGE_FILE_DLL)."""
    if len(b) < 0x40 or b[:2] != b"MZ":
        return None
    (e_lfanew,) = struct.unpack_from("<I", b, 0x3C)
    if e_lfanew + 24 > len(b) or b[e_lfanew:e_lfanew + 4] != b"PE\x00\x00":
        return None
    machine, n_sections, _ts = struct.unpack_from("<HHI", b, e_lfanew + 4)
    (characteristics,) = struct.unpack_from("<H", b, e_lfanew + 22)
    return {
        "format": "pe",
        "machine": PE_MACHINES.get(machine, f"unknown({machine})"),
        "n_sections": str(n_sections),
        "is_dll": str(bool(characteristics & PE_DLL_FLAG)).lower(),
    }


def parse_macho(b: bytes) -> dict[str, str] | None:
    """Mach-O header: cputype + filetype (mach_o_file.py:60-185 core)."""
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
    return {
        "format": "macho",
        "bits": "64" if is64 else "32",
        "cputype": MACHO_CPUTYPES.get(cputype, f"unknown({cputype})"),
        "filetype": MACHO_FILETYPES.get(filetype, f"unknown({filetype})"),
    }


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


def parse_uimage(b: bytes) -> dict[str, str] | None:
    """U-Boot legacy image: 32-byte name at offset 32
    (uimage_file.py:236-239 name-hint source, confidence 40)."""
    if len(b) < 64 or b[:4] != b"\x27\x05\x19\x56":
        return None
    name = b[32:64].split(b"\x00", 1)[0].decode("ascii", errors="replace")
    (size,) = struct.unpack_from(">I", b, 12)
    return {"format": "uimage", "name": name, "data_size": str(size)}


_PARSERS = [parse_elf, parse_pe, parse_macho, parse_java_class,
            parse_rpm_lead, parse_uimage]


def parse_binary_meta(b: bytes) -> dict[str, str] | None:
    """First parser whose magic matches — the firstresult hook-chain
    semantics (surfactant/plugin/hookspecs.py:17)."""
    for p in _PARSERS:
        out = p(b)
        if out is not None:
            return out
    return None
