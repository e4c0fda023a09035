""".NET (CLR) metadata extraction from raw PE bytes — the E2 depth the
reference gets from the dnfile library (surfactant/infoextractors/
pe_file.py:193-218: dotnetAssembly / dotnetAssemblyRef / dotnetImplMap).

Dependency-free parse of the public ECMA-335 (6th ed., §II.24-25)
physical metadata layout: CLI header → metadata root (BSJB) → stream
headers → `#~` compressed table stream.  Row sizes depend on heap-size
flags and coded-index widths, so TABLE_SCHEMA describes every table's
columns and sizes are computed from the actual row counts — exactly the
ECMA rules, nothing borrowed from any implementation.

Only the Assembly (0x20), AssemblyRef (0x23), ModuleRef (0x1A) and
ImplMap (0x1C) rows are *decoded*; the rest are only sized so the
stream walk can skip them.  All entry points are total: malformed
metadata returns None (the log-and-continue policy shared by
binmeta.py).
"""

from __future__ import annotations

import struct

# coded-index groups: name → (tag bits, member table ids; None = unused
# slot, counts as an empty table).  ECMA-335 §II.24.2.6.
_CODED = {
    "TypeDefOrRef": (2, [0x02, 0x01, 0x1B]),
    "HasConstant": (2, [0x04, 0x08, 0x17]),
    "HasCustomAttribute": (5, [0x06, 0x04, 0x01, 0x02, 0x08, 0x09, 0x0A,
                               0x00, 0x0E, 0x17, 0x14, 0x11, 0x1A, 0x1B,
                               0x20, 0x23, 0x26, 0x27, 0x28, 0x2A, 0x2C,
                               0x2B]),
    "HasFieldMarshall": (1, [0x04, 0x08]),
    "HasDeclSecurity": (2, [0x02, 0x06, 0x20]),
    "MemberRefParent": (3, [0x02, 0x01, 0x1A, 0x06, 0x1B]),
    "HasSemantics": (1, [0x14, 0x17]),
    "MethodDefOrRef": (1, [0x06, 0x0A]),
    "MemberForwarded": (1, [0x04, 0x06]),
    "Implementation": (2, [0x26, 0x23, 0x27]),
    "CustomAttributeType": (3, [None, None, 0x06, 0x0A, None]),
    "ResolutionScope": (2, [0x00, 0x1A, 0x23, 0x01]),
    "TypeOrMethodDef": (1, [0x02, 0x06]),
}

# column kinds: int = fixed byte width; "S"/"G"/"B" = string/guid/blob
# heap index; ("RI", t) = row index into table t; ("CI", g) = coded
# index of group g.  ECMA-335 §II.22 table definitions.
TABLE_SCHEMA: dict[int, list] = {
    0x00: [2, "S", "G", "G", "G"],                                  # Module
    0x01: [("CI", "ResolutionScope"), "S", "S"],                    # TypeRef
    0x02: [4, "S", "S", ("CI", "TypeDefOrRef"), ("RI", 0x04), ("RI", 0x06)],
    0x03: [("RI", 0x04)],                                           # FieldPtr
    0x04: [2, "S", "B"],                                            # Field
    0x05: [("RI", 0x06)],                                           # MethodPtr
    0x06: [4, 2, 2, "S", "B", ("RI", 0x08)],                        # MethodDef
    0x07: [("RI", 0x08)],                                           # ParamPtr
    0x08: [2, 2, "S"],                                              # Param
    0x09: [("RI", 0x02), ("CI", "TypeDefOrRef")],                   # InterfaceImpl
    0x0A: [("CI", "MemberRefParent"), "S", "B"],                    # MemberRef
    0x0B: [2, ("CI", "HasConstant"), "B"],                          # Constant
    0x0C: [("CI", "HasCustomAttribute"), ("CI", "CustomAttributeType"), "B"],
    0x0D: [("CI", "HasFieldMarshall"), "B"],                        # FieldMarshal
    0x0E: [2, ("CI", "HasDeclSecurity"), "B"],                      # DeclSecurity
    0x0F: [2, 4, ("RI", 0x02)],                                     # ClassLayout
    0x10: [4, ("RI", 0x04)],                                        # FieldLayout
    0x11: ["B"],                                                    # StandAloneSig
    0x12: [("RI", 0x02), ("RI", 0x14)],                             # EventMap
    0x13: [("RI", 0x14)],                                           # EventPtr
    0x14: [2, "S", ("CI", "TypeDefOrRef")],                         # Event
    0x15: [("RI", 0x02), ("RI", 0x17)],                             # PropertyMap
    0x16: [("RI", 0x17)],                                           # PropertyPtr
    0x17: [2, "S", "B"],                                            # Property
    0x18: [2, ("RI", 0x06), ("CI", "HasSemantics")],                # MethodSemantics
    0x19: [("RI", 0x02), ("CI", "MethodDefOrRef"), ("CI", "MethodDefOrRef")],
    0x1A: ["S"],                                                    # ModuleRef
    0x1B: ["B"],                                                    # TypeSpec
    0x1C: [2, ("CI", "MemberForwarded"), "S", ("RI", 0x1A)],        # ImplMap
    0x1D: [4, ("RI", 0x04)],                                        # FieldRVA
    0x1E: [4, 4],                                                   # ENCLog
    0x1F: [4],                                                      # ENCMap
    0x20: [4, 2, 2, 2, 2, 4, "B", "S", "S"],                        # Assembly
    0x21: [4],                                                      # AssemblyProcessor
    0x22: [4, 4, 4],                                                # AssemblyOS
    0x23: [2, 2, 2, 2, 4, "B", "S", "S", "B"],                      # AssemblyRef
    0x24: [4, ("RI", 0x23)],                                        # AssemblyRefProcessor
    0x25: [4, 4, 4, ("RI", 0x23)],                                  # AssemblyRefOS
    0x26: [4, "S", "B"],                                            # File
    0x27: [4, 4, "S", "S", ("CI", "Implementation")],               # ExportedType
    0x28: [4, 4, "S", ("CI", "Implementation")],                    # ManifestResource
    0x29: [("RI", 0x02), ("RI", 0x02)],                             # NestedClass
    0x2A: [2, 2, ("CI", "TypeOrMethodDef"), "S"],                   # GenericParam
    0x2B: [("CI", "MethodDefOrRef"), "B"],                          # MethodSpec
    0x2C: [("RI", 0x2A), ("CI", "TypeDefOrRef")],                   # GenericParamConstraint
}


def _col_size(col, rows: dict[int, int], heap: dict[str, int]) -> int:
    if isinstance(col, int):
        return col
    if col in ("S", "G", "B"):
        return heap[col]
    kind, arg = col
    if kind == "RI":
        return 4 if rows.get(arg, 0) > 0xFFFF else 2
    bits, members = _CODED[arg]
    mx = max(rows.get(t, 0) if t is not None else 0 for t in members)
    return 4 if mx >= (1 << (16 - bits)) else 2


def _read_col(b: bytes, off: int, size: int) -> tuple[int, int]:
    if size == 2:
        return struct.unpack_from("<H", b, off)[0], off + 2
    if size == 4:
        return struct.unpack_from("<I", b, off)[0], off + 4
    raise ValueError(size)


class _Tables:
    """Decoded `#~` stream: row counts, per-table byte offsets, and
    column readers for the tables this engine consumes."""

    def __init__(self, b: bytes, tbl_off: int, str_off: int, str_size: int):
        self.b = b
        self.str_off, self.str_size = str_off, str_size
        heapsizes = b[tbl_off + 6]
        (valid,) = struct.unpack_from("<Q", b, tbl_off + 8)
        p = tbl_off + 24
        self.rows: dict[int, int] = {}
        for t in range(64):
            if valid >> t & 1:
                (self.rows[t],) = struct.unpack_from("<I", b, p)
                p += 4
        self.heap = {
            "S": 4 if heapsizes & 0x01 else 2,
            "G": 4 if heapsizes & 0x02 else 2,
            "B": 4 if heapsizes & 0x04 else 2,
        }
        self.offsets: dict[int, int] = {}
        self.row_sizes: dict[int, int] = {}
        for t in sorted(self.rows):
            schema = TABLE_SCHEMA.get(t)
            if schema is None:
                raise ValueError(f"unknown metadata table 0x{t:02x}")
            size = sum(_col_size(c, self.rows, self.heap) for c in schema)
            self.offsets[t] = p
            self.row_sizes[t] = size
            p += size * self.rows[t]

    def string(self, idx: int) -> str:
        if idx == 0 or self.str_off is None or idx >= self.str_size:
            return ""
        p = self.str_off + idx
        end = self.b.find(b"\x00", p, self.str_off + self.str_size)
        return self.b[p:end].decode("utf-8", "replace") if end > p else ""

    def read_rows(self, t: int) -> list[list[int]]:
        """All rows of table t as raw column ints."""
        if t not in self.rows:
            return []
        schema = TABLE_SCHEMA[t]
        sizes = [_col_size(c, self.rows, self.heap) for c in schema]
        out = []
        p = self.offsets[t]
        for _ in range(self.rows[t]):
            row, q = [], p
            for s in sizes:
                v, q = _read_col(self.b, q, s)
                row.append(v)
            out.append(row)
            p += self.row_sizes[t]
        return out


def _version(major: int, minor: int, build: int, rev: int) -> str:
    return f"{major}.{minor}.{build}.{rev}"


def parse_dotnet_metadata(b: bytes, md_off: int) -> dict[str, str] | None:
    """Decode the metadata root at byte offset ``md_off``.

    Returns string-encoded fields (the binmeta dict[str,str] contract):
      assembly_name / assembly_culture / assembly_version,
      assembly_refs  = 'name<TAB>culture<TAB>version' per row, '\\n'-joined,
      implmap        = 'dllname<TAB>importname' per row, '\\n'-joined
                       (dllname resolved through ImportScope → ModuleRef,
                        the reference's insert_implmap_info shape,
                        pe_file.py:314-325).
    """
    if b[md_off:md_off + 4] != b"BSJB":
        return None
    (vlen,) = struct.unpack_from("<I", b, md_off + 12)
    p = md_off + 16 + ((vlen + 3) & ~3)
    (n_streams,) = struct.unpack_from("<H", b, p + 2)
    p += 4
    streams: dict[str, tuple[int, int]] = {}
    for _ in range(min(n_streams, 16)):
        off, size = struct.unpack_from("<II", b, p)
        name_end = b.find(b"\x00", p + 8)
        name = b[p + 8:name_end].decode("ascii", "replace")
        streams[name] = (md_off + off, size)
        p = name_end + 1
        p += (-(p - md_off)) % 4  # stream names pad to 4-byte boundary
    tbl = streams.get("#~") or streams.get("#-")
    if tbl is None:
        return None
    sheap = streams.get("#Strings")
    tables = _Tables(b, tbl[0], sheap[0] if sheap else None,
                     sheap[1] if sheap else 0)
    out: dict[str, str] = {}
    for row in tables.read_rows(0x20)[:1]:  # Assembly (0 or 1 row)
        out["assembly_name"] = tables.string(row[7])
        out["assembly_culture"] = tables.string(row[8])
        out["assembly_version"] = _version(row[1], row[2], row[3], row[4])
    refs = []
    for row in tables.read_rows(0x23):  # AssemblyRef
        refs.append("\t".join((
            tables.string(row[6]), tables.string(row[7]),
            _version(row[0], row[1], row[2], row[3]),
        )))
    if refs:
        out["assembly_refs"] = "\n".join(refs)
    modrefs = [tables.string(r[0]) for r in tables.read_rows(0x1A)]
    imps = []
    for row in tables.read_rows(0x1C):  # ImplMap
        scope = row[3]  # 1-based row index into ModuleRef
        dll = modrefs[scope - 1] if 1 <= scope <= len(modrefs) else ""
        imps.append(f"{dll}\t{tables.string(row[2])}")
    if imps:
        out["implmap"] = "\n".join(imps)
    return out


def dotnet_assembly_refs(meta: dict[str, str]) -> list[dict[str, str]]:
    """Decode ``assembly_refs`` back to the reference's
    dotnetAssemblyRef row shape ({Name, Culture, Version})."""
    out = []
    for line in meta.get("assembly_refs", "").split("\n"):
        if not line:
            continue
        name, culture, version = (line.split("\t") + ["", "", ""])[:3]
        out.append({"Name": name, "Culture": culture, "Version": version})
    return out


def dotnet_implmap(meta: dict[str, str]) -> list[dict[str, str]]:
    """Decode ``implmap`` to the reference's dotnetImplMap shape
    ({Name: dll, Function: import}) — one row per ImplMap entry."""
    out = []
    for line in meta.get("implmap", "").split("\n"):
        if not line:
            continue
        dll, fn = (line.split("\t") + [""])[:2]
        out.append({"Name": dll, "Function": fn})
    return out
