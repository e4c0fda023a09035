"""File/format identification: magic bytes, extension map, shebang.

The F1/F2 analogs (surfactant/filetypeid/id_magic.py:53-256 — ~20
container/binary formats, first-match-wins; id_extension.py:15-64 —
suffix map + interpreter sniff).  Magic constants are public format
signatures.  Two implementations of the same table:

* ``sniff_format`` — pure Python, used inside Arrow UDF batches and by
  the oracle;
* ``format_expr`` — a whole-stage-codegen ``when`` chain over binary
  ``substring`` comparisons, for classifying blob columns without
  leaving the JVM.

Match order is most-specific-first (e.g. RIFF+WEBP before bare RIFF),
mirroring the reference's tryfirst/firstresult hook chain
(surfactant/plugin/hookspecs.py:17).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tag → list of (offset, bytes) conditions that must ALL match
MAGIC_TABLE: list[tuple[str, list[tuple[int, bytes]]]] = [
    ("elf", [(0, b"\x7fELF")]),
    ("macho32", [(0, b"\xfe\xed\xfa\xce")]),
    ("macho64", [(0, b"\xfe\xed\xfa\xcf")]),
    ("macho32_rev", [(0, b"\xce\xfa\xed\xfe")]),
    ("macho64_rev", [(0, b"\xcf\xfa\xed\xfe")]),
    # 0xCAFEBABE is both fat Mach-O and Java class; the reference
    # disambiguates by arch-count plausibility — tagged jointly here
    ("macho_fat_or_class", [(0, b"\xca\xfe\xba\xbe")]),
    ("ole", [(0, b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1")]),
    ("pdf", [(0, b"%PDF")]),
    ("webp", [(0, b"RIFF"), (8, b"WEBP")]),
    ("wav", [(0, b"RIFF"), (8, b"WAVE")]),
    ("avi", [(0, b"RIFF"), (8, b"AVI ")]),
    ("riff", [(0, b"RIFF")]),
    ("png", [(0, b"\x89PNG")]),
    ("jpeg", [(0, b"\xff\xd8\xff")]),
    ("gif", [(0, b"GIF8")]),
    ("mp3_id3", [(0, b"ID3")]),
    ("mp4", [(4, b"ftyp")]),
    ("zip", [(0, b"PK\x03\x04")]),
    ("zip_empty", [(0, b"PK\x05\x06")]),
    ("gzip", [(0, b"\x1f\x8b")]),
    ("bzip2", [(0, b"BZh")]),
    ("xz", [(0, b"\xfd7zXZ\x00")]),
    ("zstd", [(0, b"\x28\xb5\x2f\xfd")]),
    ("sevenzip", [(0, b"7z\xbc\xaf\x27\x1c")]),
    ("rar", [(0, b"Rar!\x1a\x07")]),
    ("rpm", [(0, b"\xed\xab\xee\xdb")]),
    ("squashfs", [(0, b"hsqs")]),
    ("uimage", [(0, b"\x27\x05\x19\x56")]),
    ("tar", [(257, b"ustar")]),
    # PE's bare "MZ" is the weakest signature → matched last
    ("pe", [(0, b"MZ")]),
]

# tag → coarse media/container kind (the multimodal dispatch key)
KIND_OF = {
    "png": "image", "jpeg": "image", "gif": "image", "webp": "image",
    "wav": "audio", "mp3_id3": "audio", "riff": "audio",
    "avi": "video", "mp4": "video",
    "zip": "archive", "zip_empty": "archive", "gzip": "archive",
    "bzip2": "archive", "xz": "archive", "zstd": "archive",
    "sevenzip": "archive", "rar": "archive", "tar": "archive",
    "squashfs": "archive",
    "rpm": "package",
    "pdf": "document", "ole": "document",
    "elf": "binary", "pe": "binary", "macho32": "binary",
    "macho64": "binary", "macho32_rev": "binary", "macho64_rev": "binary",
    "macho_fat_or_class": "binary", "uimage": "binary",
}


def sniff_format(content: bytes) -> str:
    """First matching MAGIC_TABLE tag, else 'unknown'."""
    for tag, conds in MAGIC_TABLE:
        if all(content[off:off + len(m)] == m for off, m in conds):
            return tag
    return "unknown"


def format_expr(content_col: str = "content") -> Column:
    """The same table as a codegen ``when`` chain on binary substrings
    (1-based offsets), no Python in the scan."""
    c = F.col(content_col)
    expr = F.lit("unknown")
    for tag, conds in reversed(MAGIC_TABLE):
        cond = None
        for off, m in conds:
            eq = F.substring(c, off + 1, len(m)) == F.lit(bytearray(m))
            cond = eq if cond is None else cond & eq
        expr = F.when(cond, F.lit(tag)).otherwise(expr)
    return expr


def classify_format(df: DataFrame, content_col: str = "content") -> DataFrame:
    return df.withColumn("format", format_expr(content_col))


# ---------------------------------------------------------------------------
# Extension / shebang typing (F2, surfactant/filetypeid/id_extension.py:15-64)
# ---------------------------------------------------------------------------

EXT_MAP: dict[str, str] = {
    ".html": "html", ".htm": "html", ".xhtml": "html",
    ".js": "javascript", ".mjs": "javascript",
    ".css": "css", ".json": "json", ".xml": "xml",
    ".txt": "text", ".md": "text", ".csv": "tabular",
    ".pdf": "pdf",
    ".png": "image", ".jpg": "image", ".jpeg": "image",
    ".gif": "image", ".webp": "image", ".svg": "image",
    ".mp3": "audio", ".wav": "audio", ".mp4": "video", ".avi": "video",
    ".zip": "archive", ".gz": "archive", ".tgz": "archive",
    ".bz2": "archive", ".xz": "archive", ".rar": "archive", ".7z": "archive",
    ".so": "binary", ".dll": "binary", ".exe": "binary", ".dylib": "binary",
    ".py": "script", ".sh": "script", ".pl": "script", ".rb": "script",
}

_EXT_ORDER = sorted(EXT_MAP, key=len, reverse=True)  # longest suffix wins


def ext_type(name: str) -> str:
    low = name.lower().split("?", 1)[0].split("#", 1)[0]
    for ext in _EXT_ORDER:
        if low.endswith(ext):
            return EXT_MAP[ext]
    return "unknown"


def ext_type_expr(name_col: str | Column) -> Column:
    """Suffix map as a codegen when-chain (longest suffix first); query
    string / fragment stripped like ext_type.  Accepts a column name or
    a computed Column."""
    col = F.col(name_col) if isinstance(name_col, str) else name_col
    low = F.lower(F.regexp_replace(col, r"[?#].*$", ""))
    expr = F.lit("unknown")
    for ext in reversed(_EXT_ORDER):
        expr = F.when(low.endswith(ext), F.lit(EXT_MAP[ext])).otherwise(expr)
    return expr


_INTEL_LINE = r":[0-9A-Fa-f]{10,}"
_SREC_LINE = r"S[0-9][0-9A-Fa-f]{8,}"


def hexline_vote(text: str, max_lines: int = 100) -> str | None:
    """F3 line-vote classifier (surfactant/filetypeid/id_hex.py:72-97):
    inspect at most ``max_lines`` lines, count well-formed Intel-HEX
    (':' + hex) vs Motorola S-record ('S<digit>' + hex) lines, majority
    wins (ties → intelhex, matching >= semantics); None when neither
    format appears."""
    import re

    intel = srec = 0
    for line in text.splitlines()[:max_lines]:
        if re.fullmatch(_INTEL_LINE, line):
            intel += 1
        elif re.fullmatch(_SREC_LINE, line):
            srec += 1
    if intel == 0 and srec == 0:
        return None
    return "intelhex" if intel >= srec else "srec"


def hexline_vote_expr(text_col: str | Column, max_lines: int = 100) -> Column:
    """Column version: per-row line counts via split + filter + rlike —
    a scalar vote with no shuffle, exactly the Spark mapping SURVEY §2.2
    F3 calls for."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    lines = F.slice(F.split(col, "\n"), 1, max_lines)
    intel = F.size(F.filter(lines, lambda x: x.rlike(f"^{_INTEL_LINE}$")))
    srec = F.size(
        F.filter(
            lines,
            lambda x: x.rlike(f"^{_SREC_LINE}$") & ~x.rlike(f"^{_INTEL_LINE}$"),
        )
    )
    return (
        F.when((intel == 0) & (srec == 0), F.lit(None).cast("string"))
        .when(intel >= srec, F.lit("intelhex"))
        .otherwise(F.lit("srec"))
    )


_UUID4_RX = (
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-4[0-9a-fA-F]{3}"
    "-[89abAB][0-9a-fA-F]{3}-[0-9a-fA-F]{12}$"
)


def is_valid_uuid4(s: str) -> bool:
    """§2.7 uuid4 validity (surfactant/sbomtypes/_sbom.py:553-566):
    version nibble 4, variant nibble in [89ab]."""
    import re

    return re.fullmatch(_UUID4_RX[1:-1], s or "") is not None


def uuid4_valid_expr(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(_UUID4_RX)


def shebang_interp(text: str) -> str | None:
    """Interpreter basename from a '#!' first line, else None — the
    id_extension.py interpreter sniff.  Handles '/usr/bin/env python3'."""
    if not text.startswith("#!"):
        return None
    line = text[2:].splitlines()[0].strip() if len(text) > 2 else ""
    if not line:
        return None
    parts = line.split()
    interp = parts[0].rsplit("/", 1)[-1]
    if interp == "env" and len(parts) > 1:
        interp = parts[1].rsplit("/", 1)[-1]
    return interp or None


def shebang_expr(text_col: str) -> Column:
    """Column version: interpreter basename or NULL.  env-indirection
    resolved like shebang_interp."""
    first = F.regexp_extract(F.col(text_col), r"^#!([^\n]*)", 1)
    tok1 = F.regexp_extract(F.trim(first), r"^(\S+)", 1)
    base1 = F.element_at(F.split(tok1, "/"), -1)
    tok2 = F.regexp_extract(F.trim(first), r"^\S+\s+(\S+)", 1)
    base2 = F.element_at(F.split(tok2, "/"), -1)
    resolved = F.when((base1 == "env") & (base2 != ""), base2).otherwise(base1)
    return F.when(
        F.col(text_col).startswith("#!") & (resolved != ""), resolved
    ).otherwise(F.lit(None).cast("string"))
