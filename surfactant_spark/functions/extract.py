"""Pure-Python extraction core, shared by the Arrow UDFs and the oracle.

Keeping these as dependency-free pure functions is what makes the
"byte-identical extracted text per url" invariant testable: the Spark
pipeline and the single-process oracle import the *same* code, and the
pages fixture stores the expected text for direct comparison.

HTML→text contract: ``<title>`` content plus each ``<p>`` content,
joined by ``"\\n"``.  (Analog of Surfactant's deterministic sorted
extraction output, surfactant/infoextractors/elf_file.py:172-173.)
"""

from __future__ import annotations

import gzip
import re

_RX_TITLE = re.compile(r"<title>(.*?)</title>", re.DOTALL)
_RX_PARA = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_RX_HREF = re.compile(r'<a href="([^"]+)"')
_RX_TAG = re.compile(r"<[^>]+>")
_RX_URL = re.compile(r"^(https?)://([^/?#]+)([^?#]*)(?:\?[^#]*)?(?:#.*)?$")

GZIP_MAGIC = b"\x1f\x8b"


def maybe_gunzip(b: bytes) -> bytes:
    """Transparent gzip decode by magic bytes (reference decompression
    path: surfactant/infoextractors/file_decompression.py:163-192,
    magic-byte identification: surfactant/filetypeid/id_magic.py:53-256).

    Corrupt gzip falls back to the raw bytes: a single bad page must
    never fail a 10^12-row partition (the reference likewise logs and
    continues on unreadable archives, file_decompression.py:158-161)."""
    if b[:2] == GZIP_MAGIC:
        try:
            return gzip.decompress(b)
        except (OSError, EOFError):
            return b
    return b


def html_to_text(html: str) -> str:
    """Extract canonical text: title + paragraph bodies, newline-joined.

    Residual tags inside captured spans are stripped so the function is
    total on arbitrary html, but on the synthetic corpus the capture is
    exact by construction."""
    parts = []
    m = _RX_TITLE.search(html)
    if m:
        parts.append(_RX_TAG.sub("", m.group(1)))
    for pm in _RX_PARA.finditer(html):
        parts.append(_RX_TAG.sub("", pm.group(1)))
    return "\n".join(parts)


def extract_hrefs(html: str) -> list[str]:
    return _RX_HREF.findall(html)


def posix_normpath(path: str) -> str:
    """POSIX path normalization that also drops leading ``..`` segments
    for absolute paths — byte-compatible analog of the reference's
    normalizer (surfactant/relationships/_internal/posix_utils.py:9-31)."""
    absolute = path.startswith("/")
    out: list[str] = []
    for seg in path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if out:
                out.pop()
            elif not absolute:
                # relative paths keep no leading '..' (reference strips them)
                continue
            continue
        out.append(seg)
    return ("/" if absolute else "") + "/".join(out)


def split_url(url: str) -> tuple[str, str, str] | None:
    """(scheme, host, path) or None if not an absolute http(s) url.
    Query string and fragment are dropped (they never change which
    page/document the url denotes for linking purposes)."""
    m = _RX_URL.match(url)
    if not m:
        return None
    return m.group(1), m.group(2), m.group(3) or "/"


def url_host(url: str) -> str | None:
    p = split_url(url)
    return p[1] if p else None


def resolve_href(src_url: str, href: str) -> str | None:
    """Resolve an href against its source page url → canonical absolute
    http(s) url, or None for non-page schemes.

    Full form coverage, mirroring the reference's candidate-path
    branching for ELF deps (absolute / install-path-relative /
    search-path with ``$ORIGIN``/``$LIB`` token substitution and
    ``$PLATFORM`` drop — surfactant/relationships/elf_relationship.py:98-149,
    307-396; the unresolvable-token drop maps to the non-http-scheme
    drop here):

      * absolute url ``http(s)://host/path``  → normalized as-is
      * protocol-relative ``//host/path``     → inherits the SOURCE
        page's scheme, NOT its host (RFC 3986 network-path reference;
        round-1 mis-resolved this as a same-host path)
      * absolute path ``/path``               → same scheme+host
      * relative path                         → against the source
        page's directory; ``..`` above root clamps at root
      * query string                          → stripped (canonical
        page identity; consistent with split_url)
      * fragment ``#…``                       → stripped; a pure
        fragment href ("#top", "") resolves to the source page itself
      * non-http schemes (mailto:, javascript:, data:, ftp:)  → None
    """
    # fragment never names a different resource
    href = href.split("#", 1)[0]
    if href.startswith(("http://", "https://")):
        # absolute url: resolvable even when the SOURCE url is junk
        p = split_url(href)
        if p is None:
            return None
        h_scheme, h_host, h_path = p
        return f"{h_scheme}://{h_host}{posix_normpath(h_path)}"
    src = split_url(src_url)
    if src is None:
        return None
    scheme, host, src_path = src
    if href == "":
        return f"{scheme}://{host}{posix_normpath(src_path)}"
    if href.startswith("//"):
        # network-path reference: scheme from source, host from href
        rest = href[2:].split("?", 1)[0]
        h_host, _, h_path = rest.partition("/")
        if not h_host:
            return None
        return f"{scheme}://{h_host}{posix_normpath('/' + h_path)}"
    # non-http schemes (mailto:, javascript:, ftp:, data:) are not pages
    head = href.split("/", 1)[0]
    if ":" in head:
        return None
    href = href.split("?", 1)[0]
    if href == "":
        return f"{scheme}://{host}{posix_normpath(src_path)}"
    if href.startswith("/"):
        return f"{scheme}://{host}{posix_normpath(href)}"
    base_dir = src_path.rsplit("/", 1)[0]
    return f"{scheme}://{host}{posix_normpath(base_dir + '/' + href)}"


def url_template(col):
    """Collapse volatile URL segments into a template: long hex runs
    (ids, hashes) → 'H', then digit runs → 'N' — so
    ``/product/12345?v=9`` and ``/product/99887?v=2`` share one
    template.  URL-structure mining (which page *types* dominate a
    host, which templates to crawl or skip) over billions of URLs is
    a groupBy on this pure codegen expression.  The same two
    regexp_replace steps replay in any engine (DuckDB needs the 'g'
    flag; Spark's regexp_replace is global by default)."""
    from pyspark.sql import functions as F  # keep module pure-Python

    return F.regexp_replace(
        F.regexp_replace(col, "[0-9a-f]{8,}", "H"), "[0-9]+", "N"
    )
