"""Deterministic synthetic Common-Crawl-style page corpus.

Every page is a pure function of its integer id, so the distributed
generator (sources/pages.py) and the single-process oracle
(oracle/pyoracle.py) produce byte-identical rows regardless of
partitioning.  Mirrors the fixture rules in FIXTURES.md §1:

* 3 langs (en/de/fr)
* controlled duplicates: ``pid % DUP_MOD == DUP_MOD-1`` reuses the html
  bytes of ``pid-1`` under a different url → exercises sha256
  dedup-merge (reference: surfactant/sbomtypes/_sbom.py:219-263)
* skewed host: ~30% of urls on one host → exercises salted joins
* skewed entity: one dictionary entity mentioned on ~30% of pages
* some rows gzip-compressed (reference decompression path:
  surfactant/infoextractors/file_decompression.py:163-192)
"""

from __future__ import annotations

import gzip
import hashlib
from dataclasses import dataclass
from datetime import datetime, timezone

SEED = 42
LANGS = ("en", "de", "fr")
HOT_HOST = "big.example.com"
DUP_MOD = 53
GZIP_MOD = 7

# filler vocabulary for body text
_FILLER = (
    "data web page graph engine table index scan shard batch stream "
    "query node edge link crawl parse token merge split cache store"
).split()

# (entity_key, mention phrase rendered into text). ENT0 is the hot entity.
MENTION_PHRASES = {
    "libalpha": ["libalpha v{v}", "alpha-lib", "alphalib"],
    "betajs": ["betajs/{v}", "beta.js"],
    "gammasql": ["gammasql {v}", "gamma-sql"],
    "deltadb": ["deltadb"],
    "epsilonml": ["epsilonml v{v}", "eps-ml"],
    "zetacache": ["zetacache"],
    "etaqueue": ["etaqueue", "eta-q"],
    "thetanet": ["thetanet {v}"],
}
ENTITY_KEYS = list(MENTION_PHRASES)
HOT_ENTITY = "libalpha"


def _h(*parts: object) -> int:
    """Stable 64-bit hash of parts (md5-based; never Python hash())."""
    raw = "|".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(raw).digest()[:8], "big")


@dataclass
class Page:
    pid: int
    url: str
    warc_ts: datetime
    html: bytes
    text: str
    lang: str


def page_host(pid: int) -> str:
    r = _h(SEED, "host", pid)
    if r % 10 < 3:
        return HOT_HOST
    return f"host{r % 50}.example.org"


def page_path(pid: int) -> str:
    r = _h(SEED, "path", pid)
    return f"/d{r % 7}/s{r % 13}/page{pid}.html"


def page_url(pid: int) -> str:
    return f"http://{page_host(pid)}{page_path(pid)}"


def page_lang(pid: int) -> str:
    return LANGS[_h(SEED, "lang", pid) % len(LANGS)]


def _version(pid: int, ent: str) -> str:
    r = _h(SEED, "ver", pid, ent)
    return f"{r % 4 + 1}.{r % 10}.{r % 20}"


def page_mentions_spec(pid: int) -> list[tuple[str, str]]:
    """(entity_key, phrase) pairs woven into this page's text."""
    out: list[tuple[str, str]] = []
    r = _h(SEED, "ment", pid)
    if r % 10 < 3:  # hot entity on ~30% of pages
        phrase = MENTION_PHRASES[HOT_ENTITY][r % 3]
        out.append((HOT_ENTITY, phrase.format(v=_version(pid, HOT_ENTITY))))
    n_extra = r % 3  # 0..2 additional entities
    for k in range(n_extra):
        ent = ENTITY_KEYS[1 + _h(SEED, "ment2", pid, k) % (len(ENTITY_KEYS) - 1)]
        variants = MENTION_PHRASES[ent]
        phrase = variants[_h(SEED, "ment3", pid, k) % len(variants)]
        out.append((ent, phrase.format(v=_version(pid, ent))))
    return out


def page_link_targets(pid: int, n_pages: int) -> list[int]:
    """pids this page links to (0..3 targets, deterministic)."""
    r = _h(SEED, "nlink", pid)
    n = r % 4
    out = []
    for k in range(n):
        t = _h(SEED, "link", pid, k) % n_pages
        if t != pid:
            out.append(t)
    return out


def href_for(src_pid: int, dst_pid: int, k: int) -> str:
    """Render the href for a link in one of 3 forms: absolute url,
    absolute path (same host only), or relative path — so resolution
    exercises the probe-path join semantics (reference:
    surfactant/relationships/elf_relationship.py:98-149)."""
    form = _h(SEED, "href", src_pid, dst_pid, k) % 3
    dst_url = page_url(dst_pid)
    dst_path = page_path(dst_pid)
    same_host = page_host(src_pid) == page_host(dst_pid)
    if form == 1 and same_host:
        return dst_path  # absolute path, host-relative
    if form == 2 and same_host:
        # relative path from src dir to dst path (always ../../ up then down)
        return "../.." + dst_path
    return dst_url  # absolute url


def _sentence(pid: int, j: int, body_scale: int = 1) -> str:
    r = _h(SEED, "sent", pid, j)
    n_words = (4 + r % 6) * min(body_scale, 4)
    # one md5 seeds 8 word picks — keeps generation cheap at scale
    words = []
    i = 0
    while len(words) < n_words:
        seed = _h(SEED, "w", pid, j, i)
        for k in range(8):
            words.append(_FILLER[(seed >> (k * 8)) % len(_FILLER)])
        i += 1
    return " ".join(words[:n_words])


def page_body_parts(pid: int, body_scale: int = 1) -> tuple[str, list[str]]:
    """(title, paragraphs) — the canonical text parts of a page.

    ``body_scale`` grows pages toward realistic web sizes (scale 1 ≈
    0.5 KB for fast unit tests; scale 8 ≈ 5-10 KB for benchmarks, the
    Common-Crawl-ish regime).  Mentions/links/dup/gzip rules are
    identical at every scale — only filler volume changes."""
    title = f"Page {pid} on {page_host(pid)}"
    paras = []
    mentions = page_mentions_spec(pid)
    n_paras = (2 + _h(SEED, "np", pid) % 3) * body_scale
    for j in range(n_paras):
        s = _sentence(pid, j, body_scale)
        # weave mention phrases into paragraphs round-robin
        for mi, (_ent, phrase) in enumerate(mentions):
            if mi % n_paras == j:
                s = s + " uses " + phrase + " today"
        paras.append(s)
    return title, paras


def canonical_text(title: str, paras: list[str]) -> str:
    """THE byte-identity contract: extracted text == title + paragraphs
    joined by newline.  (Analog of Surfactant's stable sorted output,
    surfactant/infoextractors/elf_file.py:172-173.)"""
    return "\n".join([title, *paras])


def render_html(pid: int, n_pages: int, body_scale: int = 1) -> bytes:
    title, paras = page_body_parts(pid, body_scale)
    links = [
        f'<a href="{href_for(pid, t, k)}">l{k}</a>'
        for k, t in enumerate(page_link_targets(pid, n_pages))
    ]
    body = "".join(f"<p>{p}</p>" for p in paras) + "".join(links)
    html = f"<html><head><title>{title}</title></head><body>{body}</body></html>"
    return html.encode("utf-8")


def make_page(pid: int, n_pages: int, body_scale: int = 1) -> Page:
    """Fully materialized page row (pure function of pid)."""
    src_pid = pid - 1 if (pid % DUP_MOD == DUP_MOD - 1 and pid > 0) else pid
    html = render_html(src_pid, n_pages, body_scale)
    title, paras = page_body_parts(src_pid, body_scale)
    text = canonical_text(title, paras)
    if pid % GZIP_MOD == 3:
        html = gzip.compress(html, mtime=0)
    ts = datetime.fromtimestamp(1700000000 + (_h(SEED, "ts", pid) % 10_000_000), tz=timezone.utc)
    return Page(
        pid=pid,
        url=page_url(pid),
        warc_ts=ts.replace(tzinfo=None),
        html=html,
        text=text,
        lang=page_lang(src_pid),
    )
