"""Offline pattern-DB ingest with content-hash freshness.

The reference refreshes its RetireJS/EMBA pattern databases by
downloading a feed, hashing the raw bytes, and skipping the re-parse +
re-save when the hash matches the recorded one
(surfactant/database_manager/database_utils.py:166-189); the parsed DB
is persisted as JSON and version metadata (hash + timestamp) alongside
(database_utils.py:136-160).  The sandbox has no network, so the feed
is a FILE — which is also the production shape on an air-gapped
cluster: a feed snapshot lands on shared storage, the ingest job turns
it into dictionary rows, and every downstream run reuses the parsed
rows until the feed bytes change.

Feed format: the RetireJS JSON dump shape
(https://github.com/RetireJS/retire.js repository.json, as parsed by
surfactant/infoextractors/js_file.py:54-97):

    { "<library>": { "extractors": {
        "filename":    ["<regex with §§version§§>", ...],
        "filecontent": ["<regex with §§version§§>", ...],
        "hashes":      ["<hex digest>", ...] } }, ... }

Row mapping:
* ``filecontent`` regexes → ``(library, "content", pattern)`` rows —
  the page-text mention patterns (compile_dictionary applies the
  §§version§§ rewrite, validation, and prefilter skip policy).
* ``filename`` regexes → ``(library, "filename", pattern)`` rows —
  matched against url basenames, not page text; kept as data for the
  filename matcher and excluded from text compilation.
* ``hashes`` → ``(library, "hash", digest)`` rows — exact
  content-digest identification (js_file.py:110-118's sha1-lookup
  analog): a broadcast join against content hashes, no regex at all.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import re
from dataclasses import dataclass

logger = logging.getLogger(__name__)

VERSION_PLACEHOLDER = "§§version§§"


@dataclass
class IngestResult:
    rows: list[tuple[str, str, str, str | None]]
    updated: bool  # False = feed hash unchanged, rows read from cache
    feed_hash: str
    n_libraries: int


def parse_retirejs(raw: str) -> dict[str, dict[str, list[str]]]:
    """RetireJS dump → {library: {filename/filecontent/hashes: [...]}}.
    Invalid JSON yields {}; invalid regexes are logged and skipped,
    never fatal (js_file.py:88-95).  The §§version§§ rewrite happens at
    dictionary-compile time, so patterns are validated here with the
    placeholder substituted the same way the compiler will."""
    try:
        db = json.loads(raw)
    except json.JSONDecodeError as err:
        logger.error("failed to parse pattern-DB JSON: %s", err)
        return {}
    if not isinstance(db, dict):
        logger.error("expected top-level JSON object for RetireJS data")
        return {}
    clean: dict[str, dict[str, list[str]]] = {}
    for library, lib_entry in db.items():
        extractors = (lib_entry or {}).get("extractors")
        if not isinstance(extractors, dict):
            continue
        clean[library] = {}
        for entry in ("filename", "filecontent", "hashes"):
            pats = extractors.get(entry)
            if not isinstance(pats, list):
                continue
            kept: list[str] = []
            for pat in pats:
                if entry == "hashes":
                    kept.append(str(pat).lower())
                    continue
                candidate = str(pat).replace(VERSION_PLACEHOLDER, r"\d+(?:\.\d+)*")
                try:
                    re.compile(candidate)
                    kept.append(str(pat))
                except re.error as rex:
                    logger.warning(
                        "skipping invalid %s regex for %s: %s (%s)",
                        entry, library, pat, rex,
                    )
            clean[library][entry] = kept
    return clean


def retirejs_to_rows(
    clean: dict[str, dict[str, list[str]]],
) -> list[tuple[str, str, str, str | None]]:
    """Parsed DB → dictionary rows, deterministic order (library name,
    then entry kind, then feed order)."""
    kind_map = {"filecontent": "content", "filename": "filename", "hashes": "hash"}
    rows: list[tuple[str, str, str, str | None]] = []
    for library in sorted(clean):
        for entry in ("filecontent", "filename", "hashes"):
            for pat in clean[library].get(entry, []):
                rows.append((library, kind_map[entry], pat, None))
    return rows


def text_rows(
    rows: list[tuple[str, str, str, str | None]],
) -> list[tuple[str, str, str, str | None]]:
    """The subset compile_dictionary consumes (content patterns);
    filename/hash rows feed their own matchers."""
    return [r for r in rows if r[1] in ("content", "name")]


def hash_rows(rows) -> list[tuple[str, str]]:
    """(digest, entity_key) pairs for the exact-hash identification join."""
    return [(r[2], r[0]) for r in rows if r[1] == "hash"]


def filename_rows(rows) -> list[tuple[str, str]]:
    """(library, pattern) pairs for the filename matcher, feed order
    preserved (first-match-wins depends on it)."""
    return [(r[0], r[2]) for r in rows if r[1] == "filename"]


def url_basename(url_col):
    """url → filename: query string / fragment stripped, last path
    segment.  Pure codegen expression (split + element_at), no UDF."""
    from pyspark.sql import functions as F

    return F.element_at(
        F.split(F.regexp_replace(url_col, r"[?#].*$", ""), "/"), -1
    )


def _compile_filename_patterns(
    pairs: list[tuple[str, str]],
) -> list[tuple[str, list[str]]]:
    """Driver-side compile: per library, the ordered pattern list with
    §§version§§ substituted; invalid regexes skipped with a warning.

    Zero-group patterns are dropped at compile time: the reference's
    match loop (js_file.py:140-149) only appends AND breaks when the
    regex defines ≥1 group — a zero-group match falls through to the
    next pattern, i.e. it is observationally a no-op."""
    ordered: dict[str, list[str]] = {}
    for library, pat in pairs:
        candidate = str(pat).replace(VERSION_PLACEHOLDER, r"\d+(?:\.\d+)*")
        try:
            rx = re.compile(candidate)
        except re.error as rex:
            logger.warning(
                "skipping invalid filename regex for %s: %s (%s)", library, pat, rex
            )
            continue
        if rx.groups == 0:
            continue
        ordered.setdefault(library, []).append(candidate)
    return sorted(ordered.items())


def identify_by_filename(urls, fname_pairs, url_col: str = "url"):
    """RetireJS ``filename`` identification
    (surfactant/infoextractors/js_file.py:112-125, 140-149):
    per library, the FIRST filename pattern that matches wins and
    yields version = group(1); later patterns of that library are
    skipped; libraries are independent (a filename can identify
    several libraries).  → (url, entity_key, version).

    Distributed shape: basenames are computed as a codegen expression,
    deduplicated (CDN corpora repeat the same asset names massively),
    matched once per DISTINCT basename in a vectorized pandas stage
    (``Series.str.contains`` + ``str.extract`` — C-speed per pattern,
    dictionary-sized pattern count), then equi-joined back to urls.
    No per-url regex work, no driver collect."""
    from pyspark.sql import functions as F

    lib_pats = _compile_filename_patterns(fname_pairs)
    with_f = urls.select(F.col(url_col).alias("url"),
                         url_basename(F.col(url_col)).alias("fname"))
    if not lib_pats:
        return with_f.select("url").limit(0).withColumn(
            "entity_key", F.lit(None).cast("string")
        ).withColumn("version", F.lit(None).cast("string"))
    names = with_f.select("fname").distinct()

    def match_batches(batches):
        import pandas as pd

        for pdf in batches:
            s = pdf["fname"].astype(str)
            outs = []
            for lib, pats in lib_pats:
                unmatched = pd.Series(True, index=s.index)
                ver = pd.Series([None] * len(s), index=s.index, dtype=object)
                got = pd.Series(False, index=s.index)
                for pat in pats:
                    if not unmatched.any():
                        break
                    sub = s[unmatched]
                    # one vectorized pass: an outer group captures the
                    # whole match (notna ⇔ matched), shifting the
                    # pattern's own group(1) to column 1
                    ext = sub.str.extract(f"({pat})")
                    hit = ext.iloc[:, 0].notna()
                    if not hit.any():
                        continue
                    idx = hit[hit].index
                    ver.loc[idx] = ext.iloc[:, 1].loc[idx]
                    got.loc[idx] = True
                    unmatched.loc[idx] = False
                if got.any():
                    outs.append(
                        pd.DataFrame(
                            {
                                "fname": s[got],
                                "entity_key": lib,
                                "version": ver[got].where(pd.notna(ver[got]), None),
                            }
                        )
                    )
            if outs:
                yield pd.concat(outs, ignore_index=True)
            else:
                yield pd.DataFrame(
                    {"fname": pd.Series(dtype=str),
                     "entity_key": pd.Series(dtype=str),
                     "version": pd.Series(dtype=object)}
                )

    matched = names.mapInPandas(
        match_batches, "fname string, entity_key string, version string"
    )
    return with_f.join(matched, "fname").select("url", "entity_key", "version")


def identify_with_filename_precedence(
    pages, filename_ids, content_ids, url_col: str = "url"
):
    """Filename-first precedence (js_file.py:112-133): a file whose
    NAME matched any library takes its identifications from the
    filename matcher alone; content identifications apply only to
    files with zero filename matches — expressed as a left-anti join
    on url (the per-file "if len(libs) > 0: return" early-exit).

    ``pages``: (url, content_sha256).  ``filename_ids``: (url,
    entity_key, version).  ``content_ids``: (content_sha256,
    entity_key, version) — keyed per unique content, the engine's
    detect-once-per-hash shape.  → (url, entity_key, version,
    matched_via)."""
    from pyspark.sql import functions as F

    f = filename_ids.select(
        F.col("url"), "entity_key", "version",
        F.lit("filename").alias("matched_via"),
    )
    urls_with_f = filename_ids.select("url").distinct()
    c = (
        pages.select(F.col(url_col).alias("url"), "content_sha256")
        .join(urls_with_f, "url", "left_anti")
        .join(content_ids, "content_sha256")
        .select("url", "entity_key", "version",
                F.lit("content").alias("matched_via"))
    )
    return f.unionByName(c)


def parse_emba_cfg(raw: str) -> dict[str, dict[str, list[str]]]:
    """EMBA native-lib cfg → {library: {filename/filecontent: [...]}}
    (surfactant/infoextractors/native_lib_file.py:56-104).

    Line format: ``lib;mode;_;filecontent;...`` with ``#`` comment
    lines skipped.  mode ``strict`` registers the library NAME itself
    as a filename literal (matched by containment, the reference's
    Aho-Corasick automaton over filename patterns); mode ``""``
    registers the filecontent regex (validated, invalid skipped); any
    other mode is ignored.  The reference's quote stripping is
    preserved exactly: ``"x""`` → ``x"``, ``x""`` → ``x"``, else
    ``strip('"')``.  Malformed lines (fewer than 4 fields) are skipped
    with a warning instead of the reference's IndexError."""
    database: dict[str, dict[str, list[str]]] = {}
    for line in raw.splitlines():
        if line.startswith("#"):
            continue
        line = line.strip()
        if not line:
            continue
        fields = line.split(";")
        if len(fields) < 4:
            logger.warning("skipping malformed EMBA cfg line: %r", line[:80])
            continue
        lib_name, mode = fields[0], fields[1]
        if fields[3].startswith('"') and fields[3].endswith('""'):
            filecontent = fields[3][1:-1]
        elif fields[3].endswith('""'):
            filecontent = fields[3][:-1]
        else:
            filecontent = fields[3].strip('"')
        if mode == "strict":
            entry = database.setdefault(
                lib_name, {"filename": [], "filecontent": []}
            )
            if lib_name not in entry["filename"]:
                entry["filename"].append(lib_name)
        elif mode == "":
            try:
                re.compile(filecontent)
            except re.error as rex:
                logger.error(
                    "error parsing EMBA filecontent regexp %s: %s", filecontent, rex
                )
                continue
            entry = database.setdefault(
                lib_name, {"filename": [], "filecontent": []}
            )
            entry["filecontent"].append(filecontent)
    return database


def emba_to_rows(
    clean: dict[str, dict[str, list[str]]],
) -> list[tuple[str, str, str, str | None]]:
    """Parsed EMBA DB → dictionary rows.  ``filename`` entries are
    LITERALS (containment match), not regexes — they get their own
    ``filename_literal`` kind so the RetireJS regex filename matcher
    never consumes them."""
    rows: list[tuple[str, str, str, str | None]] = []
    for library in sorted(clean):
        for lit in clean[library].get("filename", []):
            rows.append((library, "filename_literal", lit, None))
        for pat in clean[library].get("filecontent", []):
            rows.append((library, "content", pat, None))
    return rows


def filename_literal_rows(rows) -> list[tuple[str, str]]:
    """(library, literal) pairs for the containment filename matcher."""
    return [(r[0], r[2]) for r in rows if r[1] == "filename_literal"]


def identify_by_filename_literal(urls, literal_pairs, url_col: str = "url"):
    """EMBA strict-mode filename identification: library literals
    matched by CONTAINMENT in the url basename — the reference's
    Aho-Corasick automaton over filename patterns
    (native_lib_file.py:105-131, utils/ahocorasick.py) → (url,
    entity_key).  One automaton built driver-side, one scan per
    DISTINCT basename, equi-join back to urls."""
    from pyspark.sql import functions as F

    lits = sorted({(lib, lit) for lib, lit in literal_pairs if lit})
    with_f = urls.select(F.col(url_col).alias("url"),
                         url_basename(F.col(url_col)).alias("fname"))
    if not lits:
        return with_f.select("url").limit(0).withColumn(
            "entity_key", F.lit(None).cast("string")
        )
    from .functions.ahocorasick import AhoCorasick

    ac = AhoCorasick([lit for _lib, lit in lits])
    id_to_lib = [lib for lib, _lit in lits]
    names = with_f.select("fname").distinct()

    def match_batches(batches):
        import pandas as pd

        for pdf in batches:
            out_f, out_k = [], []
            for fname in pdf["fname"].astype(str):
                for pid in sorted(ac.search_ids(fname)):
                    out_f.append(fname)
                    out_k.append(id_to_lib[pid])
            yield pd.DataFrame({"fname": pd.Series(out_f, dtype=str),
                                "entity_key": pd.Series(out_k, dtype=str)})

    matched = names.mapInPandas(match_batches, "fname string, entity_key string")
    return (
        with_f.join(matched, "fname")
        .select("url", "entity_key")
        .dropDuplicates(["url", "entity_key"])
    )


def ingest_pattern_db(
    feed_path: str, state_dir: str, force: bool = False, fmt: str = "retirejs"
) -> IngestResult:
    """Parse ``feed_path`` into dictionary rows, skipping the re-parse
    when the feed's content hash matches the recorded one — the
    download_and_update_database freshness contract
    (database_utils.py:166-189) minus the network fetch.

    ``fmt``: ``"retirejs"`` (JSON dump) or ``"emba"`` (the
    ``;``-separated native-lib cfg, native_lib_file.py:56-104) — the
    two feed families the reference's database managers handle.

    ``state_dir`` holds ``rows.json`` (the parsed DB, the reference's
    save_database analog) and ``version.json`` ({hash}); both are
    rewritten only on change."""
    if fmt not in ("retirejs", "emba"):
        raise ValueError(f"unknown pattern-DB format: {fmt!r}")
    with open(feed_path, "rb") as f:
        raw = f.read()
    feed_hash = hashlib.sha256(raw).hexdigest()
    meta_path = os.path.join(state_dir, "version.json")
    rows_path = os.path.join(state_dir, "rows.json")
    if not force and os.path.exists(meta_path) and os.path.exists(rows_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("hash") == feed_hash:
            with open(rows_path) as f:
                cached = json.load(f)
            rows = [tuple(r) for r in cached["rows"]]
            return IngestResult(rows, False, feed_hash, cached["n_libraries"])
    text = raw.decode("utf-8", "replace")
    if fmt == "retirejs":
        clean = parse_retirejs(text)
        rows = retirejs_to_rows(clean)
    else:
        clean = parse_emba_cfg(text)
        rows = emba_to_rows(clean)
    os.makedirs(state_dir, exist_ok=True)
    with open(rows_path, "w") as f:
        json.dump({"rows": rows, "n_libraries": len(clean)}, f)
    with open(meta_path, "w") as f:
        json.dump({"hash": feed_hash, "key": fmt}, f)
    return IngestResult(rows, True, feed_hash, len(clean))


def identify_by_hash(content_hashes, hash_pairs):
    """Exact-digest identification: content rows whose hash appears in
    the pattern DB's ``hashes`` list → (content hash, entity_key) —
    the js_file.py sha1-lookup as a broadcast equi-join (the DB side is
    dictionary-sized; the corpus side never shuffles).

    ``content_hashes``: DataFrame with a ``content_sha256`` column (or
    any single hash column named there).  ``hash_pairs``: list of
    (digest, entity_key)."""
    from pyspark.sql import functions as F

    spark = content_hashes.sparkSession
    if not hash_pairs:
        return (
            content_hashes.select("content_sha256")
            .limit(0)
            .withColumn("entity_key", F.lit(None).cast("string"))
        )
    db = spark.createDataFrame(
        [(d.lower(), k) for d, k in hash_pairs], "digest string, entity_key string"
    )
    return (
        content_hashes.select(F.lower(F.col("content_sha256")).alias("digest"))
        .join(F.broadcast(db), "digest")
        .select(F.col("digest").alias("content_sha256"), "entity_key")
        .distinct()
    )
