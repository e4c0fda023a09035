"""Structured-data extraction: JSON-LD (schema.org) blocks → KG triples.

Web pages carry machine-readable entity descriptions in
``<script type="application/ld+json">`` blocks; flattening them into
(subject, predicate, object) triples is the highest-precision KG
construction signal webtext offers — no NLP, the publisher asserted
the facts.  This is the webtext analog of the reference's typed
info-extractor family (surfactant/infoextractors/*.py: parse a
structured payload found inside a scanned artifact into relationship
rows); see e.g. js_file.py's pattern-DB flow for the same
extract-then-join shape.

Scale design:

* Block extraction is a pure codegen expression
  (``regexp_extract_all`` + ``posexplode``) — no Python touches the
  HTML column.
* JSON flattening runs once per DISTINCT block content (webtext is
  template-heavy: the same product JSON appears on every variant
  page), via one Arrow ``mapInPandas`` stage over the deduplicated
  blocks, then an equi-join back on the block hash.  The flattener
  emits *url-relative* node ids so one flatten serves every page
  carrying the block.
* Subject/object id materialization (url#bN/path) happens JVM-side
  after the join.

Node identity: a JSON object's ``@id`` (when a string) is used
verbatim (absolute); otherwise the node gets a deterministic blank id
``<url>#b<block_idx><json_path>`` — both engines can reconstruct it.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (?s): blocks span lines.  Attribute order varies in the wild; accept
# any attributes around type="application/ld+json" in either quote
# style.  Non-greedy body up to the first closing </script>.
_LDJSON_RE = (
    r'(?si)<script[^>]*type\s*=\s*["\']application/ld\+json["\'][^>]*>'
    r"(.*?)</script>"
)

_FLAT_SCHEMA = (
    "jhash string, subj string, subj_abs boolean, "
    "pred string, obj string, obj_kind string"
)


def _scalar_repr(v) -> str | None:
    """JSON scalar → literal string (None for JSON null: no triple)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        if isinstance(v, float) and v.is_integer():
            return str(int(v))
        return str(v)
    return str(v)


def flatten_jsonld(jstr: str) -> list[tuple[str, bool, str, str, str]]:
    """One JSON-LD block → [(subj, subj_abs, pred, obj, obj_kind)].

    ``subj``/``obj`` are either absolute ids (``@id`` strings,
    *_abs=True / obj_kind='abs') or url-relative path suffixes
    (obj_kind='rel') to be prefixed with ``<url>#b<idx>`` by the
    caller; literals use obj_kind='lit'.  A top-level array is
    treated as multiple root nodes (path ``/<i>``).  Malformed JSON
    yields no triples (web-scale tolerance; the page row survives).
    """
    try:
        root = json.loads(jstr)
    except (ValueError, RecursionError):
        return []
    out: list[tuple[str, bool, str, str, str]] = []

    def node_id(obj: dict, path: str) -> tuple[str, bool]:
        oid = obj.get("@id")
        if isinstance(oid, str) and oid:
            return oid, True
        return path, False

    def walk(obj: dict, path: str) -> None:
        subj, subj_abs = node_id(obj, path)
        for key in sorted(obj):
            if key == "@id":
                continue
            val = obj[key]
            items = val if isinstance(val, list) else [val]
            in_list = isinstance(val, list)
            for i, item in enumerate(items):
                if isinstance(item, dict):
                    cpath = f"{path}/{key}/{i}" if in_list else f"{path}/{key}"
                    cid, cabs = node_id(item, cpath)
                    out.append(
                        (subj, subj_abs, key, cid, "abs" if cabs else "rel")
                    )
                    walk(item, cpath)
                elif isinstance(item, list):
                    continue  # nested arrays of arrays: no RDF analog
                else:
                    lit = _scalar_repr(item)
                    if lit is not None:
                        out.append((subj, subj_abs, key, lit, "lit"))
    if isinstance(root, dict):
        walk(root, "")
    elif isinstance(root, list):
        for i, item in enumerate(root):
            if isinstance(item, dict):
                walk(item, f"/{i}")
    return out


def extract_jsonld(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Pages → distinct (url, subj, pred, obj) JSON-LD triples.

    Plan shape: codegen regexp scan → posexplode → distinct-block
    Arrow flatten → equi-join back on block hash → codegen id
    materialization.  The join is hash-based (block-hash key); the
    Python stage sees each distinct block once.
    """
    blocks = (
        pages.select(
            F.col(url_col).alias("url"),
            F.posexplode(
                F.regexp_extract_all(F.col(html_col), F.lit(_LDJSON_RE), 1)
            ).alias("bidx", "jstr"),
        )
        .where(F.length(F.trim("jstr")) > 0)
        .select("url", "bidx", F.md5("jstr").alias("jhash"), "jstr")
    )

    from ..partitioning import pin_groups

    # same AQE-coalescing escape as extract_microdata: keep the Python
    # flatten pass wide (dropDuplicates reuses the jhash partitioning)
    uniq = pin_groups(blocks.select("jhash", "jstr"), "jhash").dropDuplicates(
        ["jhash", "jstr"]
    )

    def flatten_batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for jhash, jstr in zip(pdf["jhash"], pdf["jstr"]):
                for subj, sabs, pred, obj, kind in flatten_jsonld(jstr):
                    rows.append((jhash, subj, sabs, pred, obj, kind))
            yield pd.DataFrame(
                rows,
                columns=[
                    "jhash", "subj", "subj_abs", "pred", "obj", "obj_kind"
                ],
            )

    flat = uniq.mapInPandas(flatten_batches, _FLAT_SCHEMA)

    base = F.concat(F.col("url"), F.lit("#b"), F.col("bidx").cast("string"))
    joined = blocks.select("url", "bidx", "jhash").join(flat, "jhash")
    return (
        joined.select(
            "url",
            F.when(F.col("subj_abs"), F.col("subj"))
            .otherwise(F.concat(base, F.col("subj")))
            .alias("subj"),
            F.col("pred"),
            F.when(F.col("obj_kind") == "rel", F.concat(base, F.col("obj")))
            .otherwise(F.col("obj"))
            .alias("obj"),
        )
        .distinct()
    )


# --- Open information extraction (pattern-based SVO) -----------------

# One triple per sentence: optional determiner, capitalized subject
# token, a closed-class relation verb, optional determiner, object
# token.  RE2-compatible (no lookbehind/backrefs) so the same pattern
# runs on Spark (Java regex) and DuckDB/RE2 oracles.
SVO_VERBS = ("is", "was", "are", "has", "uses", "makes", "contains")
_SVO_RE = (
    r"(?:The |A |An )?([A-Z][A-Za-z0-9_-]*) ("
    + "|".join(SVO_VERBS)
    + r") (?:a |an |the )?([A-Za-z][A-Za-z0-9_-]*)"
)
_SENT_SPLIT_RE = r"[.!?]\s+"


def extract_svo(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Pattern-based open IE: (doc_id, subj, rel, obj), one triple per
    sentence that matches the SVO pattern.  The cheap, recall-limited
    cousin of the dictionary mention detector (operators/mentions.py)
    — no pattern DB needed, the verb IS the predicate; useful as a
    candidate generator feeding entity resolution + the KG merge.

    Whole plan is codegen: sentence split (explode) + one
    regexp_extract per capture group; no Python, no join, no shuffle
    before the caller's aggregation.  The sentence splitter is the
    delimiter-consuming ``[.!?]\\s+`` form (RE2-safe: lookbehind is
    unavailable in DuckDB, and a trailing terminator without
    following space stays attached — the SVO pattern is not
    end-anchored, so it matches regardless).
    """
    from ..partitioning import spread

    docs = spread(docs, id_col)
    sent = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), _SENT_SPLIT_RE)).alias("s"),
    )
    return (
        sent.select(
            "doc_id",
            F.regexp_extract("s", _SVO_RE, 1).alias("subj"),
            F.regexp_extract("s", _SVO_RE, 2).alias("rel"),
            F.regexp_extract("s", _SVO_RE, 3).alias("obj"),
        )
        .where(F.col("rel") != "")
    )


# --- HTML microdata (schema.org itemscope/itemprop) -------------------

_MD_TAG_RE = None  # built lazily below


def parse_microdata(html: str) -> list[tuple[str, str, str]]:
    """From-scratch HTML-microdata walk (WHATWG microdata model,
    well-formed-markup subset: quoted attributes, properly nested
    tags; no comment/script escaping — the honest boundary is
    documented, and the oracle synthesizes markup inside it).

    Returns (subj, pred, obj) with LOCAL subjects: an item's subject is
    its ``itemid`` attribute verbatim when present, else ``#m{i}`` by
    document order of itemscope — the caller absolutizes against the
    page url.  Property values: ``content`` attr (meta), ``href``
    (a/link), ``src`` (img), else the whitespace-normalized text
    content of the element; nested itemscope under itemprop links the
    child item as the object.  ``itemtype`` emits a ``type`` triple."""
    import re as _re

    global _MD_TAG_RE
    if _MD_TAG_RE is None:
        _MD_TAG_RE = _re.compile(
            r"<(/?)([a-zA-Z][a-zA-Z0-9]*)"
            r"((?:\s+[a-zA-Z-]+(?:=\"[^\"]*\")?)*)\s*(/?)>"
        )
    attr_re = _re.compile(r"([a-zA-Z-]+)(?:=\"([^\"]*)\")?")
    void = {"meta", "link", "img", "br", "input", "hr"}

    out: list[tuple[str, str, str]] = []
    n_items = 0
    # stack frames: [tag, item_subj_or_None, capture_(subj,prop,buf)_or_None]
    stack: list[list] = []
    pos = 0
    for m in _MD_TAG_RE.finditer(html):
        text = html[pos:m.start()]
        if text.strip():
            for fr in reversed(stack):
                if fr[2] is not None:
                    fr[2][2].append(text)
                    break
        pos = m.end()
        closing, tag, rawattrs, selfclose = m.groups()
        tag = tag.lower()
        if closing:
            while stack:
                fr = stack.pop()
                if fr[2] is not None:
                    subj, prop, buf = fr[2]
                    out.append((subj, prop, " ".join("".join(buf).split())))
                if fr[0] == tag:
                    break
            continue
        attrs = {k.lower(): (v if v is not None else "")
                 for k, v in attr_re.findall(rawattrs)}
        enclosing = next(
            (fr[1] for fr in reversed(stack) if fr[1] is not None), None
        )
        item_subj = None
        if "itemscope" in attrs:
            item_subj = attrs.get("itemid") or f"#m{n_items}"
            n_items += 1
            if attrs.get("itemtype"):
                out.append((item_subj, "type", attrs["itemtype"]))
        prop = attrs.get("itemprop")
        capture = None
        if prop and enclosing is not None and item_subj is not None:
            out.append((enclosing, prop, item_subj))  # nested item link
        elif prop and enclosing is not None:
            if tag == "meta":
                out.append((enclosing, prop, attrs.get("content", "")))
            elif tag in ("a", "link", "area"):
                out.append((enclosing, prop, attrs.get("href", "")))
            elif tag in ("img", "audio", "video", "source", "iframe"):
                out.append((enclosing, prop, attrs.get("src", "")))
            elif tag not in void and not selfclose:
                capture = (enclosing, prop, [])
        if tag not in void and not selfclose:
            stack.append([tag, item_subj, capture])
    tail = html[pos:]
    if tail.strip():
        for fr in reversed(stack):
            if fr[2] is not None:
                fr[2][2].append(tail)
                break
    while stack:  # unclosed capture at EOF: emit what was buffered
        fr = stack.pop()
        if fr[2] is not None:
            subj, prop, buf = fr[2]
            out.append((subj, prop, " ".join("".join(buf).split())))
    return out


def extract_microdata(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Pages → distinct (url, subj, pred, obj) microdata triples —
    the itemscope/itemprop sibling of :func:`extract_jsonld`, same
    plan shape: distinct-page Arrow parse keyed by content hash,
    equi-join back, codegen subject absolutization (local ``#m{i}``
    ids become ``url#m{i}``; ``itemid`` subjects pass verbatim)."""
    hashed = pages.select(
        F.col(url_col).alias("url"),
        F.md5(F.col(html_col)).alias("hhash"),
        F.col(html_col).alias("_html"),
    )
    from ..partitioning import pin_groups

    # pin the dedup-shuffle width: the stack-parser pass below is
    # Python per distinct page, and AQE's size-based coalescing would
    # run it on 1-2 partitions; dropDuplicates reuses the pinned
    # hhash partitioning (hhash ⊆ the dedup key), no extra exchange
    uniq = pin_groups(hashed.select("hhash", "_html"), "hhash").dropDuplicates(
        ["hhash", "_html"]
    )

    def parse_batches(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for hhash, html in zip(pdf["hhash"], pdf["_html"]):
                for subj, pred, obj in parse_microdata(html or ""):
                    rows.append((hhash, subj, pred, obj))
            yield pd.DataFrame(
                rows, columns=["hhash", "subj", "pred", "obj"]
            )

    flat = uniq.mapInPandas(
        parse_batches,
        "hhash string, subj string, pred string, obj string",
    )
    joined = hashed.select("url", "hhash").join(flat, "hhash")

    def absolutize(c):
        return F.when(
            c.startswith("#"), F.concat(F.col("url"), c)
        ).otherwise(c)

    return (
        joined.select(
            "url",
            absolutize(F.col("subj")).alias("subj"),
            "pred",
            absolutize(F.col("obj")).alias("obj"),
        )
        .distinct()
    )
