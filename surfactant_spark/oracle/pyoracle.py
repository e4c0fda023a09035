"""Single-process pure-Python oracle: the reference-triples stand-in.

Implements extraction → mention detection → canonicalization → triples
imperatively (the way Surfactant itself executes: one Python call stack,
surfactant/cmd/generate.py:278-615), over the same deterministic corpus.
The Spark pipeline's P/R is measured against this output; the target is
P/R ≥ 0.95 (BASELINE.md), and on the synthetic corpus it must be 1.0.

Deliberately shares the low-level pure functions (functions/extract.py,
dictionary.py) with the Spark UDFs — that sharing IS the byte-identity
guarantee — but re-implements all *dataflow* (grouping, joins, CC)
independently with dicts and loops, so a dataflow bug in the Spark
operators cannot self-confirm.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from dataclasses import dataclass, field

from ..dictionary import (
    CompiledDictionary,
    alias_edges,
    compile_dictionary,
)
from ..functions.extract import (
    extract_hrefs,
    html_to_text,
    maybe_gunzip,
    resolve_href,
    url_host,
)
from ..testing.corpus import make_page


@dataclass
class OracleResult:
    # triples: set of (subj, pred, obj)
    triples: set[tuple[str, str, str]] = field(default_factory=set)
    # nodes: canonical_id → dict
    nodes: dict[str, dict] = field(default_factory=dict)
    # per (content_sha, entity_key) version hint
    version_hints: dict[tuple[str, str], tuple[int, str | None, str]] = field(
        default_factory=dict
    )


def _union_find(keys: set[str], edges: list[tuple[str, str]]) -> dict[str, str]:
    parent = {k: k for k in keys}
    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[str, list[str]] = defaultdict(list)
    for k in parent:
        comps[find(k)].append(k)
    out = {}
    for members in comps.values():
        canon = "e:" + min(hashlib.sha256(m.encode()).hexdigest() for m in members)
        for m in members:
            out[m] = canon
    return out


def detect_mentions_text(
    text: str, compiled: CompiledDictionary
) -> list[tuple[str, str | None, int, str]]:
    """(entity_key, version, confidence, kind); first-match-wins per key."""
    seen: set[str] = set()
    out = []
    lower = text.lower()
    for p in compiled.patterns:
        if p.entity_key in seen:
            continue
        if not any(lit in lower for lit in p.prefilter):
            continue
        m = p.rx.search(text)
        if m is None:
            continue
        seen.add(p.entity_key)
        out.append((p.entity_key, m.group(1) if p.rx.groups >= 1 else None, p.confidence, p.kind))
    return out


def run_oracle(n_pages: int, compiled: CompiledDictionary | None = None) -> OracleResult:
    if compiled is None:
        compiled = compile_dictionary()
    edges_in = alias_edges()
    dict_keys = {p.entity_key for p in compiled.patterns}
    canon_of = _union_find(dict_keys, edges_in)
    member_names: dict[str, set[str]] = defaultdict(set)
    for k, c in canon_of.items():
        member_names[c].add(k)

    res = OracleResult()
    url_to_node: dict[str, str] = {}
    per_content: dict[str, dict] = {}

    pages = [make_page(pid, n_pages) for pid in range(n_pages)]

    # pass 1: extraction + hashing + url map
    extracted = []
    for pg in pages:
        content = maybe_gunzip(pg.html)
        sha = hashlib.sha256(content).hexdigest()
        s = content.decode("utf-8", errors="replace")
        text = html_to_text(s)
        assert text == pg.text, f"extraction not byte-identical for {pg.url}"
        links = [r for r in (resolve_href(pg.url, h) for h in extract_hrefs(s)) if r]
        node = "p:" + sha
        url_to_node[pg.url] = node
        extracted.append((pg, sha, text, links, node))
        pc = per_content.setdefault(
            sha,
            {"urls": set(), "titles": set(), "langs": set(), "ts": [], "text": text},
        )
        pc["urls"].add(pg.url)
        pc["titles"].add(text.split("\n", 1)[0])
        pc["langs"].add(pg.lang)
        pc["ts"].append(pg.warc_ts)

    # pass 2: mentions per unique content, relationships per row
    mentions_by_content: dict[str, list] = {}
    entity_lang: dict[str, set[str]] = defaultdict(set)
    for pg, sha, text, links, node in extracted:
        if sha not in mentions_by_content:
            mentions_by_content[sha] = detect_mentions_text(text, compiled)
        for ent, ver, conf, kind in mentions_by_content[sha]:
            canon = canon_of[ent]
            res.triples.add((node, "Uses", canon))
            entity_lang[canon].add(pg.lang)
            key = (canon, )
            prev = res.version_hints.get((sha, ent))
            cand = (conf, ver, kind)
            if prev is None or (cand[0], cand[1] or "", cand[2]) > (
                prev[0],
                prev[1] or "",
                prev[2],
            ):
                res.version_hints[(sha, ent)] = cand
        for target in links:
            tnode = url_to_node.get(target)
            if tnode is not None and tnode != node:
                res.triples.add((node, "LinksTo", tnode))
        host = url_host(pg.url)
        hnode = "h:" + hashlib.sha256(host.encode()).hexdigest()
        res.triples.add((hnode, "Contains", node))
        res.nodes.setdefault(
            hnode, {"node_type": "host", "names": {host}, "urls": set()}
        )

    # nodes: pages
    for sha, pc in per_content.items():
        res.nodes["p:" + sha] = {
            "node_type": "page",
            "sha256": sha,
            "names": pc["titles"],
            "urls": pc["urls"],
            "lang": min(pc["langs"]),
            "captureStart": min(pc["ts"]),
            "captureEnd": max(pc["ts"]),
        }
    # nodes: entities (only mentioned ones), version = argmax over pages
    best_ver: dict[str, tuple] = {}
    for (sha, ent), (conf, ver, kind) in res.version_hints.items():
        canon = canon_of[ent]
        cand = (conf, ver or "")
        if canon not in best_ver or cand > best_ver[canon]:
            best_ver[canon] = cand
    for canon, langs in entity_lang.items():
        conf_ver = best_ver.get(canon)
        res.nodes[canon] = {
            "node_type": "entity",
            "names": set(member_names[canon]),
            "lang": min(langs),
            "version": (conf_ver[1] or None) if conf_ver else None,
        }
    return res
