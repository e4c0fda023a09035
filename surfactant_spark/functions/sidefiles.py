"""Windows side-file parsing: `<binary>.manifest` and `<binary>.config`
XML — the DLL-redirection inputs the reference reads from disk next to
each PE (surfactant/infoextractors/pe_file.py:337-381 manifest,
:490-614 app config) and feeds into the .NET probe joins
(relationships/dotnet_relationship.py:44-66).

Parsers are namespace-agnostic (tag local-name matching, like the
reference's get_xmlns_and_tag) and total: malformed XML → None.  Input
size is bounded before parsing — side files are small configs; anything
huge is hostile and skipped (stdlib ElementTree does not fetch external
entities, and the size cap bounds internal entity blowup).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

_MAX_XML_BYTES = 1 << 20  # 1 MiB: no legitimate manifest approaches this


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse(text: str) -> "ET.Element | None":
    if not text or len(text) > _MAX_XML_BYTES:
        return None
    try:
        return ET.fromstring(text)
    except ET.ParseError:
        return None


def _dependent_assembly(da_el) -> dict:
    """{assemblyIdentity, codeBase, bindingRedirect} attr dicts — the
    get_dependentAssembly_info shape (pe_file.py:386-416)."""
    out: dict = {}
    for e in da_el:
        tag = _local(e.tag)
        if tag in ("assemblyIdentity", "codeBase", "bindingRedirect"):
            out.setdefault(tag, dict(e.attrib))
    return out


def parse_manifest_xml(text: str) -> dict | None:
    """<assembly> manifest → {assemblyIdentity, file: [attrs…],
    dependency: {dependentAssembly: […]}} (pe_file.py:337-381)."""
    root = _parse(text)
    if root is None or _local(root.tag) != "assembly":
        return None
    out: dict = {}
    for e in root:
        tag = _local(e.tag)
        if tag == "assemblyIdentity" and "assemblyIdentity" not in out:
            out["assemblyIdentity"] = dict(e.attrib)
        elif tag == "file":
            out.setdefault("file", []).append(dict(e.attrib))
        elif tag == "dependency":
            dep = out.setdefault("dependency", {})
            for d in e:
                if _local(d.tag) == "dependentAssembly":
                    dep.setdefault("dependentAssembly", []).append(
                        _dependent_assembly(d)
                    )
    return out


def _assembly_binding(ab_el) -> dict:
    out: dict = {}
    for e in ab_el:
        tag = _local(e.tag)
        if tag == "probing" and "privatePath" in e.attrib:
            out["probing"] = {"privatePath": e.attrib["privatePath"]}
        elif tag == "dependentAssembly":
            out.setdefault("dependentAssembly", []).append(_dependent_assembly(e))
    return out


def parse_appconfig_xml(text: str) -> dict | None:
    """<configuration> app config → {runtime: {assemblyBinding: …},
    windows: {assemblyBinding: …}} with probing privatePath and
    dependentAssembly rows (pe_file.py:490-614) — exactly the metadata
    shape dotnet_relationship.py:44-66 destructures."""
    root = _parse(text)
    if root is None or _local(root.tag) != "configuration":
        return None
    out: dict = {}
    for section in ("runtime", "windows"):
        for e in root:
            if _local(e.tag) != section:
                continue
            for ab in e:
                if _local(ab.tag) == "assemblyBinding":
                    info = _assembly_binding(ab)
                    if info:
                        out[section] = {"assemblyBinding": info}
    return out


def appconfig_probing_paths(cfg: dict | None) -> list[str]:
    """';'-split privatePath entries, backslashes normalized — the
    dnProbingPaths derivation (dotnet_relationship.py:52-66)."""
    if not cfg:
        return []
    paths: list[str] = []
    for section in ("runtime", "windows"):
        ab = cfg.get(section, {}).get("assemblyBinding", {})
        pp = ab.get("probing", {}).get("privatePath", "")
        for p in pp.split(";"):
            if p:
                paths.append(p.replace("\\", "/"))
    return paths


def appconfig_codebase_hrefs(cfg: dict | None) -> list[str]:
    """codeBase hrefs from every dependentAssembly
    (dotnet_relationship.py:152-167 consumer)."""
    if not cfg:
        return []
    out: list[str] = []
    for section in ("runtime", "windows"):
        ab = cfg.get(section, {}).get("assemblyBinding", {})
        for da in ab.get("dependentAssembly", []):
            href = da.get("codeBase", {}).get("href")
            if href:
                out.append(href)
    return out
