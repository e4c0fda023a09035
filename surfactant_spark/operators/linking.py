"""Phase-2 relationship resolution: mentions/links/hosts → (subj, pred, obj).

Surfactant's relate phase loops every software × metadata × plugin and
is O(n²) by its own admission (surfactant/relationships/__init__.py:12-31).
Here every relationship family is an explicit join or pure projection:

* ``Uses``    — mention rows ⋈ broadcast entity-canonical map
                (the J4 broadcast export-index join analog,
                surfactant/relationships/java_relationship.py:11-51)
* ``LinksTo`` — resolved href urls ⋈ url→page-node map, skew-aware
                (the J1 probe-path candidate join analog,
                surfactant/relationships/elf_relationship.py:98-149)
* ``Contains``— host → page, pure column expression, no join at all
                (the J6 archive-Contains analog,
                surfactant/cmd/generate.py:326-356)

Edge dedup on (subj, pred, obj) mirrors graph-membership dedup
(surfactant/relationships/__init__.py:28-31); lang is resolved by
``min`` so results are deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import PRED_CONTAINS, PRED_LINKS_TO, PRED_USES
from .skew import skew_aware_join


def _page_node(col: str = "content_sha256"):
    return F.concat(F.lit("p:"), F.col(col))


def uses_edges(mentions: DataFrame, entity_map: DataFrame) -> DataFrame:
    """mentions(content_sha256, entity_key, lang) ⋈ entity_map(entity_key,
    canonical_id).  The map is dictionary-sized → broadcast hash join,
    no shuffle of the mention table."""
    return (
        mentions.join(F.broadcast(entity_map.select("entity_key", "canonical_id")), "entity_key")
        .select(
            _page_node().alias("subj"),
            F.lit(PRED_USES).alias("pred"),
            F.col("canonical_id").alias("obj"),
            "lang",
        )
    )


def links_to_edges(extracted: DataFrame, hot_keys: list | None = None) -> DataFrame:
    """Explode resolved link urls and join them to the url→page-node map.

    Both sides scale with the corpus (10^12 rows), so this is the one
    big-big join in the pipeline; heavily-linked pages are heavy hitters
    on the probe side → skew-aware hot-key isolation (operators/skew.py).
    Self-links are excluded like the reference's self-edge filter
    (surfactant/relationships/java_relationship.py:44-50).
    """
    links_flat = extracted.select(
        _page_node().alias("subj"),
        "lang",
        F.explode("links").alias("url"),
    )
    url_map = extracted.select("url", _page_node().alias("obj"))
    joined = skew_aware_join(links_flat, url_map, key="url", how="inner", hot_keys=hot_keys)
    return (
        joined.where(F.col("subj") != F.col("obj"))
        .select("subj", F.lit(PRED_LINKS_TO).alias("pred"), "obj", "lang")
    )


def contains_edges(extracted: DataFrame, dedup: bool = False) -> DataFrame:
    """host node → page node; whole-stage-codegen column expressions
    only (sha2 + concat), so the hot host costs nothing extra.

    ``dedup=True`` dedups on the RAW (host, content_sha256) projection
    first — two short columns shuffle instead of the built edge
    strings, and the sha2/concat node construction runs once per
    distinct edge."""
    src = extracted.select("host", "content_sha256", "lang")
    if dedup:
        src = src.groupBy("host", "content_sha256").agg(F.min("lang").alias("lang"))
    return src.select(
        F.concat(F.lit("h:"), F.sha2(F.col("host"), 256)).alias("subj"),
        F.lit(PRED_CONTAINS).alias("pred"),
        _page_node().alias("obj"),
        "lang",
    )


ELF_DEFAULT_LIBDIRS = ("/lib", "/lib64", "/usr/lib", "/usr/lib64")


def elf_search_paths(
    runpath: str | None,
    origin: str,
    libdirs: tuple[str, ...] = ("lib", "lib64"),
    use_default: bool = True,
) -> list[str]:
    """J1 search-path generation with DST token expansion
    (surfactant/relationships/elf_relationship.py:152-198, 279-396):
    each ':'-separated runpath entry expands ``$ORIGIN`` → the
    binary's directory, ``$LIB`` → one variant per libdir (branching
    1 → N), and entries containing ``$PLATFORM`` are DROPPED
    (unresolvable without the running machine); the default system
    dirs append unless the binary sets DF_1_NODEFLIB
    (``use_default=False``).  Order-preserving, deduplicated,
    normalized — candidate (dir, soname) pairs then feed the shared
    equi-join (J10)."""
    from ..functions.extract import posix_normpath

    out: list[str] = []
    for entry in (runpath.split(":") if runpath else []):
        if not entry or "$PLATFORM" in entry or "${PLATFORM}" in entry:
            continue
        variants = [entry]
        for tok in ("${LIB}", "$LIB"):
            if tok in entry:
                variants = [entry.replace(tok, ld) for ld in libdirs]
                break
        for v in variants:
            for tok in ("${ORIGIN}", "$ORIGIN"):
                v = v.replace(tok, origin)
            out.append(posix_normpath(v))
    if use_default:
        out.extend(ELF_DEFAULT_LIBDIRS)
    seen: set[str] = set()
    uniq = []
    for d in out:
        if d not in seen:
            seen.add(d)
            uniq.append(d)
    return uniq


def probe_dir_candidates(base_col, name_col, cultures: list[str],
                         subdirs: list[str]):
    """J3 probe-dir generator (surfactant/relationships/
    dotnet_relationship.py:203-243): the candidate-path array for one
    dependency — base dir × {'' + privatePath subdirs} × {'' + culture
    dirs} × name, in deterministic enumeration order.  Returns
    array<string>; callers explode and equi-join against the target
    path set (the J10 shared-matcher seam).  Pure column expressions —
    one dep row fans out to (1+|subdirs|)·(1+|cultures|) candidates
    with no UDF and no extra pass."""
    out = []
    for sd in [""] + list(subdirs):
        for cu in [""] + list(cultures):
            parts = [base_col]
            if sd:
                parts.append(F.lit(sd))
            if cu:
                parts.append(F.lit(cu))
            parts.append(name_col)
            out.append(F.concat_ws("/", *parts))
    return F.array(*out)


def ci_path_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    how: str = "inner",
) -> DataFrame:
    """Case-insensitive path-equality equi-join — the J2/J10 analog
    (PureWindowsPath case-fold at surfactant/relationships/_internal/
    windows_utils.py:18-39): both sides join on ``lower(key)``; the
    original-case columns survive on the output.  The fold is a pure
    column expression, so this stays a hash join with the normalized
    key as the shuffle axis (no UDF, no extra pass)."""
    p = probe.withColumn("_ci_key", F.lower(F.col(probe_key)))
    b = build.withColumn("_ci_key", F.lower(F.col(build_key)))
    return p.join(b, "_ci_key", how).drop("_ci_key")


def dedup_edges(edges: DataFrame) -> DataFrame:
    """(subj, pred, obj) distinct with deterministic lang (min)."""
    return edges.groupBy("subj", "pred", "obj").agg(F.min("lang").alias("lang"))


def aliased_entity_keys(alias_edge_rows) -> list[str]:
    """Entity keys in any multi-member alias component — exactly the
    keys touching an a≠b alias edge (a component has ≥2 members iff
    some non-self edge reaches it).  Pure driver-side Python over the
    dictionary-sized edge list; feeds ``build_edges(aliased_keys=…)``."""
    keys: set[str] = set()
    for a, b in alias_edge_rows or []:
        if a != b:
            keys.add(a)
            keys.add(b)
    return sorted(keys)


def build_edges(
    extracted: DataFrame,
    mentions: DataFrame,
    entity_map: DataFrame,
    hot_link_keys: list | None = None,
    mentions_unique: bool = False,
    entity_map_injective: bool = False,
    aliased_keys: list | None = None,
) -> DataFrame:
    """Union of the three edge families, each deduped SEPARATELY.

    The families carry distinct ``pred`` literals, so (subj, pred, obj)
    keys cannot collide across families — per-family dedup is exactly
    the global groupBy over the union, but the union itself becomes a
    pure concatenation with NO shuffle (r3's single union+dedup groupBy
    was the edges stage's dominant shuffle: 8.1 s of 16.5 s at 100 k
    pages, VERDICT r3).  Families that are distinct by construction
    skip their shuffle entirely:

    * Uses — skips its dedup shuffle only when BOTH ``mentions_unique``
      (the caller ran mention detection over per-content rows,
      mentions.unique_content — one row per (content, entity_key)) AND
      ``entity_map_injective`` (no alias component collapses two
      entity_keys onto one canonical_id).  Uniqueness per entity_key is
      NOT enough: the broadcast join maps entity_key → canonical_id,
      so a content mentioning two aliases of one entity would emit a
      duplicate (subj, Uses, obj) edge — the r4 ADVICE regression.
      Callers that know their alias-edge list is empty (driver-side
      Python, free to check) pass injective=True and keep the
      shuffle-free path.  Non-injective callers can pass
      ``aliased_keys`` (``aliased_entity_keys`` — any key touching an
      a≠b alias edge) to shrink the dedup shuffle to just the aliased
      sliver of mentions: the rest of the corpus stays shuffle-free.
    * Contains — deduped on the raw (host, content_sha256) projection:
      two short columns shuffle instead of built edge strings.
    * LinksTo — deduped post-join on (subj, pred, obj) as before (a
      re-crawled url legitimately maps to several page versions, so the
      join output is the first place the key exists)."""
    if mentions_unique and not entity_map_injective and aliased_keys:
        # Split dedup: duplicate Uses edges can ONLY arise from
        # mentions of ALIASED entity keys (two keys → one canonical
        # id), and that key set is dictionary-sized and driver-known.
        # The non-aliased slice — virtually the whole corpus — keeps
        # the shuffle-free path; only the aliased sliver pays the
        # dedup groupBy.
        is_aliased = F.col("entity_key").isin(list(aliased_keys))
        e1 = uses_edges(mentions.where(~is_aliased), entity_map).unionByName(
            dedup_edges(uses_edges(mentions.where(is_aliased), entity_map))
        )
    else:
        e1 = uses_edges(mentions, entity_map)
        if not (mentions_unique and entity_map_injective):
            e1 = dedup_edges(e1)
    e2 = dedup_edges(links_to_edges(extracted, hot_keys=hot_link_keys))
    e3 = contains_edges(extracted, dedup=True)
    return e1.unionByName(e2).unionByName(e3)


# ---------------------------------------------------------------------------
# Node tables (FIXTURES.md §4) — the Software-entry analog
# ---------------------------------------------------------------------------

def page_nodes(extracted: DataFrame) -> DataFrame:
    """groupBy(content_sha256) dedup-merge: urls append-if-absent,
    capture window min/max — the A1/A3 merge semantics
    (surfactant/sbomtypes/_software.py:108-155, surfactant/cmd/merge.py:166-178)."""
    return (
        extracted.groupBy("content_sha256")
        .agg(
            F.sort_array(F.collect_set("url")).alias("urls"),
            F.sort_array(
                F.collect_set(F.substring_index("text", "\n", 1))
            ).alias("names"),
            F.min("lang").alias("lang"),
            F.date_format(F.min("warc_ts"), "yyyy-MM-dd HH:mm:ss").alias("cap_start"),
            F.date_format(F.max("warc_ts"), "yyyy-MM-dd HH:mm:ss").alias("cap_end"),
        )
        .select(
            _page_node().alias("canonical_id"),
            F.lit("page").alias("node_type"),
            F.col("content_sha256").alias("sha256"),
            "names",
            "urls",
            "lang",
            F.map_from_arrays(
                F.array(F.lit("captureStart"), F.lit("captureEnd")),
                F.array(F.col("cap_start"), F.col("cap_end")),
            ).alias("attrs"),
        )
    )


def entity_nodes(mentions: DataFrame, entity_map: DataFrame) -> DataFrame:
    """One node per mentioned canonical entity; names = all alias keys of
    the component; attrs.version = confidence-argmax version hint (F6,
    surfactant/cmd/generate.py:93-122) with deterministic tie-break."""
    mentioned = (
        mentions.join(F.broadcast(entity_map), "entity_key")
        .groupBy("canonical_id")
        .agg(
            F.max_by(
                F.col("version"),
                F.struct(F.col("confidence"), F.col("version")),
            ).alias("version"),
            F.min("lang").alias("lang"),
        )
    )
    names = entity_map.groupBy("canonical_id").agg(
        F.sort_array(F.array_distinct(F.flatten(F.collect_list("member_keys")))).alias("names")
    )
    return (
        mentioned.join(names, "canonical_id")
        .select(
            "canonical_id",
            F.lit("entity").alias("node_type"),
            F.lit(None).cast("string").alias("sha256"),
            "names",
            F.array().cast("array<string>").alias("urls"),
            "lang",
            F.when(
                F.col("version").isNotNull(),
                F.map_from_arrays(F.array(F.lit("version")), F.array(F.col("version"))),
            )
            .otherwise(F.create_map().cast("map<string,string>"))
            .alias("attrs"),
        )
    )


def host_nodes(extracted: DataFrame) -> DataFrame:
    return (
        extracted.groupBy("host")
        .agg(F.min("lang").alias("lang"))
        .select(
            F.concat(F.lit("h:"), F.sha2(F.col("host"), 256)).alias("canonical_id"),
            F.lit("host").alias("node_type"),
            F.lit(None).cast("string").alias("sha256"),
            F.array(F.col("host")).alias("names"),
            F.array().cast("array<string>").alias("urls"),
            "lang",
            F.create_map().cast("map<string,string>").alias("attrs"),
        )
    )


def build_nodes(extracted: DataFrame, mentions: DataFrame, entity_map: DataFrame) -> DataFrame:
    return (
        page_nodes(extracted)
        .unionByName(entity_nodes(mentions, entity_map))
        .unionByName(host_nodes(extracted))
    )


# ---------------------------------------------------------------------------
# J3: .NET Uses sub-joins (surfactant/relationships/dotnet_relationship.py)
# ---------------------------------------------------------------------------

_WIN_ABS_RX = r"^([A-Za-z]:[/\\]|\\\\|//)"


def _win_fold(col):
    """PureWindowsPath-equality as a column expression: backslashes →
    '/', trailing-slash strip, case-fold — the comparison semantics of
    the reference's find_installed_software
    (surfactant/relationships/_internal/windows_utils.py:18-39)."""
    c = F.regexp_replace(col, r"\\", "/")
    c = F.regexp_replace(c, "/+$", "")
    return F.lower(c)


def _win_parent(col):
    """Parent directory of a windows path (either separator) —
    PureWindowsPath(p).parent.as_posix() for the non-root paths the
    probe logic feeds it."""
    c = F.regexp_replace(col, r"\\", "/")
    return F.regexp_replace(c, "/[^/]*$", "")


def _fold_targets(targets: DataFrame) -> DataFrame:
    return targets.select(
        "target_id", _win_fold(F.col("install_path")).alias("_tpath")
    )


def _probe_join(cands: DataFrame, targets: DataFrame) -> DataFrame:
    """(app_id, cand) ⋈ folded target install paths → Uses edges.
    The target side is the corpus-scale one; candidates shuffle on the
    folded path — a plain hash equi-join (the J10 shared matcher)."""
    return (
        cands.select("app_id", _win_fold(F.col("cand")).alias("_tpath"))
        .join(_fold_targets(targets), "_tpath")
        .select(
            F.col("app_id").alias("subj"),
            F.lit(PRED_USES).alias("pred"),
            F.col("target_id").alias("obj"),
        )
        .distinct()
    )


def dotnet_implmap_uses(refs: DataFrame, targets: DataFrame) -> DataFrame:
    """ImplMap (P/Invoke) sub-join (dotnet_relationship.py:85-124):
    absolute dll refs match install paths directly; relative refs probe
    the app's install dirs with the unmanaged name×extension
    combinations ([name], +.dll unless already .dll/.exe, .so/.dylib/
    lib-prefixed variants — dotnet_relationship.py:107-118).

    ``refs``: (app_id, install_path, ref_name) — one row per implMap
    dll name per app install path.  ``targets``: (target_id,
    install_path)."""
    is_abs = F.col("ref_name").rlike(_WIN_ABS_RX)
    abs_cands = refs.where(is_abs).select(
        "app_id", F.col("ref_name").alias("cand")
    )
    nm = F.col("ref_name")
    has_ext = F.lower(nm).rlike(r"\.(dll|exe)$")
    tail = [
        F.concat(nm, F.lit(".so")),
        F.concat(nm, F.lit(".dylib")),
        F.concat(F.lit("lib"), nm, F.lit(".so")),
        F.concat(F.lit("lib"), nm, F.lit(".dylib")),
        F.concat(F.lit("lib"), nm),
    ]
    combos = F.when(has_ext, F.array(nm, *tail)).otherwise(
        F.array(nm, F.concat(nm, F.lit(".dll")), *tail)
    )
    rel_cands = (
        refs.where(~is_abs)
        .select(
            "app_id",
            _win_parent(F.col("install_path")).alias("base"),
            F.explode(combos).alias("fname"),
        )
        .select("app_id", F.concat_ws("/", F.col("base"), F.col("fname")).alias("cand"))
    )
    return _probe_join(abs_cands.unionByName(rel_cands), targets)


def dotnet_assemblyref_uses(refs: DataFrame, targets: DataFrame) -> DataFrame:
    """AssemblyRef probing sub-join (dotnet_relationship.py:196-243):
    probe dirs are app-base × {'', assembly-name dir} for neutral
    culture, or the culture-suffixed pair otherwise, each repeated
    under every appconfig privatePath — then ``<dir>/<name>.dll``
    equality against installed software.

    ``refs``: (app_id, install_path, ref_name, ref_culture,
    probing_paths array<string> nullable)."""
    base = _win_parent(F.col("install_path"))
    nm, cu = F.col("ref_name"), F.col("ref_culture")
    no_cult = cu.isNull() | (cu == "")
    fixed = F.when(
        no_cult, F.array(base, F.concat_ws("/", base, nm))
    ).otherwise(
        F.array(F.concat_ws("/", base, cu), F.concat_ws("/", base, nm, cu))
    )
    paths = F.coalesce(F.col("probing_paths"), F.array().cast("array<string>"))
    priv = F.flatten(
        F.transform(
            paths,
            lambda p: F.when(
                no_cult,
                F.array(F.concat_ws("/", base, p), F.concat_ws("/", base, p, nm)),
            ).otherwise(
                F.array(
                    F.concat_ws("/", base, p, cu),
                    F.concat_ws("/", base, p, nm, cu),
                )
            ),
        )
    )
    cands = refs.select(
        "app_id",
        F.explode(F.concat(fixed, priv)).alias("dir"),
        F.concat(nm, F.lit(".dll")).alias("fname"),
    ).select("app_id", F.concat_ws("/", F.col("dir"), F.col("fname")).alias("cand"))
    return _probe_join(cands, targets)


def dotnet_codebase_uses(refs: DataFrame, targets: DataFrame) -> DataFrame:
    """appconfig ``<codeBase href>`` sub-join
    (dotnet_relationship.py:150-185): url hrefs (http/https/file) are
    skipped; other hrefs resolve against the app's base dir (absolute
    windows hrefs stand alone) and match install paths literally —
    like PureWindowsPath joining, no ``..`` resolution.

    ``refs``: (app_id, install_path, codebase_href)."""
    href = F.col("codebase_href")
    is_url = F.lower(href).rlike("^(https?|file)://")
    cand = F.when(href.rlike(_WIN_ABS_RX), href).otherwise(
        F.concat_ws("/", _win_parent(F.col("install_path")), href)
    )
    cands = refs.where(~is_url).select("app_id", cand.alias("cand"))
    return _probe_join(cands, targets)


def attach_side_files(binaries: DataFrame, files: DataFrame) -> DataFrame:
    """PE side-file lookup as a sibling-path self-join: for each binary
    install path, `<path>.manifest` and `<path>.config` files (case-
    insensitive, windows-separator-folded) attach as XML text columns —
    the on-disk `.with_suffix` existence checks of the reference
    (pe_file.py:337-343, :493-496) re-expressed as two left equi-joins
    (no per-row filesystem probing; the file table IS the filesystem).

    ``binaries``: any frame with ``install_path``.  ``files``:
    (path, text).  Output adds ``manifest_xml`` / ``appconfig_xml``.
    """
    out = binaries
    for suffix, col in ((".manifest", "manifest_xml"), (".config", "appconfig_xml")):
        # the file table is DATA, not a real filesystem: two rows may
        # fold to the same key (case / separator variants).  A real disk
        # has at most one side file per path, so keep one deterministic
        # winner — output cardinality must equal the binaries input.
        side = (
            files.select(
                _win_fold(F.col("path")).alias("_skey"), F.col("text").alias(col)
            )
            .groupBy("_skey")
            .agg(F.min(col).alias(col))
        )
        out = (
            out.withColumn(
                "_skey", _win_fold(F.concat(F.col("install_path"), F.lit(suffix)))
            )
            .join(side, "_skey", "left")
            .drop("_skey")
        )
    # `<binary>.local` DLL-redirection flag: existence only, no content
    # (the dllRedirectionLocal bool of pe_file.py:483-486)
    local = files.select(
        _win_fold(F.col("path")).alias("_skey"), F.lit(True).alias("dll_redirection_local")
    ).dropDuplicates(["_skey"])
    out = (
        out.withColumn(
            "_skey", _win_fold(F.concat(F.col("install_path"), F.lit(".local")))
        )
        .join(local, "_skey", "left")
        .drop("_skey")
        .withColumn(
            "dll_redirection_local",
            F.coalesce(F.col("dll_redirection_local"), F.lit(False)),
        )
    )
    return out


SIDE_INPUT_SCHEMA = (
    "app_id string, install_path string, probing_paths array<string>, "
    "codebase_hrefs array<string>"
)


def side_file_probe_inputs(with_sides: DataFrame) -> DataFrame:
    """Parse attached appconfig XML into the probe-join inputs:
    (app_id, install_path, probing_paths, codebase_hrefs) — privatePath
    split/normalized and codeBase hrefs collected per the reference's
    dnProbingPaths / dnDependentAssemblies derivation
    (dotnet_relationship.py:44-66, :152-167).  Arrow-batched; the XML
    never leaves the executors."""
    import pandas as pd

    from ..functions.sidefiles import (
        appconfig_codebase_hrefs,
        appconfig_probing_paths,
        parse_appconfig_xml,
    )

    def fn(batches):
        for pdf in batches:
            cfgs = [
                parse_appconfig_xml(x) if isinstance(x, str) else None
                for x in pdf["appconfig_xml"]
            ]
            yield pd.DataFrame(
                {
                    "app_id": pdf["app_id"],
                    "install_path": pdf["install_path"],
                    "probing_paths": [appconfig_probing_paths(c) for c in cfgs],
                    "codebase_hrefs": [appconfig_codebase_hrefs(c) for c in cfgs],
                }
            )

    return with_sides.select(
        "app_id", "install_path", "appconfig_xml"
    ).mapInPandas(fn, SIDE_INPUT_SCHEMA)


def anchor_text_profile(
    links,
    url_col: str = "href",
    anchor_col: str = "anchor",
    src_col: str = "src_host",
):
    """Anchor-text profile per CANONICAL target URL — the webtext
    analog of the reference's alias accumulation onto a canonical
    entity (A4): every (source page → href, anchor text) link is
    keyed by ``textfx.canonical_url(href)`` so spelling variants of
    one target collapse, then one groupBy aggregates inlink count,
    the sorted distinct anchor vocabulary, and distinct source hosts.

    100-TB shape: canonicalization is a codegen projection riding the
    scan; the single groupBy is partial-agg (collect_set of anchors is
    bounded by anchor vocabulary per target — cap upstream with a
    per-target sample if targets are adversarially hot).
    """
    from ..functions.textfx import canonical_url
    from ..partitioning import spread

    # ~10 regex ops per row: spread a narrow scan to compute width so
    # the canonicalization doesn't run inside one or two scan tasks
    # (single-row-group parquet input; no-op on wide cluster scans)
    links = spread(links, url_col)
    # distinct counts come from the collect_set sizes rather than
    # countDistinct: two countDistincts in one agg make Catalyst
    # Expand every input row 3x (one replica per distinct-aggregate
    # group), tripling the shuffle; the sets are being built anyway,
    # so size(set) gets the same numbers from ONE un-expanded pass
    # (same-session A/B at sf0.1: 14.1 -> 9.1 s best-of-2).
    agged = (
        links.select(
            canonical_url(url_col).alias("canon"),
            F.col(anchor_col).alias("_anchor"),
            F.col(src_col).alias("_src"),
        )
        .groupBy("canon")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_links"),
            F.sort_array(F.collect_set("_anchor")).alias("_aset"),
            F.collect_set("_src").alias("_sset"),
        )
    )
    return agged.select(
        "canon",
        "n_links",
        F.size("_aset").cast("long").alias("n_anchors"),
        F.array_join("_aset", "|").alias("anchors"),
        F.size("_sset").cast("long").alias("n_src_hosts"),
    )


def domain_suffixes(url_col: str = "url"):
    """All dot-suffixes of a URL's lowercased host, most-specific
    first: ``www.ads.x.com → [www.ads.x.com, ads.x.com, x.com, com]``
    — the candidate keys for domain-blocklist matching (a listed
    domain blocks every subdomain)."""
    host = F.lower(
        F.regexp_extract(
            F.col(url_col) if isinstance(url_col, str) else url_col,
            r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1,
        )
    )
    from ..functions.textfx import _let1

    # split (and the host regex feeding it) LET-BOUND so it evaluates
    # once per row instead of once per suffix element (textfx._let1)
    def build(parts):
        return F.transform(
            F.sequence(F.lit(1), F.size(parts)),
            lambda i: F.array_join(F.slice(parts, i, F.size(parts)), "."),
        )

    return _let1(F.split(host, r"\."), build)


def block_by_domain(df, blocked, url_col: str = "url"):
    """UT1-style domain blocklist: flag every row whose URL host or
    any parent domain is listed.  Adds ``blocked`` (boolean) and
    ``matched`` ('|'-joined sorted matching suffixes, '' if none).

    Two execution paths by blocklist size — the same dictionary
    small/large split as the mention detector (mentions.py):

    * ``blocked`` as a Python list (≤ a few thousand entries): the
      list is embedded as an array literal and matching is
      ``array_intersect`` — pure codegen, NO join, rides the scan.
    * ``blocked`` as a DataFrame with column ``domain`` (UT1-scale,
      millions of rows): suffixes explode (≤ host-label-count rows
      per url) and left-join the broadcast blocklist, then regroup —
      one broadcast hash join, no shuffle of the corpus.
    """
    sufs = domain_suffixes(url_col)
    if isinstance(blocked, (list, tuple)):
        lit = F.array(*[F.lit(b) for b in blocked])
        matched = F.array_join(F.sort_array(F.array_intersect(sufs, lit)), "|")
        return df.withColumn("matched", matched).withColumn(
            "blocked", F.col("matched") != ""
        )
    ex = df.withColumn("_suf", F.explode(sufs))
    hits = (
        ex.join(
            F.broadcast(blocked.select(F.col("domain").alias("_suf"))), "_suf"
        )
        .groupBy(url_col)
        .agg(
            F.array_join(F.sort_array(F.collect_set("_suf")), "|").alias(
                "matched"
            )
        )
    )
    return (
        df.join(hits, url_col, "left")
        .withColumn("matched", F.coalesce("matched", F.lit("")))
        .withColumn("blocked", F.col("matched") != "")
    )
