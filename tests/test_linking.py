"""Hand-built golden-edge fixture — the translated
tests/relationships/test_elf.py pattern: tiny node set, exact expected
Uses/LinksTo/Contains edges, including self-edge exclusion (the
java_relationship.py:44-50 analog) and skew-aware join parity."""

import datetime

from surfactant_spark.operators.linking import (
    build_edges,
    contains_edges,
    links_to_edges,
    uses_edges,
)
from surfactant_spark.schema import EXTRACTED_SCHEMA


def _extracted_df(spark):
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        # url, warc_ts, lang, content_sha256, text, links, host
        ("http://a.org/p1.html", ts, "en", "s1", "T1\nbody",
         ["http://a.org/p2.html", "http://b.org/p3.html"], "a.org"),
        ("http://a.org/p2.html", ts, "en", "s2", "T2\nbody",
         ["http://a.org/p1.html"], "a.org"),
        ("http://b.org/p3.html", ts, "fr", "s3", "T3\nbody",
         ["http://b.org/dup3.html", "http://nowhere.org/x.html"], "b.org"),
        # duplicate content of s3 under another url → self-link via dup must drop
        ("http://b.org/dup3.html", ts, "fr", "s3", "T3\nbody", [], "b.org"),
    ]
    return spark.createDataFrame(rows, EXTRACTED_SCHEMA)


def test_links_to_golden(spark):
    got = {(r.subj, r.obj) for r in links_to_edges(_extracted_df(spark)).collect()}
    assert got == {("p:s1", "p:s2"), ("p:s1", "p:s3"), ("p:s2", "p:s1")}
    # note: s3→dup3 resolved to its own node and was excluded as self-edge;
    # dangling link to nowhere.org dropped by inner join


def test_links_to_skew_path_equals_plain(spark):
    df = _extracted_df(spark)
    plain = {(r.subj, r.obj) for r in links_to_edges(df, hot_keys=[]).collect()}
    hot = {(r.subj, r.obj) for r in
           links_to_edges(df, hot_keys=["http://a.org/p1.html"]).collect()}
    assert plain == hot


def test_contains_golden(spark):
    got = {(r.subj[:2], r.obj) for r in contains_edges(_extracted_df(spark)).collect()}
    assert got == {("h:", "p:s1"), ("h:", "p:s2"), ("h:", "p:s3")}
    # 4 rows pre-dedup, but s3 appears under both b.org urls → same host+page


def test_uses_and_full_build(spark):
    mentions = spark.createDataFrame(
        [("s1", "en", "ka", "1.0", 90, "content"),
         ("s1", "en", "kb", None, 70, "name"),
         ("s3", "fr", "ka", None, 70, "name")],
        ["content_sha256", "lang", "entity_key", "version", "confidence", "matched_via"],
    )
    emap = spark.createDataFrame(
        [("ka", "e:AAA", ["ka"]), ("kb", "e:BBB", ["kb", "kc"])],
        ["entity_key", "canonical_id", "member_keys"],
    )
    uses = {(r.subj, r.obj) for r in uses_edges(mentions, emap).collect()}
    assert uses == {("p:s1", "e:AAA"), ("p:s1", "e:BBB"), ("p:s3", "e:AAA")}

    edges = build_edges(_extracted_df(spark), mentions, emap)
    by_pred = {r["pred"]: r["count"] for r in edges.groupBy("pred").count().collect()}
    # Contains deduped: b.org→p:s3 asserted by two url rows → one edge
    assert by_pred == {"Uses": 3, "LinksTo": 3, "Contains": 3}
    # dedup: (subj,pred,obj) unique
    assert edges.count() == edges.select("subj", "pred", "obj").distinct().count()


def test_uses_dedup_with_aliased_keys(spark):
    """r4 ADVICE (high): per-entity_key-unique mentions are NOT unique
    per canonical_id when the entity map collapses aliases — a content
    mentioning both aliases of one entity must still yield ONE Uses
    edge.  mentions_unique alone may no longer skip the dedup."""
    mentions = spark.createDataFrame(
        [("s1", "en", "libalpha", "1.0", 90, "content"),
         ("s1", "en", "alphalib", None, 70, "name")],
        ["content_sha256", "lang", "entity_key", "version", "confidence", "matched_via"],
    )
    emap = spark.createDataFrame(
        [("libalpha", "e:A", ["alphalib", "libalpha"]),
         ("alphalib", "e:A", ["alphalib", "libalpha"])],
        ["entity_key", "canonical_id", "member_keys"],
    )
    ext = _extracted_df(spark)
    edges = build_edges(ext, mentions, emap, mentions_unique=True)
    uses = [(r.subj, r.obj) for r in
            edges.where("pred = 'Uses'").select("subj", "obj").collect()]
    assert uses == [("p:s1", "e:A")]  # exactly one, not two
    # injective map + unique mentions: the skip path stays available
    emap_inj = spark.createDataFrame(
        [("libalpha", "e:A", ["libalpha"])],
        ["entity_key", "canonical_id", "member_keys"],
    )
    m1 = mentions.where("entity_key = 'libalpha'")
    e2 = build_edges(ext, m1, emap_inj, mentions_unique=True,
                     entity_map_injective=True)
    assert e2.where("pred = 'Uses'").count() == 1


def test_elf_search_paths_dst_expansion():
    """DST semantics parity (elf_relationship.py:279-396): $ORIGIN
    substitution, $LIB 1→N branching, $PLATFORM drop, DF_1_NODEFLIB
    suppressing defaults, normalization, order-preserving dedup."""
    from surfactant_spark.operators.linking import elf_search_paths

    got = elf_search_paths(
        "$ORIGIN/../$LIB:/opt/$PLATFORM/lib:${ORIGIN}/plugins:/lib",
        origin="/app/bin",
    )
    assert got == [
        "/app/lib", "/app/lib64",         # $ORIGIN/../$LIB branched + normalized
        "/app/bin/plugins",               # ${ORIGIN} form
        "/lib",                           # runpath /lib wins position; deduped vs default
        "/lib64", "/usr/lib", "/usr/lib64",
    ]
    # DF_1_NODEFLIB analog: no default dirs
    assert elf_search_paths("$ORIGIN/sub", "/a", use_default=False) == ["/a/sub"]
    # no runpath at all → defaults only
    assert elf_search_paths(None, "/a") == list(
        __import__("surfactant_spark.operators.linking",
                   fromlist=["ELF_DEFAULT_LIBDIRS"]).ELF_DEFAULT_LIBDIRS
    )


def test_elf_parsed_deps_to_uses_join(spark):
    """E1 → J1 end-to-end on REAL parsed metadata: DT_NEEDED +
    $ORIGIN/$LIB runpath from the binary's dynamic segment generate
    candidate (dir, soname) paths; equi-join against installed-file
    paths yields the Uses edges."""
    from pyspark.sql import functions as F

    from surfactant_spark.operators.linking import elf_search_paths
    from surfactant_spark.operators.multimodal import extract_binary_meta
    from tests.test_binmeta import elf64_dynamic_blob

    blob = elf64_dynamic_blob(needed=("libz.so.1", "libq.so.9"),
                              runpath="$ORIGIN/../lib")
    df = spark.createDataFrame([("binA", blob)], "media_id string, content binary")
    meta = {r.media_id: r.meta for r in extract_binary_meta(df).collect()}
    needed = meta["binA"]["needed"].split("|")
    dirs = elf_search_paths(meta["binA"]["runpath"], origin="/app/bin")
    cands = spark.createDataFrame(
        [("binA", f"{d}/{n}") for n in needed for d in dirs], ["bin", "cand"]
    )
    installed = spark.createDataFrame(
        [("/app/lib/libz.so.1", "tgtZ"), ("/usr/lib/libq.so.9", "tgtQ"),
         ("/app/lib/unrelated.so", "tgtX")],
        ["path", "target"],
    )
    uses = cands.join(installed, cands["cand"] == installed["path"]).select(
        "bin", "target"
    )
    assert {(r.bin, r.target) for r in uses.collect()} == {
        ("binA", "tgtZ"), ("binA", "tgtQ")
    }


def test_nodeflib_binary_resolves_only_via_runpath(spark):
    """DT_FLAGS_1 & DF_1_NODEFLIB suppresses the default library dirs:
    the same dependency installed under /usr/lib must NOT resolve, while
    the runpath copy does (reference elf_relationship.py:186-206)."""
    from surfactant_spark.operators.linking import elf_search_paths
    from surfactant_spark.operators.multimodal import extract_binary_meta
    from tests.test_binmeta import elf64_dynamic_blob

    blob = elf64_dynamic_blob(needed=("libz.so.1", "libq.so.9"),
                              runpath="$ORIGIN/../lib", flags_1=0x0800)
    plain = elf64_dynamic_blob(needed=("libz.so.1", "libq.so.9"),
                               runpath="$ORIGIN/../lib")
    df = spark.createDataFrame(
        [("nodef", blob), ("plain", plain)], "media_id string, content binary"
    )
    meta = {r.media_id: r.meta for r in extract_binary_meta(df).collect()}
    assert meta["nodef"].get("nodeflib") == "true"
    assert meta["nodef"]["flags_1"] == "0x800"
    assert "nodeflib" not in meta["plain"]

    installed = [("/app/lib/libz.so.1", "tgtZ"), ("/usr/lib/libq.so.9", "tgtQ")]
    edges = {}
    for name in ("nodef", "plain"):
        m = meta[name]
        dirs = elf_search_paths(
            m["runpath"], origin="/app/bin",
            use_default=m.get("nodeflib") != "true",
        )
        cands = {f"{d}/{n}" for n in m["needed"].split("|") for d in dirs}
        edges[name] = {t for p, t in installed if p in cands}
    # NODEFLIB: only the runpath-resolved dep; default-dir dep missed
    assert edges["nodef"] == {"tgtZ"}
    assert edges["plain"] == {"tgtZ", "tgtQ"}


def test_block_by_domain_paths_agree(spark):
    from surfactant_spark.operators.linking import block_by_domain

    urls = spark.createDataFrame(
        [
            (0, "http://www.Bad.COM/x"),
            (1, "http://good.org/y"),
            (2, "https://ads.sub.bad.com:8080/z"),
            (3, "http://notbad.com/w"),   # suffix match is label-wise
        ],
        ["okey", "url"],
    )
    blocked = ["bad.com", "evil.net"]
    lit_rows = {
        r.okey: (r.blocked, r.matched)
        for r in block_by_domain(urls, blocked, "url").collect()
    }
    assert lit_rows[0] == (True, "bad.com")
    assert lit_rows[1] == (False, "")
    # :8080 port must not defeat host extraction; parent domain matches
    assert lit_rows[2] == (True, "bad.com")
    assert lit_rows[3] == (False, "")

    bdf = spark.createDataFrame([(d,) for d in blocked], ["domain"])
    join_out = block_by_domain(urls, bdf, "url")
    join_rows = {
        r.okey: (r.blocked, r.matched) for r in join_out.collect()
    }
    assert join_rows == lit_rows
    plan = join_out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
