"""Crawl-politeness operators: robots.txt parsing and URL matching.

The decode side (``parse_robots_txt``) is a from-scratch parser for
the documented RFC 9309 subset: user-agent groups, Allow/Disallow
path-prefix rules, longest-match-wins with Allow breaking ties;
``*``/``$`` wildcards inside paths are NOT interpreted (documented
non-goal — the rules that use them are carried verbatim and match as
literals).  The match side (``robots_match``) is the scale-relevant
operator: a host equi-join of the URL table against the rules table
plus a per-URL longest-rule window.

Reference parity: the include/exclude predicate family (F4,
surfactant/cmd/generate.py filter flow) re-expressed for crawl
politeness — same shape, per-host rule sets instead of glob lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots_txt(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """robots.txt → ordered [(path_prefix, allow)] for ``agent``.

    Group selection per RFC 9309: the group(s) whose User-agent line
    equals ``agent`` case-insensitively win; if none, the ``*``
    group(s) apply.  Comments (#) and blank lines are ignored; empty
    Disallow means allow-all (contributes no rule).
    """
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    agents: list[str] = []
    rules: list[tuple[str, bool]] = []
    in_group_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                groups.append((agents, rules))
                agents, rules = [], []
                in_group_body = False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            if val:
                rules.append((val, key == "allow"))
        # other keys (crawl-delay, sitemap) end no group and add no rule
    if agents or rules:
        groups.append((agents, rules))
    want = agent.lower()
    exact = [r for a, rs in groups if want in a for r in rs]
    if exact or any(want in a for a, _ in groups):
        return exact
    return [r for a, rs in groups if "*" in a for r in rs]


def robots_rules_frame(spark, robots: dict[str, str], agent: str = "*"):
    """{host: robots.txt text} → rules DataFrame
    (host, prefix, allow) — parsed driver-side (robots corpora are
    dictionary-sized: one small text per host)."""
    rows = [
        (host, prefix, allow)
        for host, txt in robots.items()
        for prefix, allow in parse_robots_txt(txt, agent)
    ]
    return spark.createDataFrame(rows, "host string, prefix string, allow boolean")


def robots_match(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Apply per-host robots rules to a URL table.

    Adds ``allowed`` (boolean; default TRUE when no rule matches) and
    ``rule`` (the winning prefix, '' if none).  Winner per RFC 9309:
    among rules whose prefix is a string prefix of the URL path, the
    LONGEST wins; equal lengths break toward Allow.

    100-TB shape: host/path extraction is a codegen projection; the
    rule decision depends only on (host, path), so winners are
    resolved ONCE per DISTINCT (host, path) — an inner broadcast join
    of the (much smaller) distinct-page frame against the rules plus
    a longest-rule window over matches only — and the full URL table
    just left-joins the decision back (broadcast when the distinct
    frame is small, shuffle otherwise; either way the rule regexes
    and the window never touch the full table, and duplicate URLs
    keep their row count).
    """
    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1)
    )
    path = F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    u = urls.withColumn("_host", host).withColumn("_path", path)
    pages = u.select("_host", "_path").distinct()
    matches = pages.join(
        F.broadcast(rules), pages["_host"] == rules["host"]
    ).where(F.col("_path").startswith(F.col("prefix")))
    w = Window.partitionBy("_host", "_path").orderBy(
        F.desc(F.length("prefix")), F.desc("allow")
    )
    winners = (
        matches.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("_host", "_path", "allow", "prefix")
    )
    return (
        u.join(winners, ["_host", "_path"], "left")
        .select(
            *[F.col(c) for c in urls.columns],
            F.coalesce("allow", F.lit(True)).alias("allowed"),
            F.coalesce("prefix", F.lit("")).alias("rule"),
        )
    )


def resolve_redirects(
    redirects: DataFrame,
    max_hops: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Resolve HTTP redirect chains to their terminal targets — the
    crawl-side canonicalization that precedes URL-keyed dedup (a page
    reachable through 301 hops must collapse onto its final URL).

    Input is an edge list ``src → dst``; a src with several recorded
    targets keeps the smallest (deterministic).  Resolution is
    pointer DOUBLING: after k rounds every chain of length ≤ 2^k is
    fully resolved, so ``max_hops`` (bound, not count) costs
    ⌈log2⌉ self-joins — the connected-components trick applied to a
    functional graph.  Cycles cannot resolve and fall out naturally:
    a node whose final target still has an outgoing redirect after
    the rounds is flagged ``resolved = false`` (its ``final`` column
    is still deterministic — same doubling, any partitioning).

    Output: (url, final, resolved).

    100-TB shape: each round is one equi-join of the mapping against
    itself (pre-partition by the join key at cluster scale) with
    lineage truncated per round; redirect tables are ~1% of the crawl,
    so the frames stay small relative to the page table they serve.
    """
    import math

    base = (
        redirects.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .groupBy("u")
        .agg(F.min("v").alias("v"))
        .localCheckpoint(eager=False)
    )
    cur = base
    for _ in range(max(1, math.ceil(math.log2(max(2, max_hops))))):
        a, b = cur.alias("a"), cur.alias("b")
        cur = (
            a.join(b, F.col("a.v") == F.col("b.u"), "left")
            .select(
                F.col("a.u").alias("u"),
                F.coalesce(F.col("b.v"), F.col("a.v")).alias("v"),
            )
            .localCheckpoint(eager=False)
        )
    srcs = base.select(F.col("u").alias("v")).distinct()
    return (
        cur.join(srcs, "v", "left_anti")
        .select("u", "v", F.lit(True).alias("resolved"))
        .unionByName(
            cur.join(srcs, "v", "left_semi")
            .select("u", "v", F.lit(False).alias("resolved"))
        )
        .select(
            F.col("u").alias("url"),
            F.col("v").alias("final"),
            "resolved",
        )
    )


_SITEMAP_BLOCK = r"(?s)<{tag}>(.*?)</{tag}>"
_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"


def parse_sitemap_entries(
    sitemaps: DataFrame, xml_col: str = "xml", src_col: str = "src"
) -> DataFrame:
    """Sitemap XML documents → (src, kind, loc, lastmod) entries.

    ``<urlset>`` bodies yield ``kind='page'`` rows (one per ``<url>``
    block); ``<sitemapindex>`` bodies yield ``kind='sitemap'`` rows
    (one per ``<sitemap>`` block) that the crawl frontier follows —
    feed them back through the fetch stage and this parser for the
    standard two-level index expansion (composes with
    expand_fixpoint, the reference's work-queue shape at
    surfactant/cmd/generate.py's queue loop).

    Sitemaps are machine-generated XML, so extraction is a pure
    codegen expression pipeline (regexp block scan → per-block field
    extracts); no Python, no shuffle — the plan is scan+project and
    parallelizes with input splits at any scale.  ``lastmod`` is NULL
    when absent; entries without ``<loc>`` are dropped.
    """

    def entries(tag: str, kind: str) -> DataFrame:
        pat = _SITEMAP_BLOCK.format(tag=tag)
        return (
            sitemaps.select(
                F.col(src_col).alias("src"),
                F.explode(
                    F.regexp_extract_all(F.col(xml_col), F.lit(pat), 1)
                ).alias("blk"),
            )
            .select(
                "src",
                F.lit(kind).alias("kind"),
                F.regexp_extract("blk", _LOC_RE, 1).alias("loc"),
                F.nullif(
                    F.regexp_extract("blk", _LASTMOD_RE, 1), F.lit("")
                ).alias("lastmod"),
            )
            .where(F.col("loc") != "")
        )

    return entries("url", "page").unionByName(entries("sitemap", "sitemap"))
