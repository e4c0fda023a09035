"""Cross-snapshot graph merge — the SBOM-merge analog.

Surfactant's merge (surfactant/sbomtypes/_sbom.py:314-426) unions two
SBOMs: software entries match by **any** hash (sha256 OR sha1 OR md5,
else UUID), losing entries' UUIDs are remapped onto the keeper, fields
merge with append-if-absent semantics, and edges union with exact-dupe
skip.  The Spark restatement:

1. any-hash matching = a small connected-components instance over
   (id ↔ id) match edges derived from hash-equality joins (hashes can
   chain a-sha256=b-sha256, b-md5=c-md5 → one entity);
2. canonical election = deterministic min(canonical_id) per component
   (the keep-the-first-UUID rule made order-free);
3. field merge = groupBy + first-non-null / sorted set-union (A1,
   surfactant/sbomtypes/_software.py:108-155);
4. edge remap = join both endpoints through the id-map, then
   (subj, pred, obj) dedup (_sbom.py:380-391).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import PRED_INSTALLS
from .canonicalize import connected_components


HASH_COLS = ("sha256", "sha1", "md5")


def _present_hash_cols(nodes: DataFrame) -> list[str]:
    return [c for c in HASH_COLS if c in nodes.columns]


def _match_edges(nodes: DataFrame, hash_cols: list[str] | None = None) -> DataFrame:
    """(a, b) canonical-id pairs that must merge: same non-null value in
    ANY of the hash columns present — the reference's any-hash rule
    (sha256 OR sha1 OR md5, surfactant/sbomtypes/_sbom.py:451-490).
    One equality self-join per hash column, unioned; chains
    (a.sha256=b.sha256, b.md5=c.md5) connect through the downstream
    connected-components pass, matching the reference's transitive
    dedup-merge."""
    if hash_cols is None:
        hash_cols = _present_hash_cols(nodes)
    if not hash_cols:
        # no hash columns at all → nothing can match; empty edge set,
        # not an AttributeError on None.distinct()
        return nodes.sparkSession.createDataFrame(
            [], "a string, b string"
        )
    out = None
    for hc in hash_cols:
        keyed = nodes.where(F.col(hc).isNotNull()).select("canonical_id", hc)
        a, b = keyed.alias("a"), keyed.alias("b")
        pairs = (
            a.join(b, hc)
            .where(F.col("a.canonical_id") < F.col("b.canonical_id"))
            .select(F.col("a.canonical_id").alias("a"), F.col("b.canonical_id").alias("b"))
        )
        out = pairs if out is None else out.unionByName(pairs)
    return out.distinct()


def merge_graphs(
    nodes_a: DataFrame,
    edges_a: DataFrame,
    nodes_b: DataFrame,
    edges_b: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Union two (nodes, edges) snapshots with any-hash dedup-merge and
    edge UUID remap.  Returns (nodes, edges).

    Scale shape: the hash-equality self-join shuffles on sha256 (never
    a cross join); the id-map is component-sized (small) and broadcast
    into the edge remap, so edges — the big table — shuffle only for
    the final dedup groupBy."""
    nodes = nodes_a.unionByName(nodes_b)
    edges = edges_a.unionByName(edges_b)

    match = _match_edges(nodes)
    cc = connected_components(match)  # (node=old_id, component)
    id_map = cc.select(
        F.col("node").alias("old_id"), F.col("component").alias("new_id")
    )

    # remap nodes, then A1 field-merge per surviving id; every hash
    # column present survives the merge (first non-null, deterministic
    # min) so later merges can keep chaining on any hash
    remapped = (
        nodes.join(F.broadcast(id_map), nodes["canonical_id"] == id_map["old_id"], "left")
        .withColumn("mid", F.coalesce(F.col("new_id"), F.col("canonical_id")))
    )
    base = (
        remapped.groupBy("mid")
        .agg(
            F.min("node_type").alias("node_type"),
            *[F.min(hc).alias(hc) for hc in _present_hash_cols(nodes)],
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("names")))).alias("names"),
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("urls")))).alias("urls"),
            F.min("lang").alias("lang"),
        )
    )
    # attr merge: per-key min value (deterministic stand-in for the
    # reference's existing-value-wins, which depends on merge order);
    # done by explode + two-level agg so conflicting keys can't trip
    # map_from_entries' duplicate-key check
    attrs = (
        remapped.select("mid", F.explode(F.map_entries("attrs")).alias("e"))
        .groupBy("mid", F.col("e.key").alias("k"))
        .agg(F.min("e.value").alias("v"))
        .groupBy("mid")
        .agg(F.map_from_entries(F.collect_list(F.struct("k", "v"))).alias("attrs"))
    )
    merged_nodes = (
        base.join(attrs, "mid", "left")
        .withColumn("attrs", F.coalesce(F.col("attrs"), F.create_map().cast("map<string,string>")))
        .withColumnRenamed("mid", "canonical_id")
    )

    remap_subj = edges.join(
        F.broadcast(id_map), edges["subj"] == id_map["old_id"], "left"
    ).select(
        F.coalesce(F.col("new_id"), F.col("subj")).alias("subj"), "pred", "obj", "lang"
    )
    remap_both = remap_subj.join(
        F.broadcast(id_map), remap_subj["obj"] == id_map["old_id"], "left"
    ).select(
        "subj", "pred", F.coalesce(F.col("new_id"), F.col("obj")).alias("obj"), "lang"
    )
    merged_edges = remap_both.groupBy("subj", "pred", "obj").agg(
        F.min("lang").alias("lang")
    )
    return merged_nodes, merged_edges


def hash_collision_check(nodes: DataFrame) -> DataFrame:
    """A2 collision diagnostics (surfactant/sbomtypes/_software.py:157-174):
    same sha256 appearing under multiple canonical ids or node types."""
    return (
        nodes.where(F.col("sha256").isNotNull())
        .groupBy("sha256")
        .agg(
            F.countDistinct("canonical_id").alias("n_ids"),
            F.countDistinct("node_type").alias("n_types"),
        )
        .where((F.col("n_ids") > 1) | (F.col("n_types") > 1))
    )


def graph_roots(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A6 root detection: nodes with no inbound edge
    (surfactant/cmd/merge.py:101) — left anti join."""
    return nodes.join(edges, nodes["canonical_id"] == edges["obj"], "left_anti")


def installs_edges(packages: DataFrame, files: DataFrame) -> DataFrame:
    """``Installs`` edges (J5): package → file whenever a package's
    per-file digest equals a file node's content hash — the reference's
    RPM relationship rule (surfactant/relationships/
    rpmfile_relationship.py:20-65): sha256 packages match on sha256,
    md5 packages through the md5 fallback scan, other algorithms are
    skipped with a warning.

    ``packages``: (pkg_id, file_algo, associated_files map<path,digest>)
    — the :func:`~surfactant_spark.functions.binmeta.parse_rpm` shape.
    ``files``: (file_id, sha256, md5).  Files are hash-unique after
    dedup-merge; if not, the deterministic min(file_id) per digest
    stands in for the reference's first-match scan
    (rpmfile_relationship.py:53-66).

    Scale shape: explode is linear in total package-manifest size; each
    branch is a plain equi-join on the digest (broadcast when the
    package side is small, shuffle-hash otherwise — Catalyst's call);
    no cross join, no driver scan.
    """
    exploded = (
        packages.select(
            "pkg_id",
            F.col("file_algo"),
            F.explode("associated_files").alias("path", "digest"),
        )
        .where(F.col("digest").isNotNull() & (F.col("digest") != ""))
    )
    unknown = exploded.where(~F.col("file_algo").isin("sha256", "md5"))
    out = None
    for algo in ("sha256", "md5"):
        if algo not in files.columns:
            continue
        matched = (
            exploded.where(F.col("file_algo") == algo)
            .join(
                files.where(F.col(algo).isNotNull()).select(
                    F.col(algo).alias("digest"), "file_id"
                ),
                "digest",
            )
            .groupBy("pkg_id", "digest")
            .agg(F.min("file_id").alias("file_id"))
            .select("pkg_id", "file_id")
        )
        out = matched if out is None else out.unionByName(matched)
    if out is None:
        out = exploded.sparkSession.createDataFrame([], "pkg_id string, file_id string")
    # the reference warns per unmatched-algo package; surface the same
    # signal without a driver collect of the big frame
    n_unknown = unknown.select("pkg_id").distinct().limit(1).count()
    if n_unknown:
        import warnings

        warnings.warn(
            "installs_edges: packages with unimplemented file_algo were "
            "skipped (reference parity: rpmfile_relationship.py:46-49)",
            RuntimeWarning,
            stacklevel=2,
        )
    return (
        out.distinct()
        .select(
            F.col("pkg_id").alias("subj"),
            F.lit(PRED_INSTALLS).alias("pred"),
            F.col("file_id").alias("obj"),
        )
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Change-data-capture diff of two table snapshots by key.

    Returns one row per key present in either snapshot with
    ``change`` ∈ {'added', 'removed', 'changed', 'unchanged'} and
    ``changed_cols`` = sorted names of the compare columns whose
    values differ (null-safe; empty array unless 'changed').  The
    snapshot-level complement of the catalog's time travel
    (plans/catalog.py history/read(snapshot=N)): time travel gives
    you the old table, table_diff tells you what the new commit did —
    the reference's incremental-SBOM re-run diff
    (surfactant/cmd/generate.py:308-314) as a first-class operator.

    Scale: ONE full-outer hash join on the key columns; comparisons
    are codegen null-safe predicates, no window, no second shuffle.
    'unchanged' rows (the overwhelming majority of a 100-TB delta)
    are filtered out by default so the output is delta-sized.
    """
    cols = compare_cols or [
        c for c in new.columns if c not in keys and c in old.columns
    ]
    o = old.select(
        *keys,
        *[F.col(c).alias(f"_o_{c}") for c in cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"_n_{c}") for c in cols],
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, on=keys, how="full_outer")
    diff_names = F.filter(
        F.array(
            *[
                F.when(
                    ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")),
                    F.lit(c),
                )
                for c in sorted(cols)
            ]
        ),
        lambda x: x.isNotNull(),
    ) if cols else F.array().cast("array<string>")
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size("changed_cols") > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = (
        j.withColumn(
            "changed_cols",
            F.when(
                F.col("_in_old").isNull() | F.col("_in_new").isNull(),
                F.array().cast("array<string>"),
            ).otherwise(diff_names),
        )
        .withColumn("change", change)
        .select(*keys, "change", "changed_cols")
    )
    if not include_unchanged:
        out = out.where(F.col("change") != "unchanged")
    return out
