"""Entity canonicalization: union-find over alias edges, hash election.

Surfactant canonicalizes by SHA-256 dedup-merge (one Software entry per
unique content, surfactant/sbomtypes/_sbom.py:205-263) plus symlink
alias accumulation (surfactant/cmd/generate.py:466-498).  The KG analog
has two parts:

1. page nodes — already canonical by construction: ``p:<content_sha256>``
   (groupBy on the hash, no iteration needed);
2. dictionary entities — aliases form an arbitrary graph, so canonical
   IDs need **connected components**.  Spark has no CC primitive; this
   implements min-label propagation with pointer jumping (hash-to-min):
   each iteration (a) takes the min label over the 1-hop neighborhood,
   (b) compresses paths by joining labels onto themselves.  Converges in
   O(log n) iterations; every iteration is localCheckpoint-ed so lineage
   stays flat (replace with reliable ``checkpoint`` + a cluster
   checkpoint dir at production scale).

Canonical ID election is deterministic: the minimum sha256 over the
component's member keys (FIXTURES.md §4), the analog of Surfactant's
keep-the-first-UUID merge (surfactant/sbomtypes/_sbom.py:219-263).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """→ (node, component) where component = min node id (total order on
    the node string) reachable from ``node``.

    Nodes appearing only as isolated (self-edge or absent) should be
    unioned in by the caller; edges here may be sparse.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # (a) min label over neighborhood
        prop = (
            sym.join(labels, sym["v"] == labels["node"], "inner")
            .select(F.col("u").alias("node"), "label")
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # (b) pointer jumping: label ← label(label)
        lab2 = new_labels.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        jumped = (
            new_labels.join(lab2, new_labels["label"] == lab2["pnode"], "left")
            .select(
                "node",
                F.coalesce(F.col("plabel"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def entity_canonical_map(
    spark,
    dict_keys: list[str],
    alias_edge_rows: list[tuple[str, str]],
) -> DataFrame:
    """→ (entity_key, canonical_id, member_keys) for every key in the
    dictionary or the alias-edge graph.

    canonical_id = ``e:`` + min(sha256(member)) over the component.
    """
    edges = spark.createDataFrame(alias_edge_rows or [("_none_", "_none_")], ["a", "b"])
    cc = connected_components(edges)
    keys = spark.createDataFrame([(k,) for k in dict_keys], ["entity_key"])
    all_nodes = (
        cc.select(F.col("node").alias("entity_key"), "component")
        .unionByName(
            keys.join(cc, keys["entity_key"] == cc["node"], "left_anti").select(
                "entity_key", F.col("entity_key").alias("component")
            )
        )
        .where(F.col("entity_key") != "_none_")
    )
    comp_canon = all_nodes.groupBy("component").agg(
        F.concat(F.lit("e:"), F.min(F.sha2(F.col("entity_key"), 256))).alias("canonical_id"),
        F.array_sort(F.collect_set("entity_key")).alias("member_keys"),
    )
    return all_nodes.join(comp_canon, "component").select(
        "entity_key", "canonical_id", "member_keys"
    )
