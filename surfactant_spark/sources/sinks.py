"""Export sinks for the graph tables — S5 (JSON) / S6 (CSV) analogs.

The reference's cytrics writer re-derives the relationship array from
graph edges (surfactant/sbomtypes/_sbom.py:590-620); its CSV writer
explodes one row per install path and pulls nested fields up
(surfactant/output/csv_writer.py:24-87).  Spark versions are plain
DataFrame writes so they parallelize per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_graph_json(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """One JSON object per line: nodes with nested attrs, edges as bare
    triples — the cytrics-shaped export (S5)."""
    nodes.write.mode("overwrite").json(f"{out_dir}/nodes.json")
    edges.select("subj", "pred", "obj").write.mode("overwrite").json(
        f"{out_dir}/edges.json"
    )


def nodes_to_csv_rows(nodes: DataFrame) -> DataFrame:
    """Flatten for CSV (S6): one row per url (explode, csv_writer.py:54-60),
    renamed columns (65-73), nested attr pulled up."""
    return (
        nodes.select(
            F.col("canonical_id").alias("id"),
            F.col("node_type").alias("type"),
            F.concat_ws(";", "names").alias("name"),
            F.explode_outer("urls").alias("url"),
            "lang",
            F.col("attrs").getItem("version").alias("version"),
            F.col("attrs").getItem("captureStart").alias("capture_start"),
        )
    )


def write_graph_csv(nodes: DataFrame, out_dir: str) -> None:
    nodes_to_csv_rows(nodes).write.mode("overwrite").option("header", True).csv(
        f"{out_dir}/nodes.csv"
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """North-rule storage layout: nodes/edges saved ``bucketBy`` the
    join key (entity hash) so downstream node⋈edge joins are
    CO-LOCATED — Spark reads matching buckets pairwise and the join
    plan carries no shuffle Exchange on either side.  At 100 TB this is
    the difference between re-shuffling the edge table on every query
    and never shuffling it; the bucket count is the cluster-level knob
    (≈ total cores).  ``path`` makes the table external (explicit
    location) — the Iceberg-bucket-partitioning stand-in."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


# ---------------------------------------------------------------------------
# Standards exports: CycloneDX 1.5 / SPDX 2.3 JSON (S7/S8 analogs,
# surfactant/output/cyclonedx_writer.py:19-60, spdx_writer.py:31-62).
# The reference leans on the cyclonedx/spdx libraries; neither ships in
# this container, so these emit the public JSON document shapes
# directly.  Both formats are single-document by definition (like the
# reference's one output file), so rows stream through the driver via
# toLocalIterator — bounded memory, but inherently not a distributed
# write.  At 10^12-node scale export shards per partition instead; the
# graph tables themselves stay in parquet/Iceberg.
# ---------------------------------------------------------------------------

_NODE_TYPE_TO_CDX = {"page": "data", "entity": "library", "host": "application"}
_PRED_TO_SPDX = {"Contains": "CONTAINS", "Uses": "DEPENDS_ON", "LinksTo": "OTHER"}


def _spdx_id(canonical_id: str) -> str:
    import re

    return "SPDXRef-" + re.sub(r"[^A-Za-z0-9.-]", "-", canonical_id)


def write_cyclonedx_json(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    """CycloneDX 1.5 JSON: one component per node (bom-ref = canonical
    id, sha256 hash when present), one dependencies entry per subject
    with its dependsOn list."""
    import json

    components = []
    for r in nodes.select(
        "canonical_id", "node_type", "names", "sha256",
        F.col("attrs").getItem("version").alias("version"),
    ).toLocalIterator():
        comp = {
            "type": _NODE_TYPE_TO_CDX.get(r.node_type, "library"),
            "bom-ref": r.canonical_id,
            "name": (list(r.names) or [r.canonical_id])[0],
        }
        if r.version:
            comp["version"] = r.version
        if r.sha256:
            comp["hashes"] = [{"alg": "SHA-256", "content": r.sha256}]
        components.append(comp)
    deps = [
        {"ref": r.subj, "dependsOn": sorted(r.objs)}
        for r in edges.groupBy("subj")
        .agg(F.collect_set("obj").alias("objs"))
        .toLocalIterator()
    ]
    doc = {
        "bomFormat": "CycloneDX",
        "specVersion": "1.5",
        "version": 1,
        "components": sorted(components, key=lambda c: c["bom-ref"]),
        "dependencies": sorted(deps, key=lambda d: d["ref"]),
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)


def write_spdx_json(nodes: DataFrame, edges: DataFrame, path: str,
                    doc_name: str = "surfactant-spark-graph") -> None:
    """SPDX 2.3 JSON: one package per node (SPDXID sanitized from the
    canonical id, SHA256 checksum when present) and typed relationships
    (Contains→CONTAINS, Uses→DEPENDS_ON, else OTHER), plus the
    document-describes roots."""
    import json

    packages, describes = [], []
    for r in nodes.select(
        "canonical_id", "names", "sha256",
        F.col("attrs").getItem("version").alias("version"),
    ).toLocalIterator():
        pkg = {
            "SPDXID": _spdx_id(r.canonical_id),
            "name": (list(r.names) or [r.canonical_id])[0],
            "downloadLocation": "NOASSERTION",
        }
        if r.version:
            pkg["versionInfo"] = r.version
        if r.sha256:
            pkg["checksums"] = [{"algorithm": "SHA256", "checksumValue": r.sha256}]
        packages.append(pkg)
        describes.append(pkg["SPDXID"])
    relationships = [
        {
            "spdxElementId": _spdx_id(r.subj),
            "relationshipType": _PRED_TO_SPDX.get(r.pred, "OTHER"),
            "relatedSpdxElement": _spdx_id(r.obj),
        }
        for r in edges.select("subj", "pred", "obj").toLocalIterator()
    ]
    doc = {
        "spdxVersion": "SPDX-2.3",
        "dataLicense": "CC0-1.0",
        "SPDXID": "SPDXRef-DOCUMENT",
        "name": doc_name,
        "documentNamespace": f"https://example.invalid/spdx/{doc_name}",
        "packages": sorted(packages, key=lambda p: p["SPDXID"]),
        "relationships": sorted(
            relationships,
            key=lambda x: (x["spdxElementId"], x["relationshipType"],
                           x["relatedSpdxElement"]),
        ),
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
