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
