"""Graph-snapshot readers — the input-SBOM reader analog (S4,
surfactant/input_readers/cytrics_reader.py:12-14): load a previously
exported JSON graph back into typed nodes/edges DataFrames, tolerantly
(unknown fields dropped, missing fields nulled — the reference's
tolerant deserialization, surfactant/sbomtypes/_sbom.py:80-122)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import EDGES_SCHEMA, NODES_SCHEMA


def read_graph_json(spark: SparkSession, out_dir: str) -> tuple[DataFrame, DataFrame]:
    """Inverse of sinks.write_graph_json.  Reads with explicit schemas
    so extra JSON keys are ignored and absent ones come back null."""
    nodes = spark.read.schema(NODES_SCHEMA).json(f"{out_dir}/nodes.json")
    edges_raw = spark.read.schema(
        "subj string, pred string, obj string"
    ).json(f"{out_dir}/edges.json")
    edges = edges_raw.withColumn("lang", F.lit(None).cast("string"))
    return nodes, edges.select([f.name for f in EDGES_SCHEMA.fields])
