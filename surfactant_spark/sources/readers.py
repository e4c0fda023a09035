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


def read_graph_csv(spark: SparkSession, out_dir: str) -> DataFrame:
    """Inverse of sinks.write_graph_csv — the round-trip the reference
    has via cytrics_reader after csv_writer (S4+S6,
    surfactant/output/csv_writer.py:24-87,
    surfactant/input_readers/cytrics_reader.py:12-14).

    The CSV shape is one row per url (exploded) with names ';'-joined
    and two attrs pulled into columns, so the reader re-groups by id,
    re-collects the url array, splits names, and rebuilds the attrs map
    — write → read → write is a fixed point at the CSV-row level
    (node-level attrs beyond version/captureStart are lossy by design,
    like the reference's CSV)."""
    raw = spark.read.schema(
        "id string, type string, name string, url string, lang string,"
        " version string, capture_start string"
    ).option("header", True).csv(f"{out_dir}/nodes.csv")
    grouped = raw.groupBy("id").agg(
        F.min("type").alias("node_type"),
        F.min("name").alias("name"),
        F.sort_array(F.collect_set("url")).alias("urls"),
        F.min("lang").alias("lang"),
        F.min("version").alias("version"),
        F.min("capture_start").alias("capture_start"),
    )
    attr_entries = F.filter(
        F.array(
            F.when(F.col("version").isNotNull(),
                   F.struct(F.lit("version").alias("key"), F.col("version").alias("value"))),
            F.when(F.col("capture_start").isNotNull(),
                   F.struct(F.lit("captureStart").alias("key"),
                            F.col("capture_start").alias("value"))),
        ),
        lambda e: e.isNotNull(),
    )
    return grouped.select(
        F.col("id").alias("canonical_id"),
        "node_type",
        F.lit(None).cast("string").alias("sha256"),
        F.when(F.col("name").isNotNull(), F.split("name", ";"))
        .otherwise(F.array().cast("array<string>"))
        .alias("names"),
        "urls",
        "lang",
        F.map_from_entries(attr_entries).alias("attrs"),
    )
