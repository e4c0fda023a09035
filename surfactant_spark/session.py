"""SparkSession factory tuned for the KG-construction workload.

Local sandbox runs on ``local[N]``; on a real cluster the same configs
apply (AQE, Arrow, skew-join) — only master/executor settings change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the sandbox (single JVM, 32 threads, 128 GiB).
# At 100 TB / 1000 executors the same knobs are set by spark-submit conf;
# shuffle.partitions should then be ~2-3x total cores and is overridden
# per-deployment, not hardcoded in operators.
_DEFAULTS = {
    # Let AQE coalesce small shuffle partitions and split skewed ones at
    # runtime.  Explicit salting (operators/skew.py) is still applied for
    # the known-hot keys per the north rule; AQE is the safety net.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for all pandas UDF exchange; cap batch size so page batches
    # with html blobs stay well under executor memory.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
    # Small dims (alias dictionary, nation/region analogs) broadcast.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    # Parquet scans: default 128MB splits are right for the sandbox files.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Always use the sort/serialized shuffle writer, never the bypass
    # writer (r7, guide §2.2).  With R reduce partitions <= 200 the
    # bypass writer opens R files PER MAP TASK (M x R file creates):
    # measured on this box, a 128-map-task -> 32-partition groupBy costs
    # 1.5 s under bypass vs 0.3 s with the sort writer (one data file +
    # index per map task) — and the same 4-5x held on 5M- and 20M-row
    # shuffles.  On a real cluster R is normally > 200 so bypass never
    # engages; forcing the sort writer is therefore safe at every scale
    # while removing the dominant fixed cost of EVERY small shuffle in
    # the sandbox bench.  Env-overridable for deployments that want the
    # bypass behavior back.
    "spark.shuffle.sort.bypassMergeThreshold": os.environ.get(
        "SPARK_GRAFT_BYPASS_MERGE_THRESHOLD", "0"
    ),
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
    # single-JVM local mode: driver heap IS executor memory.  16g is
    # the measured sweet spot on this box — an oversized (48g) heap
    # regressed UDF throughput ~4x (GC/allocation pathology), and big
    # intermediates should flow through parquet stage boundaries, not
    # the heap (localCheckpoint of multi-million-row frames spills).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def get_spark(
    app_name: str = "surfactant_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` sets ``local[N]`` for sandbox runs; pass ``"*"`` for all.
    On a cluster the caller would instead spark-submit with a master URL
    and this function only applies SQL configs.
    """
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(f"local[{cores}]")
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
