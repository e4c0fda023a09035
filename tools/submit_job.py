"""spark-submit entry point (north rule: ``spark-submit --py-files``).

Runs the full checkpointed KG pipeline against a pages parquet and
prints one JSON line of counts + stage info.  The engine package is
NOT expected on the PYTHONPATH — it arrives via
``--py-files dist/surfactant_spark.zip`` (spark-submit prepends the
zip to sys.path on the driver and ships it to executors), which is
exactly the cluster deployment shape:

    spark-submit --master <cluster> \
        --py-files dist/surfactant_spark.zip \
        tools/submit_job.py PAGES_PARQUET CATALOG_DIR

Master/executor settings come from spark-submit conf, not from code:
this entry only applies SQL-level settings (AQE, Arrow) on top of
whatever session spark-submit builds.
"""

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    pages_path, catalog_dir = sys.argv[1], sys.argv[2]
    # imported here so the failure mode of a missing --py-files zip is
    # an obvious ImportError naming the package
    from surfactant_spark.plans.catalog import SnapshotCatalog
    from surfactant_spark.plans.pipeline import run_pipeline
    from surfactant_spark.session import _DEFAULTS

    builder = SparkSession.builder.appName("surfactant_spark-submit")
    for k, v in _DEFAULTS.items():
        if not k.startswith("spark.driver."):  # driver conf is submit-time
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    res = run_pipeline(
        spark,
        spark.read.parquet(pages_path),
        SnapshotCatalog(catalog_dir),
        run_id="spark-submit",
        corpus_fingerprint=pages_path,
    )
    print(json.dumps({
        "nodes": res.nodes.count(),
        "edges": res.edges.count(),
        "stages_run": res.stages_run,
        "stages_skipped": res.stages_skipped,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
