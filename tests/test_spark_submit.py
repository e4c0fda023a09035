"""North-rule deployment shape: the pipeline runs under REAL
``spark-submit --py-files dist/surfactant_spark.zip`` with the repo
absent from PYTHONPATH — the engine code reaches the driver and
executors only through the zip, exactly as on a cluster."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles_pipeline(spark, tmp_path):
    from surfactant_spark.sources.pages import write_pages_parquet
    from tools.make_pyfiles import build

    pages = str(tmp_path / "pages")
    write_pages_parquet(spark, 300, pages)
    zip_path = build(str(tmp_path / "surfactant_spark.zip"))
    assert os.path.getsize(zip_path) > 10_000

    from pyspark import find_spark_home

    submit = os.path.join(
        find_spark_home._find_spark_home(), "bin", "spark-submit"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    res = subprocess.run(
        [submit, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "submit_job.py"),
         pages, str(tmp_path / "catalog")],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-3000:]
    rec = json.loads([l for l in res.stdout.splitlines() if l.startswith("{")][-1])
    assert rec["nodes"] > 0 and rec["edges"] > 0
    assert set(rec["stages_run"]) == {
        "extracted", "mentions", "entity_map", "nodes", "edges"
    }
