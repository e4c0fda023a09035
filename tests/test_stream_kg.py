"""Streaming KG maintenance: foreachBatch + incremental pipeline must
converge to the same node/edge tables as a from-scratch batch run."""

import glob
import os
import shutil

from surfactant_spark.plans.catalog import SnapshotCatalog
from surfactant_spark.plans.pipeline import run_pipeline
from surfactant_spark.sources.pages import write_pages_parquet
from surfactant_spark.streaming.stream_pipeline import run_stream_kg_ingest

N_PAGES = 400


def _table(spark, cat, name):
    return sorted(map(tuple, cat.read(spark, name).collect()))


def test_stream_ingest_converges_to_batch_run(spark, tmp_path):
    # page content depends on the corpus size, so generate the FULL
    # corpus once and deliver its part-files in stages
    staging = str(tmp_path / "staging")
    write_pages_parquet(spark, N_PAGES, staging)
    full = spark.read.parquet(staging)
    parts_dir = str(tmp_path / "parts")
    full.repartition(4).write.parquet(parts_dir)
    part_files = sorted(glob.glob(os.path.join(parts_dir, "part-*.parquet")))
    assert len(part_files) == 4

    stream_dir = str(tmp_path / "incoming")
    os.makedirs(stream_dir)
    ckpt = str(tmp_path / "ckpt")
    cat = SnapshotCatalog(str(tmp_path / "cat"))

    # first delivery: half the corpus arrives -> boots the base
    for f in part_files[:2]:
        shutil.copy(f, stream_dir)
    run_stream_kg_ingest(spark, stream_dir, cat, ckpt, max_files_per_trigger=2)
    assert cat.snapshot_info("extracted") is not None
    mid_edges = _table(spark, cat, "edges")

    # second delivery: the rest arrives -> folded in incrementally
    # (checkpoint ensures the first two files are NOT reprocessed)
    for f in part_files[2:]:
        shutil.copy(f, stream_dir)
    run_stream_kg_ingest(spark, stream_dir, cat, ckpt, max_files_per_trigger=2)

    scratch = SnapshotCatalog(str(tmp_path / "scratch"))
    run_pipeline(spark, spark.read.parquet(staging), scratch,
                 corpus_fingerprint="full")
    assert _table(spark, cat, "nodes") == _table(spark, scratch, "nodes")
    got_edges = _table(spark, cat, "edges")
    assert got_edges == _table(spark, scratch, "edges")
    assert got_edges != mid_edges  # the second delivery changed the graph

    # drained restart with no new files is a no-op: no snapshots move
    snaps_before = {
        t: cat.snapshot_info(t)["snapshot"]
        for t in ("extracted", "mentions", "nodes", "edges")
    }
    run_stream_kg_ingest(spark, stream_dir, cat, ckpt, max_files_per_trigger=2)
    snaps_after = {
        t: cat.snapshot_info(t)["snapshot"]
        for t in ("extracted", "mentions", "nodes", "edges")
    }
    assert snaps_after == snaps_before
