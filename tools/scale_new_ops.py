"""Scale probe for the round-6 operator families: content-defined
chunking, DSIR selection, hard-negative/ANN seams, and HyperBall —
on a synthetic 1M-document corpus (same deterministic generator as
tools/scale_training_ops.py) plus a 1M-edge graph for HyperBall.

Usage: python tools/scale_new_ops.py [n_docs]

Each operator's 100-TB claim is the SHAPE (no cross join, bounded
state, map-side combine); this probe evidences the constant factors at
1M scale on one box.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_training_ops import synth_docs, timed  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from surfactant_spark.operators.dedup import bcubed_scores, cdc_chunks
    from surfactant_spark.operators.dsir import bucket_counts, dsir_select, log_ratios
    from surfactant_spark.operators.graphquery import hyperball_harmonic
    from surfactant_spark.operators.indexing import pmi_collocations
    from surfactant_spark.session import get_spark

    spark = get_spark(app_name="scale_new_ops", cores=32,
                      shuffle_partitions=64)
    docs = synth_docs(spark, n).localCheckpoint(eager=True)
    n_docs = docs.count()
    print(f"corpus: {n_docs} docs", flush=True)
    results: dict = {"n_docs": n_docs}

    timed(
        "cdc_chunks",
        lambda: {"chunks": cdc_chunks(docs).count()},
        results,
    )

    def dsir():
        # fit on the corpus itself (two ≤256-row aggs), then score+select
        tgt = {
            r.bucket: r.cnt
            for r in bucket_counts(docs.where(F.col("doc_id") % 3 == 0)).collect()
        }
        raw = {r.bucket: r.cnt for r in bucket_counts(docs).collect()}
        lr = log_ratios(tgt, raw)
        return {"selected": dsir_select(docs, lr, k=1000).count()}

    timed("dsir_fit_and_select", dsir, results)

    timed(
        "pmi_collocations",
        lambda: {"pairs": pmi_collocations(docs, min_count=3, k=100).count()},
        results,
    )

    def bcubed():
        items = docs.select(
            "doc_id",
            (F.col("doc_id") % 97).alias("pred"),
            (F.col("doc_id") % 101).alias("truth"),
        )
        (row,) = bcubed_scores(items).collect()
        return {"f1_x1e6": row.b3_f1_x1e6}

    timed("bcubed_scores", bcubed, results)

    def hyperball():
        m = n  # 1 edge per doc id → functional graph with n edges
        e = spark.range(m).select(
            F.concat(F.lit("n"), (F.col("id") % (m // 4)).cast("string")).alias("src"),
            F.concat(F.lit("n"), ((F.col("id") * 13 + 7) % (m // 4)).cast("string")).alias("dst"),
        )
        return {"nodes": hyperball_harmonic(e, rounds=3).count()}

    timed("hyperball_harmonic", hyperball, results)

    results["docs_per_sec"] = {
        k: round(n_docs / v["sec"], 1)
        for k, v in results.items()
        if isinstance(v, dict) and "sec" in v
    }
    print(json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
