"""Scale probe for the round-5 training-data operator families:
run the heavy new operators on a synthetic 1M-document corpus
(deterministic, ~50 tokens/doc, 30% near-duplicates) and report
wall times + output sizes.

Usage: python tools/scale_training_ops.py [n_docs]

The corpus is generated IN Spark (spark.range + column expressions —
no driver-side data), so the probe measures operator cost, not
ingestion.  Near-dup structure: docs with id % 10 in {7, 8, 9} are
one-token variants of the id - (id % 10) base doc, giving LSH/CC a
real 30%-duplicate clustering workload at 1M scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def synth_docs(spark, n: int):
    """Deterministic documents frame: 50 doc-unique tokens per doc;
    ids with id%10 in {7,8,9} repeat their decade-base doc's text plus
    one marker token (a 4-member near-dup family per decade, 30% of
    the corpus)."""
    base = F.floor(F.col("id") / 10) * 10
    eff = F.when(F.col("id") % 10 >= 7, base).otherwise(F.col("id"))
    # tokens are doc-unique (d<eff>w<j>): distinct docs share ZERO
    # shingles, near-dup family members share all of them — two
    # earlier modular-vocabulary attempts both chained unrelated docs
    # into giant LSH components (residue collisions of the stride),
    # which is a corpus-design bug, not an operator property.  The
    # price is a 50·n-term vocabulary, which doubles as a genuine
    # stress test for the negative-sampling prefix sum.
    words = F.transform(
        F.sequence(F.lit(0), F.lit(49)),
        lambda j: F.concat(
            F.lit("d"), eff.cast("string"), F.lit("w"), j.cast("string")
        ),
    )
    text = F.concat_ws(" ", words)
    text = F.when(
        F.col("id") % 10 >= 7,
        F.concat(text, F.lit(" variant"), (F.col("id") % 10).cast("string")),
    ).otherwise(text)
    return spark.range(n).select(
        F.col("id").alias("doc_id"), text.alias("text"),
        F.lit("en").alias("lang"),
    )


def timed(label: str, fn, results: dict):
    t0 = time.monotonic()
    out = fn()
    dt = round(time.monotonic() - t0, 2)
    results[label] = {"sec": dt, **out}
    print(f"{label}: {dt}s {out}", flush=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from surfactant_spark.operators.dedup import (
        duplicate_spans,
        keep_best_per_group,
    )
    from surfactant_spark.operators.ids import pack_sequences
    from surfactant_spark.operators.indexing import negative_sampling_ranges
    from surfactant_spark.session import get_spark

    spark = get_spark(app_name="scale_training_ops", cores=32,
                      shuffle_partitions=64)
    docs = synth_docs(spark, n).localCheckpoint(eager=True)
    n_docs = docs.count()
    print(f"corpus: {n_docs} docs", flush=True)

    results: dict = {"n_docs": n_docs}

    timed(
        "keep_best_per_group",
        lambda: {
            "kept": keep_best_per_group(docs).where("kept").count()
        },
        results,
    )
    timed(
        "duplicate_spans",
        lambda: {"spans": duplicate_spans(docs, k=8).count()},
        results,
    )
    timed(
        "pack_sequences",
        lambda: {
            "docs_planned": pack_sequences(docs, block=2048).count()
        },
        results,
    )
    timed(
        "negative_sampling_ranges",
        lambda: {"vocab": negative_sampling_ranges(docs).count()},
        results,
    )
    results["docs_per_sec"] = {
        k: round(n_docs / v["sec"], 1)
        for k, v in results.items()
        if isinstance(v, dict) and "sec" in v
    }
    print(json.dumps(results), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
