"""Shuffle-volume audit for the edges stage.

Wall time at sandbox scale is noise-dominated (host steal storms) and
per-shuffle fixed costs favor FEWER shuffles regardless of volume; what
predicts 100-TB behavior is BYTES SHUFFLED.  This tool runs the r3
edges formulation (one groupBy(subj,pred,obj) over the 3-family union)
and the r4 one (per-family dedup, shuffle-free union) on the same
synthetic corpus and reports total shuffle read/write bytes per
variant from the Spark status REST API.

Usage: PYTHONPATH=/root/repo python tools/shuffle_audit.py [n_pages] [dup_factor]
``dup_factor`` k > 1 replicates every page under k url variants
(identical content) — the 30-60% duplication regime of a real crawl,
where the per-family formulation also skips the Uses dedup shuffle
entirely.  Prints one JSON line: {"n_pages": N, "variants": {name:
{"shuffle_write": B, "shuffle_read": B, "sec": S}}}
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stages(ui: str):
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from surfactant_spark.dictionary import alias_edges, compile_dictionary
    from surfactant_spark.operators.canonicalize import entity_canonical_map
    from surfactant_spark.operators.extract import extract_pages
    from surfactant_spark.operators.linking import (
        build_edges,
        contains_edges,
        dedup_edges,
        links_to_edges,
        uses_edges,
    )
    from surfactant_spark.operators.mentions import (
        CONTENT_DEDUP_THRESHOLD,
        content_for_detection,
        detect_mentions,
    )
    from surfactant_spark.session import get_spark
    from surfactant_spark.sources.pages import synth_pages
    from surfactant_spark.stats import column_stats, dup_rate

    spark = get_spark(
        app_name="shuffle_audit", cores=cores,
        shuffle_partitions=max(2 * cores, 8),
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl
    spark.range(4 * cores).repartition(4 * cores).mapInPandas(
        lambda it: it, "id long"
    ).count()

    compiled = compile_dictionary()
    emap = entity_canonical_map(
        spark, sorted({p.entity_key for p in compiled.patterns}), alias_edges()
    ).cache()
    emap.count()
    dup_factor = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    pages = synth_pages(spark, n_pages, partitions=4 * cores)
    ext = extract_pages(pages)
    if dup_factor > 1:
        from pyspark.sql import functions as F

        k = spark.range(dup_factor).select(F.col("id").alias("_k"))
        ext = ext.crossJoin(k).withColumn(
            "url",
            F.when(F.col("_k") == 0, F.col("url")).otherwise(
                F.concat(F.col("url"), F.lit("?v="), F.col("_k"))
            ),
        ).drop("_k")
    ext = ext.cache()
    ext.count()
    cstats = column_stats(ext, "content_sha256")
    m_unique = dup_rate(cstats) >= CONTENT_DEDUP_THRESHOLD
    mentions = detect_mentions(content_for_detection(ext, stats=cstats), compiled).cache()
    mentions.count()

    def global_dedup():
        return dedup_edges(
            uses_edges(mentions, emap)
            .unionByName(links_to_edges(ext))
            .unionByName(contains_edges(ext))
        )

    def per_family():
        return build_edges(ext, mentions, emap, mentions_unique=m_unique)

    out = {"n_pages": n_pages, "mentions_unique": m_unique, "variants": {}}
    for name, fn in (("global_dedup_r3", global_dedup), ("per_family_r4", per_family)):
        seen = {s["stageId"] for s in _stages(ui)}
        t0 = time.monotonic()
        fn().write.format("noop").mode("overwrite").save()
        sec = time.monotonic() - t0
        new = [s for s in _stages(ui) if s["stageId"] not in seen]
        out["variants"][name] = {
            "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in new),
            "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in new),
            "stages": len(new),
            "sec": round(sec, 3),
        }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
