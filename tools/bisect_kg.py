"""Per-stage wall-time bisect of the kg_pipeline bench.

The r2 driver bench measured kg_pipeline once (50.2 s at 100k pages) vs
r1's 36.1 s; this tool splits the pipeline into its stage boundaries and
repeats each full run so the delta can be attributed instead of guessed.

Usage: python tools/bisect_kg.py [n_pages] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time


def run_once(spark, n_pages: int, cores: int, variant: str) -> dict:
    from surfactant_spark.dictionary import alias_edges, compile_dictionary
    from surfactant_spark.operators.canonicalize import entity_canonical_map
    from surfactant_spark.operators.extract import extract_pages
    from surfactant_spark.operators.linking import build_edges, build_nodes
    from surfactant_spark.operators.mentions import (
        content_for_detection,
        detect_mentions,
        unique_content,
    )
    from surfactant_spark.sources.pages import synth_pages

    stages: dict[str, float] = {}

    def mark(name: str, t0: float) -> float:
        t1 = time.monotonic()
        stages[name] = round(t1 - t0, 3)
        return t1

    t = time.monotonic()
    compiled = compile_dictionary()
    emap = entity_canonical_map(
        spark, sorted({p.entity_key for p in compiled.patterns}), alias_edges()
    ).cache()
    emap.count()
    t = mark("dict+emap", t)

    pages = synth_pages(spark, n_pages, partitions=4 * cores)
    ext = extract_pages(pages).cache()
    ext.count()
    t = mark("synth+extract", t)

    if variant == "no_prededup":
        content, m_unique = ext.select("content_sha256", "lang", "text"), False
    elif variant == "always_dedup":
        content, m_unique = unique_content(ext), True
    else:
        from surfactant_spark.operators.mentions import CONTENT_DEDUP_THRESHOLD
        from surfactant_spark.stats import column_stats, dup_rate

        cstats = column_stats(ext, "content_sha256")
        content = content_for_detection(ext, stats=cstats)
        m_unique = dup_rate(cstats) >= CONTENT_DEDUP_THRESHOLD
    t = mark("prededup_decision", t)

    windowed = variant != "fulltext_confirm"
    mentions = detect_mentions(content, compiled, windowed_confirm=windowed).cache()
    mentions.count()
    t = mark("detect_mentions", t)

    if variant == "edges_global_dedup":
        # the r3 formulation: one groupBy(subj,pred,obj) over the union
        from surfactant_spark.operators.linking import (
            contains_edges,
            dedup_edges,
            links_to_edges,
            uses_edges,
        )

        edges = dedup_edges(
            uses_edges(mentions, emap)
            .unionByName(links_to_edges(ext))
            .unionByName(contains_edges(ext))
        )
    else:
        edges = build_edges(ext, mentions, emap, mentions_unique=m_unique)
    edges.write.format("noop").mode("overwrite").save()
    t = mark("build_edges", t)

    nodes = build_nodes(ext, mentions, emap)
    nodes.write.format("noop").mode("overwrite").save()
    t = mark("build_nodes", t)

    ext.unpersist()
    mentions.unpersist()
    emap.unpersist()
    stages["total"] = round(sum(stages.values()), 3)
    return stages


def steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    variants = sys.argv[3].split(",") if len(sys.argv) > 3 else ["default"]
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from surfactant_spark.session import get_spark

    spark = get_spark(app_name="bisect_kg", cores=cores,
                      shuffle_partitions=max(2 * cores, 8))
    spark.range(1000).selectExpr("sum(id)").collect()
    # python-worker warmup (pandas/pyarrow import cost, see memory notes)
    spark.range(4 * cores).repartition(4 * cores).mapInPandas(
        lambda it: it, "id long"
    ).count()

    out = []
    for rep in range(reps):
        for variant in variants:
            s0 = steal_jiffies()
            stages = run_once(spark, n_pages, cores, variant)
            out.append({
                "rep": rep, "variant": variant, "stages": stages,
                "steal": steal_jiffies() - s0,
            })
            print(json.dumps(out[-1]), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
