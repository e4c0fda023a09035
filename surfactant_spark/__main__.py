"""CLI entry points — the `surfactant generate / merge` analogs
(reference surfactant/__main__.py:75, cmd/generate.py:197-290,
cmd/merge.py:85-133) over the Spark pipeline:

    python -m surfactant_spark generate PAGES_PARQUET OUT_DIR
        [--catalog DIR] [--run-id ID] [--format json|csv|cyclonedx|spdx]
        [--no-resume] [--cores N]
    python -m surfactant_spark merge OUT_DIR IN_DIR1 IN_DIR2 [--cores N]
    python -m surfactant_spark query NAME [--sf-dir DIR] [--limit N]

`generate` scans a pages parquet (url, warc_ts, html …), runs the
extract → mention → canonicalize → relate pipeline with snapshot
resume, and writes the graph in the chosen sink format.  `merge`
unions two graph-JSON exports with any-hash dedup-merge and edge
remap.  `query` runs one registered operator and prints JSON lines.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from .session import get_spark

    return get_spark(app_name=f"surfactant_spark-{args.cmd}", cores=args.cores)


def cmd_generate(args) -> int:
    from .plans.catalog import SnapshotCatalog
    from .plans.pipeline import run_pipeline
    from .sources import sinks

    spark = _spark(args)
    pages = spark.read.parquet(args.pages)
    catalog = SnapshotCatalog(args.catalog or f"{args.out}/_catalog")
    res = run_pipeline(
        spark,
        pages,
        catalog,
        run_id=args.run_id,
        corpus_fingerprint=args.corpus_fingerprint or args.pages,
        resume=not args.no_resume,
    )
    if args.format == "json":
        sinks.write_graph_json(res.nodes, res.edges, args.out)
    elif args.format == "csv":
        sinks.write_graph_csv(res.nodes, args.out)
    elif args.format == "cyclonedx":
        sinks.write_cyclonedx_json(res.nodes, res.edges, f"{args.out}/bom.cdx.json")
    elif args.format == "spdx":
        sinks.write_spdx_json(res.nodes, res.edges, f"{args.out}/bom.spdx.json")
    print(
        json.dumps(
            {
                "nodes": res.nodes.count(),
                "edges": res.edges.count(),
                "stages_run": res.stages_run,
                "stages_skipped": res.stages_skipped,
                "out": args.out,
                "format": args.format,
            }
        )
    )
    return 0


def cmd_merge(args) -> int:
    from .operators.merge import merge_graphs
    from .sources.readers import read_graph_json
    from .sources.sinks import write_graph_json

    spark = _spark(args)
    nodes_a, edges_a = read_graph_json(spark, args.inputs[0])
    nodes_b, edges_b = read_graph_json(spark, args.inputs[1])
    nodes, edges = merge_graphs(nodes_a, edges_a, nodes_b, edges_b)
    write_graph_json(nodes, edges, args.out)
    print(json.dumps({"nodes": nodes.count(), "edges": edges.count(),
                      "out": args.out}))
    return 0


def cmd_query(args) -> int:
    from . import queries as q

    registry = q.queries()
    if args.name not in registry:
        print(f"unknown query {args.name!r}; available: "
              + " ".join(sorted(registry)), file=sys.stderr)
        return 2
    spark = _spark(args)
    df = registry[args.name](spark, args.sf_dir)
    for row in df.limit(args.limit).toJSON().collect():
        print(row)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="surfactant_spark")
    p.add_argument("--cores", default=None, help="local[N] cores (default: env/all)")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="pages parquet → knowledge graph")
    g.add_argument("pages")
    g.add_argument("out")
    g.add_argument("--catalog", default=None)
    g.add_argument("--run-id", default="cli-run")
    g.add_argument("--corpus-fingerprint", default=None)
    g.add_argument("--format", default="json",
                   choices=["json", "csv", "cyclonedx", "spdx"])
    g.add_argument("--no-resume", action="store_true")
    g.set_defaults(fn=cmd_generate)

    m = sub.add_parser("merge", help="union two graph-JSON exports")
    m.add_argument("out")
    m.add_argument("inputs", nargs=2)
    m.set_defaults(fn=cmd_merge)

    qp = sub.add_parser("query", help="run a registered operator")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    qp.add_argument("--limit", type=int, default=20)
    qp.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
