"""CLI entry points — the `surfactant generate / merge` analogs
(reference surfactant/__main__.py:75, cmd/generate.py:197-290,
cmd/merge.py:85-133) over the Spark pipeline:

    python -m surfactant_spark generate PAGES_PARQUET OUT_DIR
        [--catalog DIR] [--run-id ID] [--format json|csv|cyclonedx|spdx]
        [--no-resume] [--cores N]
    python -m surfactant_spark merge OUT_DIR IN_DIR1 IN_DIR2 [--cores N]
    python -m surfactant_spark query NAME [--sf-dir DIR] [--limit N]
    python -m surfactant_spark load GRAPH_JSON_DIR [--session DIR]
    python -m surfactant_spark save OUT [--session DIR] [--format ...]
    python -m surfactant_spark find [--session DIR] [--node-type T]
        [--name-contains S] [--url-contains S] [--sha256 H] [--limit N]
    python -m surfactant_spark config SECTION.OPTION [VALUE...]

`generate` scans a pages parquet (url, warc_ts, html …), runs the
extract → mention → canonicalize → relate pipeline with snapshot
resume, and writes the graph in the chosen sink format.  `merge`
unions two graph-JSON exports with any-hash dedup-merge and edge
remap.  `query` runs one registered operator and prints JSON lines.

`load`/`save`/`find` are the reference's cli session commands
(surfactant/cmd/cli_commands/cli_load.py, cli_save.py, cli.py): `load`
persists a graph export as the WORKING graph in a session directory
(parquet — the serialized-SBOM working file analog), `find` queries the
working graph across invocations without reloading the export, and
`save` writes the working graph back out in any sink format.
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
    if getattr(args, "warc", False):
        from .sources.warc import read_warc, warc_to_pages

        pages = warc_to_pages(read_warc(spark, args.pages))
    else:
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


DEFAULT_SESSION = ".surfactant_spark_session"


def cmd_config(args) -> int:
    """`surfactant config KEY [VALUE...]` analog
    (surfactant/cmd/config.py): get with KEY alone, set with values
    ('true'/'false' coerced to bool; multiple values → list)."""
    from .configmanager import ConfigManager, coerce_value

    cm = ConfigManager(config_dir=args.config_dir)
    if "." not in args.key:
        print("Invalid KEY given. Is it in the format 'section.option'?",
              file=sys.stderr)
        return 2
    section, option = args.key.split(".", 1)
    if not args.values:
        result = cm.get(section, option)
        if result is None:
            print(f"Configuration '{args.key}' not found.")
        else:
            print(f"{args.key} = {result}")
        return 0
    vals = [coerce_value(v) for v in args.values]
    final = vals[0] if len(vals) == 1 else vals
    cm.set(section, option, final)
    print(f"Configuration '{args.key}' set to '{final}'.")
    return 0


def _session_dir(args) -> str:
    """--session flag, else the configured cli.session_dir, else the
    local default — the reference's data-dir resolution order."""
    if args.session is not None:
        return args.session
    from .configmanager import ConfigManager

    return ConfigManager().get("cli", "session_dir", DEFAULT_SESSION)


def _read_session(spark, session_dir: str):
    import os

    if not os.path.exists(f"{session_dir}/nodes.parquet"):
        print(
            f"no working graph in {session_dir!r}; run "
            "`surfactant_spark load <graph-json-dir>` first",
            file=sys.stderr,
        )
        return None, None
    return (
        spark.read.parquet(f"{session_dir}/nodes.parquet"),
        spark.read.parquet(f"{session_dir}/edges.parquet"),
    )


def cmd_load(args) -> int:
    """cli_load.py analog: graph export → persisted working graph."""
    from .sources.readers import read_graph_json

    sess = _session_dir(args)
    spark = _spark(args)
    nodes, edges = read_graph_json(spark, args.input)
    nodes.write.mode("overwrite").parquet(f"{sess}/nodes.parquet")
    edges.write.mode("overwrite").parquet(f"{sess}/edges.parquet")
    n, e = (
        spark.read.parquet(f"{sess}/nodes.parquet").count(),
        spark.read.parquet(f"{sess}/edges.parquet").count(),
    )
    print(json.dumps({"session": sess, "nodes": n, "edges": e}))
    return 0


def cmd_save(args) -> int:
    """cli_save.py analog: working graph → chosen sink format."""
    from .sources import sinks

    spark = _spark(args)
    nodes, edges = _read_session(spark, _session_dir(args))
    if nodes is None:
        return 2
    if args.format == "json":
        sinks.write_graph_json(nodes, edges, args.out)
    elif args.format == "csv":
        sinks.write_graph_csv(nodes, args.out)
    elif args.format == "cyclonedx":
        sinks.write_cyclonedx_json(nodes, edges, args.out)
    elif args.format == "spdx":
        sinks.write_spdx_json(nodes, edges, args.out)
    print(json.dumps({"out": args.out, "format": args.format,
                      "nodes": nodes.count(), "edges": edges.count()}))
    return 0


def cmd_find(args) -> int:
    """cli.py find analog over the persisted working graph."""
    from .operators.graphquery import find_nodes

    spark = _spark(args)
    nodes, _edges = _read_session(spark, _session_dir(args))
    if nodes is None:
        return 2
    found = find_nodes(
        nodes,
        node_type=args.node_type,
        name_contains=args.name_contains,
        url_contains=args.url_contains,
        sha256=args.sha256,
    )
    for row in found.orderBy("canonical_id").limit(args.limit).toJSON().collect():
        print(row)
    return 0


def cmd_corpus(args) -> int:
    """documents parquet → cleaned training corpus (dedup keep-best,
    Gopher gate, PII scrub, sequence packing) with per-stage counts —
    the training-data counterpart of `generate`."""
    import json as _json

    from .plans.training import build_training_corpus

    spark = _spark(args)
    docs = spark.read.parquet(args.docs)
    res = build_training_corpus(
        docs,
        out_dir=args.out,
        block=args.block,
        min_words=args.min_words,
        min_stop_hits=args.min_stop_hits,
    )
    print(_json.dumps(res.counts))
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
    g.add_argument("--warc", action="store_true",
                   help="PAGES is a dir/glob of WARC(.gz) files, not parquet")
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

    lo = sub.add_parser("load", help="graph export → session working graph")
    lo.add_argument("input")
    lo.add_argument("--session", default=None)
    lo.set_defaults(fn=cmd_load)

    sv = sub.add_parser("save", help="session working graph → sink format")
    sv.add_argument("out")
    sv.add_argument("--session", default=None)
    sv.add_argument("--format", default="json",
                    choices=["json", "csv", "cyclonedx", "spdx"])
    sv.set_defaults(fn=cmd_save)

    fd = sub.add_parser("find", help="query the session working graph")
    fd.add_argument("--session", default=None)
    fd.add_argument("--node-type", default=None)
    fd.add_argument("--name-contains", default=None)
    fd.add_argument("--url-contains", default=None)
    fd.add_argument("--sha256", default=None)
    fd.add_argument("--limit", type=int, default=20)
    fd.set_defaults(fn=cmd_find)

    cp = sub.add_parser(
        "corpus", help="documents parquet → cleaned training corpus"
    )
    cp.add_argument("docs")
    cp.add_argument("out")
    cp.add_argument("--block", type=int, default=2048)
    cp.add_argument("--min-words", type=int, default=50)
    cp.add_argument("--min-stop-hits", type=int, default=2)
    cp.set_defaults(fn=cmd_corpus)

    cf = sub.add_parser("config", help="get/set a section.option config value")
    cf.add_argument("key")
    cf.add_argument("values", nargs="*")
    cf.add_argument("--config-dir", default=None)
    cf.set_defaults(fn=cmd_config)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
