"""CLI entry points (the `surfactant generate/merge` analogs,
reference __main__.py:75): generate → graph JSON (with resume on the
second invocation), merge of two exports, query printing."""

import json

from surfactant_spark.__main__ import main


def test_cli_generate_resume_and_merge(spark, tmp_path, capsys):
    from surfactant_spark.sources.pages import write_pages_parquet

    pages = str(tmp_path / "pages")
    write_pages_parquet(spark, 300, pages)
    out_a = str(tmp_path / "out_a")

    assert main(["generate", pages, out_a, "--run-id", "t1"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["nodes"] > 0 and rep["edges"] > 0
    assert rep["stages_run"] and not rep["stages_skipped"]

    # second run resumes every stage from the snapshot catalog
    assert main(["generate", pages, out_a, "--run-id", "t2"]) == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["stages_run"] == [] and rep2["stages_skipped"]
    assert rep2["nodes"] == rep["nodes"] and rep2["edges"] == rep["edges"]

    # self-merge is idempotent under any-hash dedup (node count stable)
    out_m = str(tmp_path / "merged")
    assert main(["merge", out_m, out_a, out_a]) == 0
    repm = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert repm["nodes"] == rep["nodes"]


def test_cli_query_prints_json_lines(capsys):
    assert main(["query", "stat_counts", "--sf-dir", "/root/testdata/sf0.001",
                 "--limit", "3"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert 1 <= len(lines) <= 3
    json.loads(lines[0])


def test_cli_unknown_query_errors(capsys):
    assert main(["query", "no_such_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_session_load_find_save_round_trip(spark, tmp_path, capsys):
    """cli load/save analogs (cli_load.py/cli_save.py): the working
    graph persists in the session dir BETWEEN invocations — find and
    save run against it without re-reading the original export."""
    from surfactant_spark.sources.pages import write_pages_parquet

    pages = str(tmp_path / "pages")
    write_pages_parquet(spark, 200, pages)
    out = str(tmp_path / "out")
    assert main(["generate", pages, out, "--run-id", "s1"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    sess = str(tmp_path / "sess")
    assert main(["load", out, "--session", sess]) == 0
    lrep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert lrep["nodes"] == rep["nodes"] and lrep["edges"] == rep["edges"]

    # separate invocation reads the persisted session
    assert main(["find", "--session", sess, "--node-type", "page",
                 "--limit", "5"]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert lines and all(json.loads(l)["node_type"] == "page" for l in lines)

    # save round-trip: session → json export → loads back identically
    out2 = str(tmp_path / "out2")
    assert main(["save", out2, "--session", sess]) == 0
    srep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert srep["nodes"] == rep["nodes"] and srep["edges"] == rep["edges"]
    sess2 = str(tmp_path / "sess2")
    assert main(["load", out2, "--session", sess2]) == 0
    lrep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert lrep2["nodes"] == rep["nodes"] and lrep2["edges"] == rep["edges"]

    # save to a standards format from the session
    cdx = str(tmp_path / "bom.cdx.json")
    assert main(["save", cdx, "--session", sess, "--format", "cyclonedx"]) == 0
    doc = json.load(open(cdx))
    assert len(doc["components"]) == rep["nodes"]

    # no session → helpful error
    assert main(["find", "--session", str(tmp_path / "nope")]) == 2
    assert "no working graph" in capsys.readouterr().err


def test_config_manager_and_cli(tmp_path, capsys):
    """Config get/set round-trip (configmanager.py + cmd/config.py
    analogs): section.option addressing, bool coercion, persistence
    across ConfigManager instances, and the session-dir fallback."""
    from surfactant_spark.configmanager import ConfigManager, coerce_value

    cdir = str(tmp_path / "cfg")
    assert main(["config", "core.output_format", "spdx",
                 "--config-dir", cdir]) == 0
    assert "set to 'spdx'" in capsys.readouterr().out
    assert main(["config", "core.output_format", "--config-dir", cdir]) == 0
    assert "core.output_format = spdx" in capsys.readouterr().out
    # bool coercion and multi-value → list
    assert main(["config", "core.recorded_institution", "true",
                 "--config-dir", cdir]) == 0
    capsys.readouterr()
    cm = ConfigManager(config_dir=cdir)
    assert cm.get("core", "recorded_institution") is True
    assert cm.get("core", "missing", fallback="dflt") == "dflt"
    assert coerce_value("FALSE") is False
    # malformed key
    assert main(["config", "nodot", "--config-dir", cdir]) == 2
    assert "Invalid KEY" in capsys.readouterr().err
    # not-found get
    assert main(["config", "nope.nothing", "--config-dir", cdir]) == 0
    assert "not found" in capsys.readouterr().out
    # delete
    assert cm.delete("core", "output_format") is True
    assert cm.get("core", "output_format") is None
    assert cm.delete("ghost") is False


def test_cli_generate_from_warc(spark, tmp_path, capsys):
    import gzip

    from surfactant_spark.sources.pages import synth_pages

    rows = synth_pages(spark, 150).collect()
    recs = []
    for r in rows:
        body = bytes(r.html)
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body
        )
        hdr = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + f"WARC-Target-URI: {r.url}\r\n".encode()
            + f"WARC-Date: {r.warc_ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n\r\n".encode()
        )
        recs.append(gzip.compress(hdr + http + b"\r\n\r\n"))
    wdir = tmp_path / "warcs"
    wdir.mkdir()
    (wdir / "a.warc.gz").write_bytes(b"".join(recs[:75]))
    (wdir / "b.warc.gz").write_bytes(b"".join(recs[75:]))

    out = str(tmp_path / "out_warc")
    assert main(["generate", str(wdir), out, "--warc",
                 "--corpus-fingerprint", "warc-150"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["nodes"] > 0 and rep["edges"] > 0


def test_cli_corpus_builds_training_set(spark, tmp_path, capsys):
    import glob
    import json

    out = str(tmp_path / "corpus")
    assert main([
        "corpus", "/root/testdata/sf0.001/documents.parquet", out,
        "--block", "64", "--min-words", "10", "--min-stop-hits", "1",
    ]) == 0
    counts = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counts["input"] == 500
    assert 0 < counts["after_quality"] <= counts["after_dedup"] <= 500
    assert counts["n_sequences"] > 0
    assert glob.glob(out + "/docs/*.json.gz")
    assert spark.read.parquet(out + "/sequences").count() == counts["n_sequences"]
