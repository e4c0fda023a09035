"""Full-pipeline crash-recovery proof (north rule resumability row):
a REAL mid-run SIGKILL between stage commits, then resume — driven
through tools/run_full_scale.py in subprocesses so the kill hits a
live independent JVM, not a mock.

The 1M-page version of this run (plus per-stage lineage and the 10×
stage-scaling sweep) is documented in SCALING.md; this test pins the
mechanism at 100k pages so it stays green in CI time.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_full_pipeline_kill_resume():
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_full_scale.py"),
         "kill-resume", "100000"],
        capture_output=True, text=True, timeout=900,
        env=dict(os.environ, PYTHONPATH=REPO), cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith('{"mode"')][-1]
    rec = json.loads(line)
    # the child was killed AFTER extract+mentions committed; the resume
    # must skip exactly the committed stages and redo the rest
    assert set(rec["killed_after_stages"]) >= {"extracted", "mentions"}
    assert set(rec["resume"]["stages_skipped"]) >= {"extracted", "mentions"}
    assert "edges" in rec["resume"]["stages_run"]
    # and produce byte-for-byte the same graph as an uninterrupted run
    assert rec["counts_match"]
    assert rec["resume"]["nodes"] == rec["clean"]["nodes"] > 0
    assert rec["resume"]["edges"] == rec["clean"]["edges"] > 0
