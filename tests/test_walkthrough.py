"""The examples/walkthrough.py script runs green under pytest — the
engine's answer to the reference's doctest harness (SURVEY §5): the
shipped example can never rot.

Runs in a subprocess so the walkthrough exercises its own session
bootstrap (get_spark) exactly as a user would, without disturbing the
test session's SparkSession.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF), reason="testdata not present")
def test_walkthrough_runs_end_to_end():
    env = dict(os.environ, SPARK_GRAFT_CPUS="4", SPARK_GRAFT_DRIVER_MEM="4g")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "walkthrough.py"), SF],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = proc.stdout
    # the walkthrough's own milestones all printed
    for marker in ("packed:", "flat rows:", "near-dup candidate pairs:",
                   "clicks with a prior signup:",
                   "refined-IVF neighbor pairs:", "IVF-store neighbor pairs:",
                   "multi-probe LSH pairs:", "context-window bins:",
                   "WordPiece tokens on 5 docs:", "TFRecord round trip rows:",
                   "corpus data card:"):
        assert marker in out, f"missing '{marker}' in walkthrough output"
