"""OPERATORS.md must stay in sync with the queries() registry."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_operator_index_current():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gen_operator_index.py"),
         "--check"],
        capture_output=True, text=True, cwd=REPO,
        env=dict(os.environ, PYTHONPATH=REPO),
    )
    assert r.returncode == 0, r.stderr or r.stdout
