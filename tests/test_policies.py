"""Repo policy gates run as part of the fast suite (the reference runs
scripts/check_policies.py as a CI job; here the same script doubles as a
test so a violation fails the suite, not just CI)."""

import subprocess
import sys


def test_policies_green():
    out = subprocess.run(
        [sys.executable, "scripts/check_policies.py"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0, out.stdout + out.stderr
