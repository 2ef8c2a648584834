"""Smoke-pin the cap-rotation planner (tools/rotate_cap.py): it must
run against the live repo, report the staleness histogram, and propose
a cap whose head contains every obligation the registry invariants
would otherwise flag."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rotate_cap_reports_obligations_and_histogram():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "rotate_cap.py")],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "staleness histogram" in out.stdout
    assert "obligations (" in out.stdout
    assert "proposed cap (" in out.stdout
    # every proposed-cap section lists at most 50 names
    tail = out.stdout.split("proposed cap (")[1]
    n = int(tail.split(")")[0])
    assert n <= 50
