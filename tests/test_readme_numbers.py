"""README headline table must match the newest BENCH artifacts.

VERDICT r3 weak #8: hand-typed perf numbers drifted from the measured
artifacts (README said TD4 160.8 FPS while BENCH_r03.json measured
167.38). The table is now rendered by scripts/render_readme.py; this
test re-renders it in memory and fails if the committed README differs,
so a perf round that forgets the render step can't ship stale numbers.
"""

from __future__ import annotations

import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))


def test_readme_table_matches_artifacts():
    import render_readme

    metrics, src = render_readme.load_metrics()
    if not metrics:
        pytest.skip("no BENCH artifacts in repo root")
    readme = open(os.path.join(ROOT, "README.md")).read()
    begin, end = "<!-- bench:begin -->", "<!-- bench:end -->"
    assert begin in readme and end in readme, "README bench markers missing"
    committed = readme.split(begin, 1)[1].split(end, 1)[0].strip()
    expected = render_readme.render_table(metrics, src).strip()
    assert committed == expected, (
        "README headline table is stale — run scripts/render_readme.py")
