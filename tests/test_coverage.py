"""COVERAGE.md must stay in sync with the registry."""

from __future__ import annotations

import os


def test_coverage_md_fresh():
    from tools.gen_coverage import main

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    assert os.path.exists(path), "run tools/gen_coverage.py"
    with open(path) as fh:
        assert fh.read() == main(), "COVERAGE.md stale: rerun tools/gen_coverage.py"
