"""README/ROADMAP performance numbers are GENERATED from the checked-in
bench artifacts (gen_perf_table.py).  This test fails whenever the prose
blocks drift from the artifacts they cite — the structural end of the
hand-sync drift that rounds 2-4 each caught by eye (round-4 verdict
item 2)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_perf_prose_matches_artifacts():
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "gen_perf_table.py"),
         "--check"], capture_output=True, text=True)
    assert p.returncode == 0, p.stderr


def test_generated_blocks_present():
    readme = open(os.path.join(REPO, "README.md")).read()
    roadmap = open(os.path.join(REPO, "ROADMAP.md")).read()
    assert "<!-- perf:begin -->" in readme
    assert "<!-- numbers:begin -->" in roadmap
    # the spliced blocks are non-trivial (a bare marker pair would pass
    # --check while showing the user nothing)
    body = readme.split("<!-- perf:begin -->")[1] \
        .split("<!-- perf:end -->")[0]
    assert body.count("|") > 30, "README perf table looks empty"
