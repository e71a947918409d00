"""Cross-validate cornetto_tpu.intervals.algebra against bedtools_lite.

algebra.py (Python/NumPy, powers the pipelines) and
test_data/bedtools_lite.c (C, powers composed golden generation) were
written independently from the bedtools CLI contract; agreement on
thousands of randomized interval sets — dense with bookended, duplicate,
nested and touching intervals — is the strongest cross-check available
here (real bedtools and its source are unreachable: no network egress;
VERDICT.md round-1 item #1).

Each random case gets its own chrom namespace, so ~1000 cases pack into a
single file per operation and one subprocess call covers them all
(bedtools semantics never cross chroms).
"""

import os
import subprocess

import numpy as np
import pytest

from cornetto_tpu.intervals import algebra

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SRC = os.path.join(REPO, "test_data", "bedtools_lite.c")

N_CASES = 1200


@pytest.fixture(scope="session")
def btl(tmp_path_factory):
    exe = str(tmp_path_factory.mktemp("btl") / "bedtools_lite")
    subprocess.run(["cc", "-O2", "-o", exe, SRC], check=True)
    return exe


def _random_rows(rng, case, max_rows=14, coord=200):
    """Interval set dense in edge cases: bookends, duplicates, nesting,
    shared starts, multiple chroms with tricky lexicographic names."""
    chroms = ["c%d_chr1" % case, "c%d_chr10" % case, "c%d_chr2" % case]
    n = int(rng.integers(0, max_rows))
    rows = []
    for _ in range(n):
        c = chroms[int(rng.integers(0, len(chroms)))]
        s = int(rng.integers(0, coord))
        ln = int(rng.integers(1, coord // 3))
        rows.append((c, s, s + ln))
    if n and rng.random() < 0.5:  # force duplicates + bookends
        c, s, e = rows[0]
        rows.append((c, s, e))
        rows.append((c, e, e + 5))
    return rows


def _fmt(rows):
    return "".join("%s\t%d\t%d\n" % r for r in rows).encode()


def _run(exe, args, stdin_bytes):
    out = subprocess.run([exe] + args, input=stdin_bytes,
                         capture_output=True, check=True)
    return out.stdout


def _write(path, rows):
    with open(path, "wb") as f:
        f.write(_fmt(rows))


def test_sort_and_merge_xval(btl, tmp_path):
    rng = np.random.default_rng(7)
    all_rows = []
    for case in range(N_CASES):
        all_rows += _random_rows(rng, case)
    got_sort = _run(btl, ["sort"], _fmt(all_rows))
    want_sort = _fmt(algebra.bed_sort(all_rows))
    assert got_sort == want_sort
    for d in (0, 1, 7, 100):
        got = _run(btl, ["merge", "-d", str(d)], got_sort)
        want = _fmt(algebra.merge(algebra.bed_sort(all_rows), d))
        assert got == want, "merge -d %d diverged" % d


def test_subtract_xval(btl, tmp_path):
    rng = np.random.default_rng(8)
    a_rows, b_rows = [], []
    for case in range(N_CASES):
        a_rows += _random_rows(rng, case)
        b_rows += _random_rows(rng, case)
    a, b = str(tmp_path / "a.bed"), str(tmp_path / "b.bed")
    _write(a, a_rows)
    _write(b, b_rows)
    got = _run(btl, ["subtract", "-a", a, "-b", b], b"")
    want = _fmt(algebra.subtract(a_rows, b_rows))
    assert got == want


def test_intersect_wa_xval(btl, tmp_path):
    rng = np.random.default_rng(9)
    a_rows, b_rows = [], []
    for case in range(N_CASES):
        a_rows += _random_rows(rng, case)
        b_rows += _random_rows(rng, case)
    a, b = str(tmp_path / "a.bed"), str(tmp_path / "b.bed")
    _write(a, a_rows)
    _write(b, b_rows)
    got = _run(btl, ["intersect", "-wa", "-a", a, "-b", b], b"")
    want = _fmt(algebra.intersect_wa(a_rows, b_rows))
    assert got == want


def test_gnu_sort_emulation_xval(tmp_path):
    """Pin algebra's GNU-sort emulations against the real GNU sort."""
    rng = np.random.default_rng(10)
    rows = []
    for case in range(300):
        rows += _random_rows(rng, case, max_rows=8)
    env = dict(os.environ, LC_ALL="C")
    got = subprocess.run(["sort", "-k1,1", "-k2,2n"], input=_fmt(rows),
                         capture_output=True, env=env, check=True).stdout
    assert got == _fmt(algebra.gnu_sort_bed(rows))
    got = subprocess.run(["sort", "-k3,3nr"], input=_fmt(rows),
                         capture_output=True, env=env, check=True).stdout
    assert got == _fmt(algebra.gnu_sort_len_desc(rows))
