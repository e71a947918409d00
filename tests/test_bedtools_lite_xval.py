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

N_CASES = 1700   # x4 ops -> >5k randomized cases + the adversarial families


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


def _adversarial_cases():
    """Hand-crafted families derived from the bedtools documentation
    (round-2 verdict item #7), each in its own chrom namespace:
      A. multi-fragment subtract — one A row pierced by several disjoint
         B rows (incl. a B row flush with A's end);
      B. duplicate A rows under intersect -wa — each copy reports once
         per overlapping B feature;
      C. merge -d boundary — gaps of exactly d-1 / d / d+1 around every
         -d the merge test sweeps (bedtools merges gap <= d);
      D. zero-length features (insertion-site convention, start == end)
         at interval boundaries, standalone, and as B rows;
      E. exact-cover subtract — B covering A exactly / prefix / suffix
         (bedtools emits nothing / the suffix / the prefix, never a
         zero-length fragment);
      F. overlapping+nested B rows whose union must be coalesced before
         subtracting.
    Returns (a_rows, b_rows) lists sharing the chrom namespaces.
    """
    a_rows, b_rows = [], []

    def ns(tag):
        return "adv_%s" % tag

    # A: multi-fragment subtract
    c = ns("multifrag")
    a_rows += [(c, 0, 100)]
    b_rows += [(c, 10, 20), (c, 30, 40), (c, 50, 60), (c, 99, 100)]
    c = ns("multifrag2")
    a_rows += [(c, 5, 95), (c, 100, 200)]
    b_rows += [(c, 0, 6), (c, 90, 110), (c, 150, 151), (c, 199, 300)]

    # B: duplicate A rows, multiple B hits each
    c = ns("dupa")
    a_rows += [(c, 10, 50)] * 3 + [(c, 10, 50)]
    b_rows += [(c, 0, 15), (c, 20, 25), (c, 49, 80)]

    # C: merge -d boundaries for every d in the sweep
    for d in (0, 1, 7, 100):
        c = ns("mgap%d" % d)
        x = 0
        for gap in (max(d - 1, 0), d, d + 1):
            a_rows += [(c, x, x + 10), (c, x + 10 + gap, x + 20 + gap)]
            x += 1000

    # D: zero-length features
    c = ns("zerolen")
    a_rows += [(c, 5, 5), (c, 5, 10), (c, 10, 10), (c, 20, 30)]
    b_rows += [(c, 5, 5), (c, 25, 25), (c, 30, 40)]

    # E: exact covers
    c = ns("cover")
    a_rows += [(c, 10, 20), (c, 30, 40), (c, 50, 60)]
    b_rows += [(c, 10, 20), (c, 30, 35), (c, 55, 60)]

    # F: B needs coalescing
    c = ns("coalesce")
    a_rows += [(c, 0, 100)]
    b_rows += [(c, 10, 40), (c, 20, 30), (c, 35, 50), (c, 50, 60),
               (c, 70, 71), (c, 70, 71)]
    return a_rows, b_rows


def test_adversarial_families_xval(btl, tmp_path):
    a_rows, b_rows = _adversarial_cases()
    a, b = str(tmp_path / "a.bed"), str(tmp_path / "b.bed")
    _write(a, algebra.bed_sort(a_rows))
    _write(b, algebra.bed_sort(b_rows))
    srt = _run(btl, ["sort"], _fmt(a_rows))
    assert srt == _fmt(algebra.bed_sort(a_rows))
    for d in (0, 1, 7, 100):
        got = _run(btl, ["merge", "-d", str(d)], srt)
        assert got == _fmt(algebra.merge(algebra.bed_sort(a_rows), d)), \
            "adversarial merge -d %d diverged" % d
    got = _run(btl, ["subtract", "-a", a, "-b", b], b"")
    assert got == _fmt(algebra.subtract(algebra.bed_sort(a_rows),
                                        algebra.bed_sort(b_rows)))
    got = _run(btl, ["intersect", "-wa", "-a", a, "-b", b], b"")
    assert got == _fmt(algebra.intersect_wa(algebra.bed_sort(a_rows),
                                            algebra.bed_sort(b_rows)))
    # pin a few documented answers outright (not just cross-agreement)
    c = "adv_multifrag"
    frags = [r for r in algebra.subtract(algebra.bed_sort(a_rows),
                                         algebra.bed_sort(b_rows))
             if r[0] == c]
    assert frags == [(c, 0, 10), (c, 20, 30), (c, 40, 50), (c, 60, 99)]
    c = "adv_cover"
    frags = [r for r in algebra.subtract(algebra.bed_sort(a_rows),
                                         algebra.bed_sort(b_rows))
             if r[0] == c]
    assert frags == [(c, 35, 40), (c, 50, 55)]
    c = "adv_dupa"
    hits = [r for r in algebra.intersect_wa(algebra.bed_sort(a_rows),
                                            algebra.bed_sort(b_rows))
            if r[0] == c]
    assert hits == [(c, 10, 50)] * 12   # 4 copies x 3 overlapping B rows
