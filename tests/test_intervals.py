"""Property tests for the interval algebra against brute-force per-base
bitmaps (bedtools semantics)."""

import numpy as np

from cornetto_tpu.intervals import algebra


def _rand_rows(rng, nchrom=3, n=40, span=500):
    rows = []
    for _ in range(n):
        c = "c%d" % rng.integers(0, nchrom)
        s = int(rng.integers(0, span))
        e = s + int(rng.integers(1, 60))
        rows.append((c, s, e))
    return rows


def _cover(rows, span=700):
    cov = {}
    for c, s, e in rows:
        cov.setdefault(c, np.zeros(span, dtype=bool))[s:e] = True
    return cov


def test_merge_bruteforce():
    rng = np.random.default_rng(1)
    for _ in range(30):
        rows = algebra.bed_sort(_rand_rows(rng))
        for d in (0, 5, 100):
            got = algebra.merge(rows, d)
            assert got == algebra.merge(got, d)  # idempotent
            cov_in, cov_out = _cover(rows), _cover(got)
            assert cov_out.keys() == cov_in.keys()
            for c in cov_in:
                # original coverage is contained in merged coverage
                assert not np.any(cov_in[c] & ~cov_out[c])
                if d == 0:
                    np.testing.assert_array_equal(cov_out[c], cov_in[c])
            ends = {(c, e) for c, s, e in rows}
            starts = {(c, s) for c, s, e in rows}
            for c, s, e in got:
                # merged boundaries coincide with original boundaries
                assert (c, s) in starts and (c, e) in ends
            # gaps between consecutive merged intervals must exceed d
            for (c1, s1, e1), (c2, s2, e2) in zip(got, got[1:]):
                if c1 == c2:
                    assert s2 - e1 > d


def test_subtract_bruteforce():
    rng = np.random.default_rng(2)
    for _ in range(30):
        a = _rand_rows(rng)
        b = _rand_rows(rng)
        got = algebra.subtract(a, b)
        cov_b = _cover(b)
        # fragment-level check
        want = []
        for c, s, e in a:
            mask = np.zeros(700, dtype=bool)
            mask[s:e] = True
            if c in cov_b:
                mask &= ~cov_b[c]
            i = s
            while i < e:
                if mask[i]:
                    j = i
                    while j < e and mask[j]:
                        j += 1
                    want.append((c, i, j))
                    i = j
                else:
                    i += 1
        assert got == want


def test_intersect_wa_bruteforce():
    rng = np.random.default_rng(3)
    for _ in range(30):
        a = _rand_rows(rng)
        b = _rand_rows(rng)
        got = algebra.intersect_wa(a, b)
        want = []
        bs = sorted(b)
        for c, s, e in a:
            for c2, s2, e2 in bs:
                if c2 == c and s2 < e and e2 > s:
                    want.append((c, s, e))
        assert sorted(got) == sorted(want)
        # per-A multiplicity
        from collections import Counter
        assert Counter(got) == Counter(want)


def test_sort_orders():
    rows = [("c10", 5, 9), ("c2", 5, 7), ("c2", 5, 6), ("c2", 1, 3)]
    assert algebra.bed_sort(rows) == [
        ("c10", 5, 9), ("c2", 1, 3), ("c2", 5, 6), ("c2", 5, 7)]
    assert algebra.gnu_sort_len_desc(rows)[0] == ("c10", 5, 9)
