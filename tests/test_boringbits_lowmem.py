"""--low-mem (two-pass streaming) noboringbits must be byte-identical to
the in-memory path on stdout AND stderr (warnings, means, thresholds)."""

import contextlib
import gzip
import io
import os
import shutil

import numpy as np
import pytest

from cornetto_tpu.tools import boringbits


def _run(ct, cm, low_mem, boring=False):
    out, err = io.StringIO(), io.StringIO()
    opt = boringbits.BoringbitsOptions(boring=boring, backend="numpy",
                                       low_mem="yes" if low_mem else "no")
    with contextlib.redirect_stderr(err):
        boringbits.run(ct, cm, opt, out=out)
    return out.getvalue(), err.getvalue()


def test_lowmem_matches_synth(gold):
    here = os.path.dirname(os.path.abspath(__file__))
    synth = os.path.join(os.path.dirname(here), "test_data", "synth")
    ct = os.path.join(synth, "cov-total.bg")
    cm = os.path.join(synth, "cov-mq20.bg")
    o1, e1 = _run(ct, cm, False)
    o2, e2 = _run(ct, cm, True)
    assert o2 == o1
    assert e2 == e1
    assert o2 == (gold / "fun_default.txt").read_text()


@pytest.mark.parametrize("gz", [False, True])
def test_lowmem_truncations_and_multi_contig(tmp_path, gz):
    def track(shift):
        rows = []
        for ctg, n, base in (("a", 5000, 5), ("b", 700, 70000),
                             ("c", 40, 3)):
            for i in range(n):
                rows.append("%s\t%d\t%d\t%d\n"
                            % (ctg, i, i + 1, max(base - shift, 0) + i))
        return "".join(rows).encode()
    ct = tmp_path / "t.bg"
    cm = tmp_path / "m.bg"
    if gz:
        with gzip.open(ct, "wb") as f:
            f.write(track(0))
    else:
        ct.write_bytes(track(0))
    cm.write_bytes(track(3))
    for boring in (False, True):
        o1, e1 = _run(str(ct), str(cm), False, boring=boring)
        o2, e2 = _run(str(ct), str(cm), True, boring=boring)
        assert o2 == o1
        assert e2 == e1
    assert "truncated to 65535" in e1


def test_lowmem_cli_flag(tmp_path, capsys):
    ct = tmp_path / "a.bg"
    ct.write_text("".join("c\t%d\t%d\t9\n" % (i, i + 1)
                          for i in range(3000)))
    rc = boringbits.main([str(ct), "-q", str(ct), "--low-mem",
                          "--backend", "numpy", "-m", "1000"],
                         boring=False)
    assert rc == 0
    assert capsys.readouterr().out.count("\n") >= 1


def test_lowmem_iter_fun_windows_matches(tmp_path):
    rng = np.random.default_rng(9)
    rows_a, rows_b = [], []
    for ctg, n in (("x", 4000), ("y", 2500)):
        # contig y sits far below 0.4x the global mean -> guaranteed
        # low-coverage violations
        d = rng.integers(30, 40, n) if ctg == "x" else \
            rng.integers(0, 3, n)
        m = np.maximum(d - rng.integers(0, 10, n), 0)
        for i in range(n):
            rows_a.append("%s\t%d\t%d\t%d\n" % (ctg, i, i + 1, d[i]))
            rows_b.append("%s\t%d\t%d\t%d\n" % (ctg, i, i + 1, m[i]))
    ct = tmp_path / "a.bg"
    cm = tmp_path / "b.bg"
    ct.write_text("".join(rows_a))
    cm.write_text("".join(rows_b))
    opt_mem = boringbits.BoringbitsOptions(boring=False, backend="numpy",
                                           low_mem="no", min_ctg_len=1000)
    opt_str = boringbits.BoringbitsOptions(boring=False, backend="numpy",
                                           low_mem="yes", min_ctg_len=1000)
    got_mem = list(boringbits.iter_fun_windows(str(ct), str(cm), opt_mem))
    got_str = list(boringbits.iter_fun_windows(str(ct), str(cm), opt_str))
    assert got_str == got_mem and len(got_mem) > 0


def test_scan_and_iter_window_invariance(tmp_path):
    # multi-window stitching: results must not depend on the window size
    # (contigs + truncations straddling window boundaries)
    from cornetto_tpu.io.bed import iter_depth_contigs, scan_depth_track
    rows = []
    for ctg, n, base in (("aa", 900, 5), ("bb", 1300, 65530),
                         ("cc", 11, 70000)):
        for i in range(n):
            rows.append("%s\t%d\t%d\t%d\n" % (ctg, i, i + 1, base + i))
    p = tmp_path / "w.bg"
    p.write_text("".join(rows))
    big = scan_depth_track(str(p))
    assert big is not None
    for w in (97, 1024, 65536):
        small = scan_depth_track(str(p), window=w)
        assert small == big, w
        a = list(iter_depth_contigs(str(p), big[1], window=w))
        b = list(iter_depth_contigs(str(p), big[1]))
        assert len(a) == len(b) == 3
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    # truncation bookkeeping: every bb row >= 65536 and all cc rows
    names, lengths, firsts, s, truncs, tot = big
    assert names == ["aa", "bb", "cc"]
    assert tot == (1300 - 6) + 11
    assert all(v > 65535 for _ci, _pos, v in truncs)
