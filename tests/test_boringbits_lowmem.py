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


def test_oversized_row_grows_buffer(tmp_path):
    # a row longer than window + the 64 KB slack must grow the read
    # buffer, not raise BufferError on the live np.frombuffer export
    # (advisor round-4 finding: bytearray.extend with an export alive)
    from cornetto_tpu.io import bed
    name = "ctg" + "x" * 200_000
    rows = "".join("%s\t%d\t%d\t%d\n" % (name, i, i + 1, 7)
                   for i in range(5))
    p = tmp_path / "big.bg"
    p.write_text(rows)
    got = bed.scan_depth_track(str(p), window=64)
    assert got is not None
    names, lengths, _f, ssum, _tr, _tot = got
    assert names == [name] and lengths == [5] and ssum == 35
    (arr,) = list(bed.iter_depth_contigs(str(p), lengths, window=64))
    np.testing.assert_array_equal(arr, np.full(5, 7, np.uint16))
    # the in-memory windowed loader shares the same grow path
    loaded = bed._load_depth_windows(open(p, "rb"),
                                     size_hint=os.path.getsize(p),
                                     window=64)
    assert loaded is not None
    ln, _lf, ldep, _lb, lsum, _ltr = loaded
    assert ln == [name] and lsum == 35
    np.testing.assert_array_equal(ldep, np.full(5, 7, np.uint16))


def test_prefetch_propagates_worker_errors():
    # a generator failing mid-stream must RAISE in the consumer, not end
    # the iteration early (truncated output with exit 0 — advisor
    # round-4 finding)
    def bad():
        yield 1
        raise OSError("disk on fire")

    it = boringbits._prefetch(bad())
    assert next(it) == 1
    with pytest.raises(OSError, match="disk on fire"):
        list(it)

    def bad_exit():
        yield from ()
        raise SystemExit(1)

    with pytest.raises(SystemExit):
        list(boringbits._prefetch(bad_exit()))
