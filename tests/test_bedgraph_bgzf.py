"""BGZF coverage tracks (round-4 verdict item 7): bgzip'd bedgraphs must
auto-detect and inflate block-parallel through every depth loader, byte-
equivalent to plain and gzip tracks.  The gzip FORMAT serializes inflate
(one stream); BGZF's independent <=64 KiB members parallelize it — the
same property io/bam.py exploits (reference analog: the compressed
coverage tracks of shitflow/create-launch.pbs.sh)."""

import gzip
import io

import numpy as np
import pytest

from cornetto_tpu.io.bgzf import BgzfStreamReader, BgzfWriter, is_bgzf


def _track_bytes():
    rows = []
    rng = np.random.default_rng(4)
    for ctg, n in (("aa", 40_000), ("bb", 25_000), ("cc", 17)):
        d = rng.integers(0, 90, n)
        for i in range(n):
            rows.append("%s\t%d\t%d\t%d\n" % (ctg, i, i + 1, d[i]))
    return "".join(rows).encode()


@pytest.fixture(scope="module")
def tracks(tmp_path_factory):
    td = tmp_path_factory.mktemp("bgzf")
    data = _track_bytes()
    plain = td / "t.bg"
    plain.write_bytes(data)
    gz = td / "t.gz.bg"
    with gzip.open(gz, "wb") as f:
        f.write(data)
    bg = td / "t.bgzf.bg"
    with BgzfWriter(str(bg)) as w:
        # odd-sized writes to exercise block-boundary handling
        for i in range(0, len(data), 100_003):
            w.write(data[i:i + 100_003])
    return data, str(plain), str(gz), str(bg)


def test_is_bgzf_detection(tracks):
    _, plain, gz, bg = tracks
    assert is_bgzf(bg)
    assert not is_bgzf(gz)
    assert not is_bgzf(plain)


def test_stream_reader_bytes(tracks):
    data, _, _, bg = tracks
    with BgzfStreamReader(bg, nthreads=2) as rd:
        assert rd.read() == data
    # small readinto chunks spanning block boundaries
    with BgzfStreamReader(bg, nthreads=2) as rd:
        out = io.BytesIO()
        buf = bytearray(65_521)
        while True:
            n = rd.readinto(memoryview(buf))
            if n == 0:
                break
            out.write(buf[:n])
        assert out.getvalue() == data
    # raw_tell advances toward the compressed size
    with BgzfStreamReader(bg, nthreads=2) as rd:
        assert rd.raw_tell() == 0 or rd.raw_tell() >= 0
        rd.read()
        import os
        # the 28-byte EOF marker block may stay unconsumed
        assert rd.raw_tell() >= os.path.getsize(bg) - 64


def test_depth_loaders_bgzf_equal_plain(tracks):
    from cornetto_tpu.io.bed import (iter_depth_contigs,
                                     read_bedgraph_pair, scan_depth_track)
    _, plain, gz, bg = tracks
    ref = read_bedgraph_pair(plain, plain)
    got = read_bedgraph_pair(bg, bg)
    assert got.names == ref.names
    for a, b in zip(ref.depth, got.depth):
        np.testing.assert_array_equal(a, b)
    sp = scan_depth_track(plain)
    sb = scan_depth_track(bg)
    if sp is not None and sb is not None:
        assert sp == sb
        for a, b in zip(iter_depth_contigs(plain, sp[1]),
                        iter_depth_contigs(bg, sb[1])):
            np.testing.assert_array_equal(a, b)


def test_noboringbits_bgzf_byte_identical(tracks, tmp_path):
    import contextlib
    from cornetto_tpu.tools import boringbits
    _, plain, _, bg = tracks

    def run(ct, cm, low_mem="no"):
        out, err = io.StringIO(), io.StringIO()
        opt = boringbits.BoringbitsOptions(
            boring=False, backend="numpy", low_mem=low_mem,
            min_ctg_len=10_000, edge_len=1_000)
        with contextlib.redirect_stderr(err):
            boringbits.run(ct, cm, opt, out=out)
        return out.getvalue(), err.getvalue()

    o_ref, e_ref = run(plain, plain)
    o_bg, e_bg = run(bg, bg)
    assert (o_bg, e_bg) == (o_ref, e_ref)
    # forced two-pass streaming over BGZF (inflates the file twice, in
    # parallel blocks both times)
    o_lm, e_lm = run(bg, bg, low_mem="yes")
    assert (o_lm, e_lm) == (o_ref, e_ref)
