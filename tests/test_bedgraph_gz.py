"""Gzipped coverage-track input: the windowed streaming loader must be
byte-equivalent to the plain-text path (same goldens), including contig
stitching and validation across inflate-window boundaries."""

import gzip
import io
import os
import shutil

import numpy as np
import pytest

from cornetto_tpu.io import bed
from cornetto_tpu.tools import boringbits


@pytest.fixture(scope="module")
def synth_gz(tmp_path_factory):
    here = os.path.dirname(os.path.abspath(__file__))
    synth = os.path.join(os.path.dirname(here), "test_data", "synth")
    d = tmp_path_factory.mktemp("synth_gz")
    for name in ("cov-total.bg", "cov-mq20.bg"):
        with open(os.path.join(synth, name), "rb") as fin, \
                gzip.open(os.path.join(str(d), name + ".gz"), "wb") as fo:
            shutil.copyfileobj(fin, fo)
    return d, synth


def test_noboringbits_gz_matches_golden(synth_gz, gold):
    d, _ = synth_gz
    out = io.StringIO()
    boringbits.run(str(d / "cov-total.bg.gz"), str(d / "cov-mq20.bg.gz"),
                   boringbits.BoringbitsOptions(boring=False), out=out)
    assert out.getvalue() == (gold / "fun_default.txt").read_text()


def _tuples_equal(a, b):
    assert a[0] == b[0]                       # names
    assert np.array_equal(a[1], b[1])         # first starts
    assert np.array_equal(a[2], b[2])         # depths
    assert np.array_equal(a[3], b[3])         # row bounds
    assert a[4] == b[4]                       # clamped sum
    assert np.array_equal(a[5][0], b[5][0])   # trunc rows
    assert np.array_equal(a[5][1], b[5][1])   # trunc vals
    assert a[5][2] == b[5][2]                 # trunc total


@pytest.mark.parametrize("window", [64 << 20, 1500, 257])
def test_gz_windowed_equals_plain(synth_gz, window):
    d, synth = synth_gz
    plain = bed._load_depth_streaming(os.path.join(synth, "cov-total.bg"))
    gz = bed._load_depth_streaming_gz(str(d / "cov-total.bg.gz"),
                                      window=window)
    _tuples_equal(gz, plain)


def test_gz_truncation_and_multi_contig(tmp_path):
    rows = []
    for ctg, n, base in (("a", 700, 5), ("b", 350, 70000), ("c", 1, 3)):
        for i in range(n):
            rows.append("%s\t%d\t%d\t%d\n" % (ctg, i, i + 1, base + i))
    text = "".join(rows).encode()
    pp = tmp_path / "t.bg"
    pp.write_bytes(text)
    gp = tmp_path / "t.bg.gz"
    with gzip.open(gp, "wb") as f:
        f.write(text)
    plain = bed._load_depth_streaming(str(pp))
    for window in (50, 333, 1 << 20):
        _tuples_equal(bed._load_depth_streaming_gz(str(gp), window=window),
                      plain)
    names, firsts, depth, bounds, s, (trr, trv, trt) = plain
    assert names == ["a", "b", "c"]
    assert trt == 350                          # every b row exceeds 65535
    assert (depth[700:1050] == 65535).all()


def test_gz_validation_error_across_windows(tmp_path):
    text = b"a\t0\t1\t5\na\t1\t2\t5\na\t3\t4\t5\n"   # gap 1 -> 3
    gp = tmp_path / "bad.bg.gz"
    with gzip.open(gp, "wb") as f:
        f.write(text)
    # window chosen so the bad row lands in the second window
    with pytest.raises(SystemExit):
        bed._load_depth_streaming_gz(str(gp), window=13)
    with pytest.raises(SystemExit):
        bed._load_depth_streaming_gz(str(gp), window=1 << 20)


def test_gz_generic_fallback_parser(tmp_path):
    # _parse_bedgraph_numpy must also accept gz (pandas fallback path)
    text = b"a\t0\t1\t5\na\t1\t2\t6\n"
    gp = tmp_path / "x.bg.gz"
    with gzip.open(gp, "wb") as f:
        f.write(text)
    names, starts, depths = bed._parse_bedgraph_numpy(str(gp))
    assert names == ["a"]
    assert np.array_equal(depths[0], [5, 6])

@pytest.mark.parametrize("window", [97, 1500])
def test_plain_windowed_stitching(synth_gz, window):
    # the plain-text path is ALSO windowed now (round-4 fix: the old
    # whole-file mmap counted ~file-size pages toward peak RSS); tiny
    # windows must stitch contigs/validation identically
    _, synth = synth_gz
    path = os.path.join(synth, "cov-total.bg")
    base = bed._load_depth_streaming(path)
    small = bed._load_depth_windows(open(path, "rb"),
                                    size_hint=os.path.getsize(path),
                                    window=window)
    _tuples_equal(small, base)


def test_plain_validation_error_across_windows(tmp_path):
    pp = tmp_path / "bad.bg"
    pp.write_bytes(b"a\t0\t1\t5\na\t1\t2\t5\na\t3\t4\t5\n")  # gap 1 -> 3
    with pytest.raises(SystemExit):
        bed._load_depth_windows(open(pp, "rb"), window=13)
