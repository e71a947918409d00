"""Native streaming bedgraph loader (bg_fill): validation errors,
truncation warnings, and equivalence with the generic parse path."""

import numpy as np
import pytest

from cornetto_tpu.io.bed import (_load_depth_streaming,
                                 _parse_bedgraph_numpy, read_bedgraph_pair)


def _write(tmp_path, name, rows):
    p = tmp_path / name
    p.write_text("".join("%s\t%d\t%d\t%d\n" % r for r in rows))
    return str(p)


def test_streaming_matches_generic(tmp_path):
    rng = np.random.default_rng(4)
    rows = []
    for ctg, n in (("a", 1000), ("b", 513), ("chr10", 2049)):
        d = rng.integers(0, 300, n)
        rows += [(ctg, i, i + 1, int(d[i])) for i in range(n)]
    p = _write(tmp_path, "t.bg", rows)
    got = _load_depth_streaming(p)
    assert got is not None
    names, firsts, depth, bounds, ssum, trunc = got
    assert names == ["a", "b", "chr10"]
    assert list(np.diff(bounds)) == [1000, 513, 2049]
    assert trunc[2] == 0
    gen_names, gen_starts, gen_depths = _parse_bedgraph_numpy(p)
    assert gen_names == names
    for k in range(3):
        lo, hi = int(bounds[k]), int(bounds[k + 1])
        np.testing.assert_array_equal(depth[lo:hi], gen_depths[k])
    assert ssum == sum(int(x.sum()) for x in gen_depths)


def test_streaming_pair_means_and_clamp(tmp_path, capsys):
    rows_t = [("c", 0, 1, 70000), ("c", 1, 2, 10), ("c", 2, 3, 20)]
    rows_q = [("c", 0, 1, 5), ("c", 1, 2, 5), ("c", 2, 3, 5)]
    pt = _write(tmp_path, "t.bg", rows_t)
    pq = _write(tmp_path, "q.bg", rows_q)
    d = read_bedgraph_pair(pt, pq)
    # clamp to 65535 BEFORE the mean, like the reference
    assert int(d.depth[0][0]) == 65535
    assert d.mean_depth == round((65535 + 10 + 20) / 3)
    err = capsys.readouterr().err
    assert "truncated to 65535" in err and "Found 70000" in err
    assert "c:0-1" in err


@pytest.mark.parametrize("rows,msg", [
    ([("c", 0, 2, 5)], "end=start+1"),
    ([("c", 0, 1, 5), ("c", 2, 3, 5)], "incremantal"),
])
def test_streaming_validation_errors(tmp_path, rows, msg, capsys):
    pt = _write(tmp_path, "t.bg", rows)
    pq = _write(tmp_path, "q.bg", rows)
    with pytest.raises(SystemExit):
        read_bedgraph_pair(pt, pq)
    assert msg in capsys.readouterr().err


def test_streaming_column_error(tmp_path, capsys):
    p = tmp_path / "bad.bg"
    p.write_text("c\t0\t1\t5\nc\t1\n")
    q = _write(tmp_path, "q.bg", [("c", 0, 1, 5), ("c", 1, 2, 5)])
    with pytest.raises(SystemExit):
        read_bedgraph_pair(str(p), str(q))
    assert "4 columns" in capsys.readouterr().err


def test_streaming_lockstep_mismatch(tmp_path, capsys):
    pt = _write(tmp_path, "t.bg", [("a", 0, 1, 5), ("a", 1, 2, 5)])
    pq = _write(tmp_path, "q.bg", [("b", 0, 1, 5), ("b", 1, 2, 5)])
    with pytest.raises(SystemExit):
        read_bedgraph_pair(pt, pq)
    assert "same order" in capsys.readouterr().err


def test_streaming_chunk_boundaries(tmp_path):
    """Contigs spanning thread-chunk boundaries stitch correctly: force
    many chunks by using a file large enough for 16 threads."""
    rows = []
    for ci in range(7):
        n = 40000 + ci * 777
        rows += [("ctg%02d" % ci, i, i + 1, (i * 7 + ci) % 900)
                 for i in range(n)]
    p = _write(tmp_path, "big.bg", rows)
    names, firsts, depth, bounds, ssum, trunc = _load_depth_streaming(p)
    assert names == ["ctg%02d" % i for i in range(7)]
    gen_names, gen_starts, gen_depths = _parse_bedgraph_numpy(p)
    for k in range(7):
        lo, hi = int(bounds[k]), int(bounds[k + 1])
        np.testing.assert_array_equal(depth[lo:hi], gen_depths[k])
