"""BAM writing: BGZF writer, BamWriter/BaiBuilder, build_bai, sorted merge.

The reference only reads alignments (and only aspirationally — its depth
loop is a dead htslib skeleton, reference: src/depth_main.c:162-194); the
write side closes the loop for pipelines that re-emit alignments
(multi-flowcell merges, reference: shitflow/ postcall batch wrappers).
Contract tested here: whatever we write, our own reader + BAI ranged
fetches must see exactly the same alignments and depths.
"""

import os

import numpy as np
import pytest

from cornetto_tpu.io.bam import (BamFile, BamWriter, _iter_raw_records,
                                 build_bai, depth_arrays, depth_region,
                                 merge_sorted_bams)

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLE = os.path.join(HERE, "test_data", "example.bam")


def _raw_records(bam):
    return list(_iter_raw_records(bam._all(), bam._aln_off))


def test_bgzf_writer_roundtrip(tmp_path):
    from cornetto_tpu.io.bgzf import BgzfFile, BgzfWriter
    rng = np.random.default_rng(7)
    # > _MAX_BLOCK so multiple blocks + a short tail block are exercised
    payload = rng.integers(0, 256, size=200_000, dtype=np.uint8).tobytes()
    p = tmp_path / "t.bgzf"
    with BgzfWriter(str(p), nthreads=2) as w:
        for i in range(0, len(payload), 9973):
            w.write(payload[i:i + 9973])
    f = BgzfFile(str(p))
    assert f.decompress_all() == payload
    assert f.n_blocks >= 4   # 3 data blocks + EOF marker


@pytest.mark.slow  # whole-file BGZF deflate/inflate, ~1-2 min
def test_bam_rewrite_identical(tmp_path):
    src = BamFile(EXAMPLE)
    out = str(tmp_path / "rw.bam")
    with BamWriter(out, src.ref_names, src.ref_lens,
                   header_text=src.header_text, build_index=True) as w:
        for payload, ref_id, pos, ref_end in _raw_records(src):
            w.write_raw(payload, ref_id, pos, ref_end)
    dst = BamFile(out)
    assert dst.ref_names == src.ref_names
    assert dst.ref_lens == src.ref_lens
    assert dst.header_text == src.header_text
    assert [p for p, *_ in _raw_records(dst)] \
        == [p for p, *_ in _raw_records(src)]
    for a, b in zip(depth_arrays(src), depth_arrays(dst)):
        np.testing.assert_array_equal(a, b)


def test_written_bai_ranged_fetch(tmp_path):
    src = BamFile(EXAMPLE)
    out = str(tmp_path / "rw.bam")
    with BamWriter(out, src.ref_names, src.ref_lens,
                   header_text=src.header_text, build_index=True) as w:
        for payload, ref_id, pos, ref_end in _raw_records(src):
            w.write_raw(payload)     # ref/pos/end re-derived from payload
    assert os.path.exists(out + ".bai")
    dst = BamFile(out)
    assert dst.has_index()
    name = src.ref_names[0]
    L = src.ref_lens[0]
    for beg, end in [(0, 2000), (L // 3, L // 3 + 5000), (max(0, L - 3000), L)]:
        np.testing.assert_array_equal(
            depth_region(dst, name, beg, end),
            depth_region(src, name, beg, end))


def test_build_bai_on_existing(tmp_path):
    import shutil
    cp = str(tmp_path / "copy.bam")
    shutil.copyfile(EXAMPLE, cp)
    bam = BamFile(cp)
    assert not bam.has_index()
    build_bai(bam)
    assert bam.has_index()
    name = bam.ref_names[0]
    L = bam.ref_lens[0]
    ref = BamFile(EXAMPLE)   # uses the shipped (htslib-built) .bai
    for beg, end in [(0, 1000), (L // 2, L // 2 + 4000)]:
        got = sorted((a.pos, a.mapq, a.flag)
                     for a in bam.fetch(name, beg, end))
        want = sorted((a.pos, a.mapq, a.flag)
                      for a in ref.fetch(name, beg, end))
        assert got == want


@pytest.mark.slow  # whole-file BGZF deflate/inflate, ~1-2 min
def test_merge_sorted_bams(tmp_path):
    src = BamFile(EXAMPLE)
    recs = _raw_records(src)
    halves = [recs[0::2], recs[1::2]]   # both slices stay position-sorted
    parts = []
    for i, half in enumerate(halves):
        p = str(tmp_path / ("part%d.bam" % i))
        with BamWriter(p, src.ref_names, src.ref_lens,
                       header_text=src.header_text) as w:
            for payload, ref_id, pos, ref_end in half:
                w.write_raw(payload, ref_id, pos, ref_end)
        parts.append(p)
    merged = str(tmp_path / "merged.bam")
    merge_sorted_bams(parts, merged)
    m = BamFile(merged)
    assert len(_raw_records(m)) == len(recs)
    # position-sorted
    keyed = [(r if r >= 0 else 1 << 30, p)
             for _, r, p, _ in _raw_records(m)]
    assert keyed == sorted(keyed)
    for a, b in zip(depth_arrays(src), depth_arrays(m)):
        np.testing.assert_array_equal(a, b)
    # the merge-built .bai serves ranged reads
    name = src.ref_names[0]
    np.testing.assert_array_equal(depth_region(m, name, 100, 6000),
                                  depth_region(src, name, 100, 6000))


def test_merge_rejects_mismatched_refs(tmp_path):
    src = BamFile(EXAMPLE)
    a = str(tmp_path / "a.bam")
    b = str(tmp_path / "b.bam")
    with BamWriter(a, src.ref_names, src.ref_lens):
        pass
    with BamWriter(b, ["other"], [123]):
        pass
    with pytest.raises(ValueError):
        merge_sorted_bams([a, b], str(tmp_path / "out.bam"))


def test_write_record_fields_roundtrip(tmp_path):
    out = str(tmp_path / "synth.bam")
    with BamWriter(out, ["c1", "c2"], [10_000, 5_000],
                   header_text="@HD\tVN:1.6\tSO:coordinate\n",
                   build_index=True) as w:
        w.write_record("r1", 0, 0, 100, 60,
                       [("M", 50), ("I", 2), ("D", 3), ("M", 45)],
                       seq="A" * 97, qual=[30] * 97)
        w.write_record("r2", 16, 0, 900, 7, [("S", 5), ("M", 80)],
                       seq="ACGTN" * 17)
        w.write_record("r3", 0, 1, 42, 0, [("M", 30)], seq="G" * 30)
    bam = BamFile(out)
    alns = list(bam.alignments())
    assert [(a.ref_id, a.pos, a.mapq, a.flag) for a in alns] \
        == [(0, 100, 60, 0), (0, 900, 7, 16), (1, 42, 0, 0)]
    assert alns[0].cigar == [(0, 50), (1, 2), (2, 3), (0, 45)]
    assert alns[0].ref_len == 50 + 3 + 45
    # depth: r1 covers 100..198 minus the D unless include_dels
    d = depth_region(bam, "c1", 0, 1100)
    assert d[100] == 1 and d[149] == 1 and d[152] == 0  # D gap at 150..152
    dJ = depth_region(bam, "c1", 0, 1100, include_dels=True)
    assert dJ[152] == 1
    assert depth_region(bam, "c2", 40, 80)[2] == 1


def test_depth_write_native_matches_python(tmp_path):
    from cornetto_tpu.native import depth_write as dw
    rng = np.random.default_rng(3)
    depth = rng.integers(0, 70000, size=5000).astype(np.int64)
    depth[100:200] = 7   # a run for mode 2
    for mode in (dw.PER_BASE_BEDGRAPH, dw.SAMTOOLS_DEPTH,
                 dw.RUNLEN_BEDGRAPH):
        a = tmp_path / ("n%d.txt" % mode)
        b = tmp_path / ("p%d.txt" % mode)
        rn = dw.write_rows(str(a), "ctgX", depth, mode=mode, start0=17)
        rp = dw._write_rows_py(str(b), "ctgX", depth, mode, 17, False)
        assert rn == rp
        assert a.read_bytes() == b.read_bytes()
    # append mode stacks contigs
    out = tmp_path / "multi.bg"
    dw.write_rows(str(out), "c1", depth[:10], mode=0)
    dw.write_rows(str(out), "c2", depth[:5], mode=0, append=True)
    assert len(out.read_text().splitlines()) == 15


def test_depth_tool_native_stdout_matches_stringio(tmp_path):
    """The depth CLI's native /proc/self/fd fast path (real file) emits
    exactly what the Python formatter path (StringIO) emits."""
    import io as _io
    from cornetto_tpu.tools.depth import run
    sio = _io.StringIO()
    run(EXAMPLE, bedgraph=True, regions=[("chr22", 19979000, 19980500)],
        out=sio)
    p = tmp_path / "native.bg"
    with open(p, "w") as f:
        run(EXAMPLE, bedgraph=True,
            regions=[("chr22", 19979000, 19980500)], out=f)
    assert p.read_text() == sio.getvalue()
    sio2 = _io.StringIO()
    run(EXAMPLE, regions=[("chr22", 19979000, 19980500)], out=sio2)
    p2 = tmp_path / "native.txt"
    with open(p2, "w") as f:
        run(EXAMPLE, regions=[("chr22", 19979000, 19980500)], out=f)
    assert p2.read_text() == sio2.getvalue()
