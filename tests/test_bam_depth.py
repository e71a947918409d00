"""BAM reader / depth sanity on the vendored reference test BAM
(reference: test/example.bam), plus BGZF block layer + BAI ranged reads."""

import io

import numpy as np

from cornetto_tpu.io.bam import BamFile, depth_arrays, depth_region


def test_header(bigenough_fixtures):
    bam = BamFile(str(bigenough_fixtures.parent / "example.bam"))
    assert bam.ref_names[0] == "chr1"
    assert bam.ref_lens[0] == 248956422
    assert len(bam.ref_names) == 195


def test_depth_consistency(bigenough_fixtures):
    bam = BamFile(str(bigenough_fixtures.parent / "example.bam"))
    alns = list(bam.alignments())
    assert len(alns) == 50
    # total depth equals total aligned (M/=/X) bases of kept alignments
    kept = [a for a in alns if not (a.flag & 0x704)]
    want = sum(ln for a in kept for op, ln in a.cigar if op in (0, 7, 8))
    depths = depth_arrays(bam)
    got = sum(int(d.sum()) for d in depths)
    assert got == want
    # mapq filter only reduces coverage
    d20 = depth_arrays(bam, min_mapq=20)
    for a, b in zip(depths, d20):
        assert np.all(b <= a)


def test_bgzf_block_table(bigenough_fixtures):
    from cornetto_tpu.io.bgzf import BgzfFile
    bg = BgzfFile(str(bigenough_fixtures.parent / "example.bam"))
    assert bg.n_blocks > 1
    # parallel block inflate == gzip.decompress of the whole stream
    import gzip
    whole = gzip.decompress(
        open(str(bigenough_fixtures.parent / "example.bam"), "rb").read())
    assert bg.decompress_all() == whole
    assert int(bg.ucum[-1]) == len(whole)


def test_bai_fetch_matches_full_scan(bigenough_fixtures):
    """Ranged reads via the .bai touch only indexed blocks but must see
    exactly the alignments a full scan sees (the example BAM's reads all
    sit on chr22 ~20 Mb)."""
    bam = BamFile(str(bigenough_fixtures.parent / "example.bam"))
    assert bam.has_index()
    rid = bam.ref_names.index("chr22")
    full = [a for a in bam.alignments() if a.ref_id == rid]
    lo = min(a.pos for a in full)
    hi = max(a.pos + a.ref_len for a in full)
    got = list(bam.fetch("chr22", lo, hi))
    assert len(got) == len(full) == 50
    # region depth == slice of the whole-file depth, with + without mapq
    dfull = depth_arrays(bam)[rid]
    np.testing.assert_array_equal(depth_region(bam, "chr22", lo, hi),
                                  dfull[lo:hi])
    mid = (lo + hi) // 2
    d20 = depth_arrays(bam, min_mapq=20)[rid]
    np.testing.assert_array_equal(
        depth_region(bam, "chr22", mid, mid + 777, min_mapq=20),
        d20[mid:mid + 777])
    # a region before any alignment is empty
    assert int(depth_region(bam, "chr22", 0, 5000).sum()) == 0


def test_depth_tool_regions(bigenough_fixtures):
    from cornetto_tpu.tools import depth as depth_tool
    bam_path = str(bigenough_fixtures.parent / "example.bam")
    bam = BamFile(bam_path)
    rid = bam.ref_names.index("chr22")
    full = [a for a in bam.alignments() if a.ref_id == rid]
    lo = min(a.pos for a in full)
    out = io.StringIO()
    depth_tool.run(bam_path, regions=[("chr22", lo, lo + 10)], out=out)
    lines = out.getvalue().splitlines()
    assert len(lines) == 10
    name, pos, v = lines[0].split("\t")
    assert name == "chr22" and int(pos) == lo + 1   # 1-based samtools rows
    dfull = depth_arrays(bam)[rid]
    got = [int(l.split("\t")[2]) for l in lines]
    assert got == [int(x) for x in dfull[lo:lo + 10]]
