"""BAM reader / depth sanity on the vendored reference test BAM
(reference: test/example.bam)."""

import numpy as np

from cornetto_tpu.io.bam import BamFile, depth_arrays


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
