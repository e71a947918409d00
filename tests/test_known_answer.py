"""Known-answer check for the telostats histogram (docs/protocol.md).

The reference's documented acceptance number is "46 contigs with 2
telomeres" on the HG002 Q100 assembly (/root/reference/docs/toolkit.md:
35-40).  That assembly cannot be fetched here (no network egress), so this
fixture pins the same counting logic on a synthetic diploid-scale
assembly constructed to contain EXACTLY 46 two-telomere contigs, plus
decoys that must not perturb the count:

- 3 contigs with a telomere at one end only            -> "1 telo" bucket
- 1 contig with no telomere but an INTERIOR motif run  -> counted nowhere
  (interior runs merge into a window that misses both 50-kb end windows)
- sub-threshold motif stubs (300 bp < 0.4 coverage of any 1000-bp
  telowin window) on several contigs                   -> counted nowhere
"""

import io
import os

import numpy as np
import pytest

from cornetto_tpu.pipelines import telostats

MOTIF = "TTAGGG"
RC = "CCCTAA"


def _rand(rng, n):
    return "".join(np.array(list("ACGT"))[rng.integers(0, 4, n)])


@pytest.fixture(scope="module")
def known_answer_fasta(tmp_path_factory):
    rng = np.random.default_rng(4242)
    tmp = tmp_path_factory.mktemp("known_answer")
    path = os.path.join(str(tmp), "q100ish.fasta")
    run = MOTIF * 400          # 2400 bp clean tandem run (>> telowin bar)
    rrun = RC * 400
    stub = MOTIF * 50          # 300 bp: < 0.4 of any 1000-bp window
    with open(path, "w") as f:
        for i in range(46):    # two-telomere contigs, > 2x50 kb long
            mid = _rand(rng, 110_000)
            f.write(">t2_%d\n%s%s%s\n" % (i, rrun, mid, run))
        for i in range(3):     # one-telomere contigs
            mid = _rand(rng, 105_000)
            decoy = stub if i == 0 else ""
            f.write(">t1_%d\n%s%s%s\n" % (i, rrun, mid, decoy))
        # zero-telomere contig with an interior run placed mid-contig,
        # > 50 kb away from both ends
        f.write(">t0_0\n%s%s%s\n"
                % (_rand(rng, 60_000), run, _rand(rng, 60_000)))
    return path


def test_telostats_known_answer_histogram(known_answer_fasta, tmp_path):
    buf = io.StringIO()
    bed = telostats.run(known_answer_fasta, out_dir=str(tmp_path), out=buf)
    text = buf.getvalue()
    assert "contigs with 2 telo:\t46\n" in text
    assert "contigs with 1 telo:\t3\n" in text
    assert "contigs with more than 2 telo:\t0\n" in text
    # 46*2 + 3*1 end regions in the final bed
    with open(bed) as f:
        assert sum(1 for _ in f) == 95
    assert "total telomere regions at the end of contigs:\t95\n" in text
