#!/usr/bin/env python3
"""Deterministic synthetic inputs for golden-diff tests.

The reference's own test inputs test/cov-total.bg + test/cov-mq20.bg are not
shipped in its repo (only the expected outputs are — see SURVEY.md §4), so we
synthesize equivalent inputs here and generate golden outputs by running the
*compiled reference C binary* on them (see gen_goldens.sh).  Tests then diff
our tools against those goldens byte-for-byte.

Everything is seeded; re-running reproduces identical files.
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "synth")


def gen_bedgraphs(rng):
    contigs = [("ptg000001l", 100000), ("ptg000002l", 60000),
               ("ptg000003l", 30000), ("ptg000004l", 12000),
               ("ptg000005l", 800)]
    with open(os.path.join(OUT, "cov-total.bg"), "w") as ft, \
         open(os.path.join(OUT, "cov-mq20.bg"), "w") as fm:
        for name, length in contigs:
            # integer random walk around ~30x
            steps = rng.integers(-1, 2, size=length)
            depth = np.clip(30 + np.cumsum(steps) // 3, 0, None)
            # coverage dropout region
            a = length // 4
            depth[a:a + length // 20] //= 10
            # high-coverage spike (collapsed repeat)
            b = length // 2
            depth[b:b + length // 30] *= 4
            # one absurd spike to exercise the 65535 clamp
            if name == "ptg000002l":
                depth[100:105] = 70000
            # mq depth: mostly equal, with a low-mappability stretch
            mq = depth.copy()
            c = (3 * length) // 5
            mq[c:c + length // 25] = mq[c:c + length // 25] // 5
            jitter = rng.integers(0, 3, size=length)
            mq = np.maximum(mq - jitter, 0)
            mq = np.minimum(mq, depth)
            for i in range(length):
                ft.write("%s\t%d\t%d\t%d\n" % (name, i, i + 1, depth[i]))
                fm.write("%s\t%d\t%d\t%d\n" % (name, i, i + 1, mq[i]))


DNA = np.array(list("ACGT"))


def _seq(rng, n):
    return "".join(DNA[rng.integers(0, 4, size=n)])


def gen_fasta(rng):
    """Assembly FASTA with telomere runs, low-complexity stretches, Ns."""
    telo = "TTAGGG"
    rtelo = "CCCTAA"
    recs = []
    # contig 1: telomeres both ends + internal low-complexity + internal telo
    s = (telo * 120 + _seq(rng, 1) + telo * 3
         + _seq(rng, 20000)
         + "AT" * 300 + telo * 8 + "TA" * 280
         + _seq(rng, 15000)
         + "N" * 50 + _seq(rng, 5000)
         + rtelo * 100)
    recs.append(("ctg1", s))
    # contig 2: telomere one end only, lowercase region (tests disambiguate)
    s = (_seq(rng, 12000) + _seq(rng, 3000).lower() + _seq(rng, 5000)
         + telo * 90 + "TTAGGC")
    recs.append(("ctg2", s))
    # contig 3: no telomeres, AC microsatellite
    s = _seq(rng, 8000) + "AC" * 500 + _seq(rng, 7000)
    recs.append(("ctg3", s))
    # contig 4: short, reverse-complement telomere at start
    s = rtelo * 50 + _seq(rng, 2500)
    recs.append(("ctg4", s))
    with open(os.path.join(OUT, "asm.fasta"), "w") as f:
        for name, s in recs:
            f.write(">%s\n" % name)
            for i in range(0, len(s), 80):
                f.write(s[i:i + 80] + "\n")
    return {n: len(s) for n, s in recs}


def gen_paf(rng, ctg_lens):
    """asm -> ref PAF resembling minimap2 asm5 output."""
    chrs = [("chr1", 120000), ("chr2", 90000), ("chr10", 70000),
            ("chrX", 50000)]
    rows = []
    names = list(ctg_lens)
    for qi, qname in enumerate(names):
        ql = ctg_lens[qname]
        nhits = int(rng.integers(2, 8))
        for _ in range(nhits):
            tn, tl = chrs[int(rng.integers(0, len(chrs)))]
            span = int(rng.integers(1000, max(ql // 2, 1001)))
            qs = int(rng.integers(0, max(ql - span, 1)))
            qe = qs + span
            ts = int(rng.integers(0, max(tl - span, 1)))
            te = ts + span
            strand = "+-"[int(rng.integers(0, 2))]
            ml = int(span * (0.85 + 0.1 * rng.random()))
            bl = span
            mapq = int(rng.integers(0, 61))
            tp = "tp:A:P" if rng.random() < 0.8 else "tp:A:S"
            rows.append((qname, ql, qs, qe, strand, tn, tl, ts, te, ml, bl,
                         mapq, tp))
    # make ctg1 majority-chr1 forward, ctg2 majority-chr2 reverse
    rows.append(("ctg1", ctg_lens["ctg1"], 0, 40000, "+", "chr1", 120000,
                 0, 40000, 39000, 40000, 60, "tp:A:P"))
    rows.append(("ctg2", ctg_lens["ctg2"], 0, 20000, "-", "chr2", 90000,
                 30000, 50000, 19500, 20000, 60, "tp:A:P"))
    with open(os.path.join(OUT, "asm_to_ref.paf"), "w") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")


def gen_beds(rng, ctg_lens):
    # lowQ bed (hifiasm-style), including some short rows to be filtered
    with open(os.path.join(OUT, "asm.bp.p_ctg.lowQ.bed"), "w") as f:
        for name, ln in ctg_lens.items():
            n = int(rng.integers(2, 6))
            for _ in range(n):
                a = int(rng.integers(0, max(ln - 100, 1)))
                b = min(ln, a + int(rng.integers(50, 20000)))
                if a < b:
                    f.write("%s\t%d\t%d\n" % (name, a, b))


def gen_fastq(rng):
    with open(os.path.join(OUT, "reads.fastq"), "w") as f:
        for i in range(200):
            n = int(rng.integers(100, 80000))
            s = _seq(rng, n)
            q = "".join(chr(33 + int(x)) for x in rng.integers(2, 40, size=n))
            comment = "ch=%d" % i if i % 3 == 0 else None
            hdr = "@read%d" % i + (("\t" + comment) if comment else "")
            f.write("%s\n%s\n+\n%s\n" % (hdr, s, q))


def main():
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260817)
    gen_bedgraphs(rng)
    ctg_lens = gen_fasta(rng)
    gen_paf(rng, ctg_lens)
    gen_beds(rng, ctg_lens)
    gen_fastq(rng)
    print("synthetic inputs written to", OUT)


if __name__ == "__main__":
    main()
