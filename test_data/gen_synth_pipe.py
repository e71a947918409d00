#!/usr/bin/env python3
"""Pipeline-scale deterministic synthetic inputs for COMPOSED pipeline
byte-parity tests (VERDICT.md round-1 item #1).

The small `gen_synth.py` contigs (<= 100 kb) sit below every contig-size
threshold in the panel pipelines (800 kb / 1 Mb contig filters, 200 kb
edges, 1 Mb noboringbits min-contig), so composed pipeline outputs on them
are trivially empty.  This generator builds a ~6 Mb assembly whose contigs
straddle each threshold:

    ctgA  2,800,000  clean coverage, telomeres both ends  -> panel survives
    ctgB  1,600,000  anomaly-dense                        -> bigenough drops
    ctgC    900,000  clean, telo one end   -> kept by create (>=800k),
                                              dropped by recreate (<1Mb)
    ctgD    400,000  short-contig filtered everywhere
    ctgE    250,000  >200k so edge windows fire, still short-filtered
    ctgF     30,000  tiny

plus 1-bp-resolution cov-total/cov-mq20 bedgraphs (samtools depth -aa
format, reference: shitflow/create-launch.pbs.sh:66-67), a hifiasm-style
lowQ BED with rows straddling the 7.5 kb / 8 kb cutoffs, and hap1/hap2
assemblies CONSTRUCTED as exact segment copies of the primary so their
alignment PAFs are ground truth by construction (no aligner needed; the
golden harness substitutes a minimap2 shim that emits these PAFs, since
minimap2 is external to both the reference and this framework).

Everything is seeded and regenerated on demand (files are ~350 MB, too
large to check in; outputs/goldens ARE checked in).  numpy Generator
streams are reproducible across platforms by numpy's compatibility policy.
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "synth_pipe")
VERSION = "v3"  # bump to invalidate cached generated inputs

TELO = "TTAGGG"
RTELO = "CCCTAA"

CONTIGS = [
    ("ctgA", 2800000),
    ("ctgB", 1600000),
    ("ctgC", 900000),
    ("ctgD", 400000),
    ("ctgE", 250000),
    ("ctgF", 30000),
]

DNA = np.frombuffer(b"ACGT", dtype=np.uint8)


def _seq_arr(rng, n):
    return DNA[rng.integers(0, 4, size=n)]


def _plant(arr, pos, motif_bytes):
    arr[pos:pos + len(motif_bytes)] = np.frombuffer(motif_bytes,
                                                    dtype=np.uint8)


def gen_fasta(rng):
    seqs = {}
    for name, ln in CONTIGS:
        a = _seq_arr(rng, ln)
        if name == "ctgA":
            _plant(a, 0, (RTELO * 520).encode())
            _plant(a, ln - len(TELO) * 510, (TELO * 510).encode())
        elif name == "ctgB":
            # internal telomere run (must NOT reach the ends BED)
            _plant(a, 800000, (TELO * 300).encode())
        elif name == "ctgC":
            # run with a one-base interruption near the end
            _plant(a, ln - 2500, (TELO * 300).encode()[:2400])
            _plant(a, ln - 90, (TELO * 15).encode())
        elif name == "ctgE":
            _plant(a, ln - len(TELO) * 220, (TELO * 220).encode())
        seqs[name] = a
    path = os.path.join(OUT, "pasm.fasta")
    with open(path, "wb") as f:
        for name, _ in CONTIGS:
            f.write(b">" + name.encode() + b"\n")
            a = seqs[name]
            # 80-col wrap, vectorised
            for off in range(0, len(a), 8000000):
                chunk = a[off:off + 8000000]
                pad = (-len(chunk)) % 80
                m = np.concatenate(
                    [chunk, np.full(pad, ord("\n"), np.uint8)]).reshape(-1, 80)
                m = np.concatenate(
                    [m, np.full((m.shape[0], 1), ord("\n"), np.uint8)],
                    axis=1)
                b = m.tobytes()
                if pad:
                    b = b[:-(pad + 1)] + b"\n"
                f.write(b)
    return seqs


def _depth_profile(rng, name, ln):
    """Integer depth ~30x with designed anomalies."""
    steps = rng.integers(-1, 2, size=ln)
    depth = 30 + np.cumsum(steps) // 50
    # keep the baseline walk well inside the (0.4x, 2.5x) window so only the
    # designed anomalies below violate the thresholds
    np.clip(depth, 25, 38, out=depth)
    mq = depth.copy()
    if name == "ctgA":
        depth[1200000:1250000] = 2          # dropout -> funbit
        depth[2000000:2005000] = 150        # collapsed-repeat spike
        mq[600000:640000] = depth[600000:640000] // 10  # low-mappability
    elif name == "ctgB":
        # two dropouts + a long low-MQ stretch whose extended funbits merge
        # (-d 200000) into one block: boring fraction lands below
        # bigenough's 50% in create-cornetto, while recreate-cornetto
        # (no coverage input) keeps the contig -> both bigenough paths fire
        depth[500000:580000] = 2
        depth[1000000:1080000] = 2
        mq[650000:900000] = depth[650000:900000] // 10
    else:
        pass  # clean
    mq = np.minimum(mq, depth)
    return depth.astype(np.int64), mq.astype(np.int64)


def gen_bedgraphs(rng):
    import pandas as pd
    pt = os.path.join(OUT, "pasm.cov-total.bg")
    pm = os.path.join(OUT, "pasm.cov-mq20.bg")
    with open(pt, "w") as ft, open(pm, "w") as fm:
        for name, ln in CONTIGS:
            depth, mq = _depth_profile(rng, name, ln)
            pos = np.arange(ln, dtype=np.int64)
            df = pd.DataFrame({0: name, 1: pos, 2: pos + 1, 3: depth})
            df.to_csv(ft, sep="\t", header=False, index=False)
            df[3] = mq
            df.to_csv(fm, sep="\t", header=False, index=False)


def gen_lowq(rng):
    rows = []
    # >=8k rows (both pipelines), [7.5k,8k) rows (recreate only), <7.5k rows
    spans = {
        "ctgA": [(300000, 315000), (1700000, 1707800), (2400000, 2404000)],
        "ctgB": [(500000, 512000), (900000, 907600)],
        # no >=8k rows on ctgC: its 900k length only clears bigenough's 50%
        # with edge-window funbits alone; 457600-450000=7600 is the
        # recreate-only band [7.5k, 8k)
        "ctgC": [(450000, 457600), (600000, 603000)],
        "ctgD": [(100000, 111000)],
        "ctgF": [(1000, 9500)],
    }
    for name, _ in CONTIGS:
        for a, b in spans.get(name, []):
            rows.append((name, a, b))
    with open(os.path.join(OUT, "pasm.bp.p_ctg.lowQ.bed"), "w") as f:
        for r in rows:
            f.write("%s\t%d\t%d\n" % r)


# hap segments: (hap contig, [(primary, start, end, strand), ...])
HAP1 = [
    ("h1tig1", [("ctgA", 0, 1000000, "+")]),
    ("h1tig2", [("ctgA", 1050000, 1650000, "+"),
                ("ctgA", 1670000, 2200000, "+")]),   # merged by -d 1Mb
    ("h1tig3", [("ctgA", 2350000, 2800000, "+"),
                ("ctgB", 0, 500000, "+")]),          # split across targets
    ("h1tig4", [("ctgB", 550000, 1600000, "-")]),
    ("h1tig5", [("ctgC", 100000, 800000, "+")]),
    ("h1tig6", [("ctgD", 0, 400000, "+")]),
]
HAP2 = [
    ("h2tig1", [("ctgA", 0, 1500000, "+")]),
    ("h2tig2", [("ctgA", 1520000, 2800000, "+")]),
    ("h2tig3", [("ctgB", 0, 1600000, "+")]),
    ("h2tig4", [("ctgC", 0, 700000, "+")]),
    ("h2tig5", [("ctgE", 0, 250000, "-")]),
]

_COMP = np.zeros(256, dtype=np.uint8)
for _a, _b in zip(b"ACGTN", b"TGCAN"):
    _COMP[_a] = _b


def gen_haps(seqs):
    lens = dict(CONTIGS)
    for hap, segs in (("hap1", HAP1), ("hap2", HAP2)):
        fa = os.path.join(OUT, "pasm.%s.fasta" % hap)
        paf = os.path.join(OUT, "pasm_%s_to_asm.paf" % hap)
        with open(fa, "wb") as ff, open(paf, "w") as fp:
            for qname, parts in segs:
                pieces = []
                for tn, ts, te, strand in parts:
                    p = seqs[tn][ts:te]
                    pieces.append(_COMP[p][::-1] if strand == "-" else p)
                q = np.concatenate(pieces)
                ql = len(q)
                ff.write(b">" + qname.encode() + b"\n")
                for i in range(0, ql, 80):
                    ff.write(q[i:i + 80].tobytes() + b"\n")
                qs = 0
                for tn, ts, te, strand in parts:
                    span = te - ts
                    fp.write("%s\t%d\t%d\t%d\t%s\t%s\t%d\t%d\t%d\t%d\t%d"
                             "\t60\ttp:A:P\n"
                             % (qname, ql, qs, qs + span, strand, tn,
                                lens[tn], ts, te, span, span))
                    qs += span


def ensure(force=False) -> str:
    """Generate (or reuse cached) inputs; returns the directory."""
    stamp = os.path.join(OUT, ".complete-" + VERSION)
    if os.path.exists(stamp) and not force:
        return OUT
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(20260819)
    seqs = gen_fasta(rng)
    gen_bedgraphs(rng)
    gen_lowq(rng)
    gen_haps(seqs)
    with open(stamp, "w") as f:
        f.write("ok\n")
    return OUT


if __name__ == "__main__":
    print("pipeline-scale synthetic inputs:", ensure(force=True))
