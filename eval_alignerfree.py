#!/usr/bin/env python3
"""Quantify the aligner-free approximate-panel mode against the exact
aligned-track panel on the same synthetic genome + reads (round-2 verdict
item #6 — replaces the "validated at Mb scale" hand-waving with numbers).

Ground truth stands in for a perfect aligner: reads are sampled with
known positions, so the exact 1-bp depth tracks (total + MQ>=20, where
reads wholly inside either copy of an exact repeat are MAPQ-0/excluded,
as minimap2 would) are computable directly.  Both track sets then run
through the UNMODIFIED create-cornetto panel chain:

    exact tracks  -> create_cornetto.run(...)                 -> panel A
    decision-hit tallies (livefish.coverage) -> ranged tracks
                  -> create_cornetto.run(..., ranged=True)    -> panel B

and the script reports per-base panel agreement plus the two
safety-relevant recalls (boring = rejected, fun = kept sequencing).

Genome stress features: a 100 kb coverage hole (unsequenced — must stay
OUT of the reject panel: the whole point of the protocol), a 100 kb exact
repeat (MAPQ-ambiguous for a real aligner), and a clean 1 Mb contig.

Writes EVAL_ALIGNERFREE.json and prints a markdown table (pasted into
docs/protocol.md).
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

L = 450
DEPTH = 20
HOLE = (1_200_000, 1_300_000)
REP_SRC = (500_000, 600_000)
REP_DST = (2_000_000, 2_100_000)
LEN_A, LEN_B = 3_000_000, 1_000_000


def build_world(rng):
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    a = bases[rng.integers(0, 4, LEN_A, dtype=np.int64)]
    a[REP_DST[0]:REP_DST[1]] = a[REP_SRC[0]:REP_SRC[1]]
    b = bases[rng.integers(0, 4, LEN_B, dtype=np.int64)]
    genome = {"ctgA": a.tobytes().decode(), "ctgB": b.tobytes().decode()}

    reads = []   # (ctg, start)
    for name, ln in (("ctgA", LEN_A), ("ctgB", LEN_B)):
        n = ln * DEPTH // L
        starts = rng.integers(0, ln - L, size=n)
        if name == "ctgA":
            keep = (starts + L <= HOLE[0]) | (starts >= HOLE[1])
            starts = starts[keep]
        reads += [(name, int(s)) for s in starts]
    rng.shuffle(reads)
    return genome, reads


def exact_tracks(reads):
    """Perfect-aligner depth tracks from the known placements."""
    tot = {"ctgA": np.zeros(LEN_A + 1, np.int64),
           "ctgB": np.zeros(LEN_B + 1, np.int64)}
    mq = {"ctgA": np.zeros(LEN_A + 1, np.int64),
          "ctgB": np.zeros(LEN_B + 1, np.int64)}
    for ctg, s in reads:
        tot[ctg][s] += 1
        tot[ctg][s + L] -= 1
        ambiguous = ctg == "ctgA" and (
            (s >= REP_SRC[0] and s + L <= REP_SRC[1])
            or (s >= REP_DST[0] and s + L <= REP_DST[1]))
        if not ambiguous:
            mq[ctg][s] += 1
            mq[ctg][s + L] -= 1
    return ({c: np.cumsum(v[:-1]) for c, v in tot.items()},
            {c: np.cumsum(v[:-1]) for c, v in mq.items()})


def write_1bp_bedgraph(path, tracks):
    with open(path, "wb") as f:
        for ctg, d in tracks.items():
            pos = np.arange(len(d), dtype=np.int64)
            cols = np.char.add(
                np.char.add("%s\t" % ctg, pos.astype(str)),
                np.char.add("\t", (pos + 1).astype(str)))
            rows = np.char.add(np.char.add(cols, "\t"),
                               d.astype(np.int64).astype(str))
            f.write("\n".join(rows).encode() + b"\n")


def write_fasta(path, genome):
    with open(path, "w") as f:
        for name, seq in genome.items():
            f.write(">%s\n" % name)
            for i in range(0, len(seq), 80):
                f.write(seq[i:i + 80] + "\n")


def write_lowq(path):
    with open(path, "w") as f:
        f.write("ctgA\t700000\t712000\n")
        f.write("ctgB\t300000\t309000\n")


def panel_mask_from_bed(path):
    masks = {"ctgA": np.zeros(LEN_A, bool), "ctgB": np.zeros(LEN_B, bool)}
    with open(path) as f:
        for line in f:
            c, s, e = line.split()[:3]
            masks[c][int(s):int(e)] = True
    return masks


def run_panel(workdir, genome, tracks=None, ranged_paths=None):
    from cornetto_tpu.pipelines import create_cornetto
    os.makedirs(workdir, exist_ok=True)
    cwd = os.getcwd()
    fa = os.path.join(workdir, "asm.fasta")
    write_fasta(fa, genome)
    write_lowq(os.path.join(workdir, "asm.bp.p_ctg.lowQ.bed"))
    if tracks is not None:
        write_1bp_bedgraph(os.path.join(workdir, "asm.cov-total.bg"),
                           tracks[0])
        write_1bp_bedgraph(os.path.join(workdir, "asm.cov-mq20.bg"),
                           tracks[1])
    else:
        shutil.copy(ranged_paths[0],
                    os.path.join(workdir, "asm.cov-total.bg"))
        shutil.copy(ranged_paths[1],
                    os.path.join(workdir, "asm.cov-mq20.bg"))
    os.chdir(workdir)
    try:
        create_cornetto.run("asm.fasta", backend="numpy",
                            ranged_bedgraph=tracks is None)
    finally:
        os.chdir(cwd)
    return panel_mask_from_bed(os.path.join(workdir, "asm.boringbits.bed"))


def main() -> int:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from cornetto_tpu.kernels.minimizer import encode_seq
    from cornetto_tpu.livefish.coverage import CoverageParams, CoverageTally
    from cornetto_tpu.livefish.decide import SingleChipEngine
    from cornetto_tpu.livefish.index import build_index

    rng = np.random.default_rng(2024)
    genome, reads = build_world(rng)
    log = lambda m: sys.stderr.write("[eval] %s\n" % m)  # noqa: E731
    log("%d reads (~%dx)" % (len(reads), DEPTH))

    wd = tempfile.mkdtemp(prefix="alignerfree_eval_")

    # ---- exact (perfect-aligner) panel --------------------------------
    t0 = time.time()
    tot, mq = exact_tracks(reads)
    panel_exact = run_panel(os.path.join(wd, "exact"), genome, (tot, mq))
    log("exact panel in %.0fs" % (time.time() - t0))

    # ---- aligner-free panel: decisions -> tallies -> ranged tracks ----
    t0 = time.time()
    idx = build_index(genome, n_shards=1)
    eng = SingleChipEngine(idx, np.zeros((2, 128), bool))
    tally = CoverageTally(idx, CoverageParams())
    B = 4096
    codes = np.empty((B, L), np.uint8)
    lengths = np.full(B, L, np.int32)
    i = 0
    while i < len(reads):
        n = min(B, len(reads) - i)
        for j in range(n):
            ctg, s = reads[i + j]
            codes[j] = encode_seq(genome[ctg][s:s + L])
        codes[n:] = 0
        d, best, est, nhits, nhits_hq, est2 = eng.decide(codes)
        tally.update(np.asarray(best)[:n], np.asarray(est)[:n],
                     np.asarray(est2)[:n], np.asarray(nhits)[:n],
                     np.asarray(nhits_hq)[:n], lengths[:n])
        i += n
    rp = (os.path.join(wd, "af.cov-total.bg"),
          os.path.join(wd, "af.cov-mq20.bg"))
    tally.write_bedgraphs(*rp)
    panel_af = run_panel(os.path.join(wd, "af"), genome, ranged_paths=rp)
    log("aligner-free panel in %.0fs" % (time.time() - t0))

    # ---- metrics -------------------------------------------------------
    res = {"n_reads": len(reads), "depth": DEPTH, "read_len": L}
    inter = union = b_exact = b_af = hit = 0
    fun_exact = fun_hit = 0
    for c in ("ctgA", "ctgB"):
        e, a = panel_exact[c], panel_af[c]
        inter += int((e & a).sum())
        union += int((e | a).sum())
        b_exact += int(e.sum())
        b_af += int(a.sum())
        hit += int((e & a).sum())
        fun_exact += int((~e).sum())
        fun_hit += int((~e & ~a).sum())
    res["panel_jaccard"] = round(inter / union, 4) if union else 1.0
    res["boring_recall"] = round(hit / b_exact, 4) if b_exact else 1.0
    res["boring_precision"] = round(inter / b_af, 4) if b_af else 1.0
    res["fun_recall"] = round(fun_hit / fun_exact, 4)
    res["panel_bases_exact"] = b_exact
    res["panel_bases_alignerfree"] = b_af

    # stress features: are they fun (kept) in both panels?
    for name, (lo, hi) in (("hole", HOLE), ("repeat_copy", REP_DST),
                           ("repeat_src", REP_SRC)):
        res["%s_in_reject_panel_exact" % name] = \
            bool(panel_exact["ctgA"][lo:hi].any())
        res["%s_in_reject_panel_alignerfree" % name] = \
            bool(panel_af["ctgA"][lo:hi].any())

    # binned total-depth error (the track itself, bin=1000)
    t = tally.counts()
    errs = []
    for ci, (c, ln) in enumerate((("ctgA", LEN_A), ("ctgB", LEN_B))):
        nb = ln // 1000
        true_b = tot[c][:nb * 1000].reshape(nb, 1000).sum(1) / 1000.0
        est_b = t[0, ci, :nb] / 1000.0
        sel = true_b > 1   # covered bins
        errs.append(np.abs(est_b[sel] - true_b[sel]) / true_b[sel])
    rel = np.concatenate(errs)
    res["total_track_bin_rel_err_median"] = round(
        float(np.median(rel)), 4)
    res["total_track_bin_rel_err_p95"] = round(
        float(np.percentile(rel, 95)), 4)

    with open("EVAL_ALIGNERFREE.json", "w") as f:
        json.dump(res, f, indent=1)

    print("| metric | value |")
    print("|---|---|")
    for k, v in res.items():
        print("| %s | %s |" % (k, v))
    shutil.rmtree(wd, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
