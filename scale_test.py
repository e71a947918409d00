#!/usr/bin/env python3
"""Large-input scale test (BASELINE configs[2]/[3] shape): synthesizes a
multi-contig genome with depth tracks, runs the full panel + evaluation +
livefish chain, and (when the reference binary is available at $CORNETTO_C)
diffs the tool outputs byte-for-byte.

Not part of the CI suite (minutes of runtime); run manually:
    python3 scale_test.py [--mbp 50] [--workdir /tmp/scale]
"""

import argparse
import io
import os
import subprocess
import sys
import time

import numpy as np


def log(msg):
    sys.stderr.write("[scale] %s\n" % msg)


def _build_gen_track() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "test_data", "gen_track.c")
    exe = os.path.join(here, "test_data", "_gen_track")
    if (not os.path.exists(exe)
            or os.path.getmtime(exe) < os.path.getmtime(src)):
        subprocess.run(["cc", "-O2", src, "-lz", "-o", exe], check=True)
    return exe


def gen(workdir: str, mbp: float, gz: bool = False):
    rng = np.random.default_rng(50)
    bases = np.array(list("ACGT"))
    total = int(mbp * 1e6)
    lens = []
    while sum(lens) < total:
        lens.append(int(rng.integers(400_000, 9_000_000)))
    os.makedirs(workdir, exist_ok=True)
    fa = os.path.join(workdir, "asm.fasta")
    t0 = time.time()
    with open(fa, "w") as f:
        for i, ln in enumerate(lens):
            f.write(">ptg%06dl\n" % i)
            s = "".join(bases[rng.integers(0, 4, ln)])
            if i % 3 == 0:
                s = "TTAGGG" * 300 + s + "CCCTAA" * 300
            for j in range(0, len(s), 80):
                f.write(s[j:j + 80] + "\n")
    log("fasta %.1f Mbp in %.0fs" % (sum(lens) / 1e6, time.time() - t0))
    t0 = time.time()
    # native row generator (test_data/gen_track.c): pandas-side row
    # generation tops out around 15 MB/s — a 3 Gbp track is ~60 GB of
    # text.  Same seed => same depth walk, so mq <= total everywhere.
    exe = _build_gen_track()
    lens_path = os.path.join(workdir, "lens.tsv")
    with open(lens_path, "w") as f:
        for i, ln in enumerate(lens):
            ln_eff = ln + (3600 if i % 3 == 0 else 0)
            f.write("ptg%06dl\t%d\n" % (i, ln_eff))
    ext = ".gz" if gz else ""
    procs = [subprocess.Popen(
        [exe, lens_path, os.path.join(workdir, "asm" + suffix + ext),
         "50", str(jitter)])
        for suffix, jitter in ((".cov-total.bg", 0), (".cov-mq20.bg", 2))]
    for pr in procs:
        assert pr.wait() == 0
    log("bedgraphs%s in %.0fs" % (" (gz)" if gz else "", time.time() - t0))
    with open(os.path.join(workdir, "asm.bp.p_ctg.lowQ.bed"), "w") as f:
        for i, ln in enumerate(lens):
            for _ in range(3):
                a = int(rng.integers(0, max(ln - 50000, 1)))
                f.write("ptg%06dl\t%d\t%d\n" % (i, a, a + 20000))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=50)
    ap.add_argument("--workdir", default="/tmp/scale")
    args = ap.parse_args()
    wd = args.workdir
    gen(wd, args.mbp)
    os.chdir(wd)

    from cornetto_tpu.pipelines import create_cornetto, telostats
    from cornetto_tpu.tools import boringbits

    # oracle diff for the hot tool, when available
    oracle = os.environ.get("CORNETTO_C", "/tmp/refbuild/cornetto")
    if os.path.exists(oracle):
        t0 = time.time()
        subprocess.run([oracle, "noboringbits", "asm.cov-total.bg",
                        "-q", "asm.cov-mq20.bg"],
                       stdout=open("ref_fun.txt", "w"),
                       stderr=subprocess.DEVNULL)
        log("reference noboringbits %.1fs" % (time.time() - t0))
        t0 = time.time()
        out = io.StringIO()
        boringbits.run("asm.cov-total.bg", "asm.cov-mq20.bg",
                       boringbits.BoringbitsOptions(boring=False,
                                                    backend="numpy"),
                       out=out)
        open("my_fun.txt", "w").write(out.getvalue())
        log("our noboringbits %.1fs" % (time.time() - t0))
        same = open("ref_fun.txt").read() == open("my_fun.txt").read()
        log("noboringbits outputs identical: %s" % same)
        assert same

    t0 = time.time()
    if os.path.isdir("tmp_create_cornetto"):
        import shutil
        shutil.rmtree("tmp_create_cornetto")
    create_cornetto.run("asm.fasta", backend="numpy")
    log("create-panel %.1fs -> %s" % (
        time.time() - t0,
        sum(1 for _ in open("asm.boringbits.bed"))))

    t0 = time.time()
    telostats.run("asm.fasta", out=io.StringIO())
    log("telostats %.1fs" % (time.time() - t0))

    t0 = time.time()
    from cornetto_tpu.io.fasta import read_fastx
    from cornetto_tpu.livefish.index import build_index
    contigs = {r.name: r.seq for r in read_fastx("asm.fasta")}
    idx = build_index(contigs)
    log("livefish index %.1fs (%d entries, %d buckets x %d)" % (
        time.time() - t0, int(idx.shard_counts.sum()),
        idx.btable.shape[1], idx.bucket_slots))
    log("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
