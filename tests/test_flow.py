"""Flow runner: one full iteration over a synthetic BAM-less setup with
resume-on-artifacts semantics."""

import json
import os

import numpy as np
import pytest

from cornetto_tpu.flow.runner import Flow, iteration_flow

BASES = np.array(list("ACGT"))


def test_resume_skips_finished(tmp_path):
    calls = []
    flow = Flow("t", str(tmp_path))

    def mk(name):
        def fn(ctx):
            calls.append(name)
            open(ctx.path(name + ".out"), "w").write("x")
        return fn
    flow.add("a", mk("a"), outputs=["a.out"])
    flow.add("b", mk("b"), outputs=["b.out"], after=["a"])
    assert flow.run() == 0
    assert calls == ["a", "b"]
    # resume: nothing re-runs
    flow2 = Flow("t", str(tmp_path))
    flow2.add("a", mk("a"), outputs=["a.out"])
    flow2.add("b", mk("b"), outputs=["b.out"], after=["a"])
    assert flow2.run() == 0
    assert calls == ["a", "b"]
    # deleting an artifact re-runs only that step
    os.unlink(tmp_path / "b.out")
    flow3 = Flow("t", str(tmp_path))
    flow3.add("a", mk("a"), outputs=["a.out"])
    flow3.add("b", mk("b"), outputs=["b.out"], after=["a"])
    assert flow3.run() == 0
    assert calls == ["a", "b", "b"]


def test_iteration_flow_aligner_free(tmp_path):
    """Full iteration with config {"aligner_free": true}: depth tracks come
    from livefish coverage tallies, the panel from ranged bedgraphs — no
    minimap2, samtools, or BAM anywhere."""
    rng = np.random.default_rng(23)
    big = "".join(BASES[rng.integers(0, 4, 2_500_000)])
    small = "".join(BASES[rng.integers(0, 4, 300_000)])
    fasta = tmp_path / "draft.fasta"
    fasta.write_text(">big\n%s\n>small\n%s\n" % (big, small))
    (tmp_path / "draft.bp.p_ctg.lowQ.bed").write_text("")
    # ~6x uniform reads over `big` only
    L = 450
    n_reads = 2_500_000 * 6 // L
    reads = tmp_path / "reads.fastq"
    with reads.open("w") as f:
        for i in range(n_reads):
            s = int(rng.integers(0, 2_500_000 - L))
            f.write("@r%d\n%s\n+\n%s\n" % (i, big[s:s + L], "I" * L))
    wd = str(tmp_path / "wd")
    flow = iteration_flow(wd, str(fasta), str(reads),
                          {"aligner_free": True, "cov_batch": 2048})
    assert flow.run() == 0
    rows = [l.split("\t") for l in
            open(os.path.join(wd, "draft.boringbits.bed"))
            .read().splitlines()]
    assert rows and all(r[0] == "big" for r in rows)
    assert sum(int(r[2]) - int(r[1]) for r in rows) > 1_000_000
    assert os.path.exists(os.path.join(wd, "draft.livefish.npz"))
    assert os.path.exists(os.path.join(wd, "draft.telostats.txt"))
    # resume: a second run re-does nothing (all artifacts present)
    flow2 = iteration_flow(wd, str(fasta), str(reads),
                           {"aligner_free": True})
    assert flow2.run() == 0


def test_iteration_flow(tmp_path, monkeypatch):
    rng = np.random.default_rng(11)
    # a small "draft assembly" + fake coverage tracks + lowQ bed + reads
    ctg = "".join(BASES[rng.integers(0, 4, 50000)])
    fasta = tmp_path / "draft.fasta"
    fasta.write_text(">ptg1\n%s\n" % ctg)
    reads = tmp_path / "reads.fastq"
    with reads.open("w") as f:
        for i in range(30):
            s = int(rng.integers(0, 49000))
            sq = ctg[s:s + 800]
            f.write("@r%d\n%s\n+\n%s\n" % (i, sq, "I" * len(sq)))
    lowq = tmp_path / "draft.bp.p_ctg.lowQ.bed"
    lowq.write_text("ptg1\t100\t9000\n")
    work = tmp_path / "work"
    flow = iteration_flow(str(work), str(fasta), str(reads))

    # patch the external-aligner step with a synthetic coverage writer
    def fake_align(ctx):
        open(ctx.path("draft.bam"), "w").write("")
    def fake_depth(ctx):
        depth = np.clip(30 + rng.integers(-2, 3, 50000), 0, None)
        for name, arr in (("draft.cov-total.bg", depth),
                          ("draft.cov-mq20.bg", np.maximum(depth - 1, 0))):
            with open(ctx.path(name), "w") as f:
                f.write("".join("ptg1\t%d\t%d\t%d\n" % (i, i + 1, v)
                                for i, v in enumerate(arr)))
    flow.steps[0].run = fake_align
    flow.steps[1].run = fake_depth
    assert flow.run() == 0
    assert (work / "draft.boringbits.bed").exists()
    assert (work / "draft.telostats.txt").exists()
    assert (work / "draft.livefish.npz").exists()
    state = json.loads((work / ".flow.iteration.json").read_text())
    assert set(state["done"]) == {"align", "depth", "panel", "telostats",
                                  "livefish-index"}
