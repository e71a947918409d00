"""hapnetto diploid-panel pipeline end-to-end on synthetic data."""

import os

import numpy as np
import pytest

from cornetto_tpu.pipelines import create_cornetto, hapnetto


@pytest.fixture()
def created(tmp_path, synth, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(21)
    lens = {"ptg000001l": 100000, "ptg000002l": 60000, "ptg000003l": 30000,
            "ptg000004l": 12000, "ptg000005l": 800}
    with open("panel.fasta", "w") as f:
        for name, ln in lens.items():
            f.write(">%s\n" % name)
            f.write("".join("ACGT"[i] for i in rng.integers(0, 4, ln)) + "\n")
    for suffix, src in ((".cov-total.bg", "cov-total.bg"),
                        (".cov-mq20.bg", "cov-mq20.bg"),
                        (".bp.p_ctg.lowQ.bed", "asm.bp.p_ctg.lowQ.bed")):
        (tmp_path / ("panel" + suffix)).write_text(
            (synth / src).read_text())
    create_cornetto.run("panel.fasta", backend="numpy")
    return tmp_path, lens


def _hap_paf(path, rng, lens, n_hits=10):
    names = list(lens)
    with open(path, "w") as f:
        for i in range(n_hits):
            tn = names[int(rng.integers(0, len(names)))]
            tl = lens[tn]
            span = int(rng.integers(500, max(tl // 2, 501)))
            ts = int(rng.integers(0, max(tl - span, 1)))
            ql = span + 1000
            f.write("hap%d\t%d\t0\t%d\t+\t%s\t%d\t%d\t%d\t%d\t%d\t60\n"
                    % (i, ql, span, tn, tl, ts, ts + span,
                       span - 10, span))


def test_recreate_hapnetto(tmp_path, synth, monkeypatch):
    from cornetto_tpu.pipelines import recreate_cornetto
    monkeypatch.chdir(tmp_path)
    (tmp_path / "asm.fasta").write_text((synth / "asm.fasta").read_text())
    (tmp_path / "asm.bp.p_ctg.lowQ.bed").write_text(
        (synth / "asm.bp.p_ctg.lowQ.bed").read_text())
    assert recreate_cornetto.run("asm.fasta") == 0
    rng = np.random.default_rng(23)
    lens = {l.split()[0]: int(l.split()[2])
            for l in open("tmp_recreate_cornetto/asm.chroms.bed")}
    _hap_paf("hap1.paf", rng, lens)
    _hap_paf("hap2.paf", rng, lens)
    rc = hapnetto.run("asm", hap1_paf="hap1.paf", hap2_paf="hap2.paf",
                      recreate=True)
    assert rc == 0
    assert os.path.exists("asm_dip.boringbits.bed")


def test_hapnetto(created):
    tmp_path, lens = created
    rng = np.random.default_rng(22)
    _hap_paf("hap1.paf", rng, lens)
    _hap_paf("hap2.paf", rng, lens)
    rc = hapnetto.run("panel", hap1_paf="hap1.paf", hap2_paf="hap2.paf")
    assert rc == 0
    assert os.path.exists("panel_dip.boringbits.bed")
    assert os.path.exists("panel_dip.boringbits.txt")
    # rows lie inside their contigs; dip panel is a subset-coverage of the
    # primary panel (extra hap funbits can only remove boring regions)
    from cornetto_tpu.intervals import algebra
    dip = [(p[0], int(p[1]), int(p[2]))
           for p in (l.split() for l in open("panel_dip.boringbits.bed"))]
    prim = [(p[0], int(p[1]), int(p[2]))
            for p in (l.split() for l in open("panel.boringbits.bed"))]
    for c, s, e in dip:
        assert 0 <= s < e <= lens[c]
    assert not algebra.subtract(dip, prim)  # dip ⊆ primary
