"""End-to-end pipeline tests on the synthetic data set."""

import io
import os

import pytest

from cornetto_tpu.pipelines import create_cornetto, recreate_cornetto, telostats


@pytest.fixture()
def workdir(tmp_path, synth):
    # stage inputs under the expected sibling names
    (tmp_path / "asm.fasta").write_text((synth / "asm.fasta").read_text())
    (tmp_path / "asm.cov-total.bg").write_text(
        (synth / "cov-total.bg").read_text())
    (tmp_path / "asm.cov-mq20.bg").write_text(
        (synth / "cov-mq20.bg").read_text())
    (tmp_path / "asm.bp.p_ctg.lowQ.bed").write_text(
        (synth / "asm.bp.p_ctg.lowQ.bed").read_text())
    return tmp_path


def test_create_cornetto(workdir, monkeypatch, capfd):
    monkeypatch.chdir(workdir)
    # the synthetic contigs use the bedgraph names (ptg*), so build a fasta
    # whose names match the coverage tracks for the panel pipeline
    import numpy as np
    rng = np.random.default_rng(7)
    lens = {"ptg000001l": 100000, "ptg000002l": 60000, "ptg000003l": 30000,
            "ptg000004l": 12000, "ptg000005l": 800}
    with open("panel.fasta", "w") as f:
        for name, ln in lens.items():
            f.write(">%s\n" % name)
            f.write("".join("ACGT"[i] for i in rng.integers(0, 4, ln)) + "\n")
    os.rename("asm.cov-total.bg", "panel.cov-total.bg")
    os.rename("asm.cov-mq20.bg", "panel.cov-mq20.bg")
    os.rename("asm.bp.p_ctg.lowQ.bed", "panel.bp.p_ctg.lowQ.bed")
    rc = create_cornetto.run("panel.fasta", backend="numpy")
    assert rc == 0
    assert os.path.exists("panel.boringbits.bed")
    assert os.path.exists("panel.boringbits.txt")
    assert os.path.exists("tmp_create_cornetto/funbits_merged.bed")
    # panel rows must be within their contigs and non-empty tmp chain
    for line in open("tmp_create_cornetto/boringbits.bed"):
        c, s, e = line.split()
        assert int(s) < int(e) <= lens[c]
    # readfish csv is +/- duplicated rows of the final bed
    bed_rows = open("panel.boringbits.bed").read().splitlines()
    csv_rows = open("panel.boringbits.txt").read().splitlines()
    assert len(csv_rows) == 2 * len(bed_rows)


def test_recreate_cornetto(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    rc = recreate_cornetto.run("asm.fasta")
    assert rc == 0
    assert os.path.exists("asm.boringbits.bed")
    # chroms bed is length-sorted descending
    lens = [int(l.split()[2])
            for l in open("tmp_recreate_cornetto/asm.chroms.bed")]
    assert lens == sorted(lens, reverse=True)


def test_telostats(workdir, monkeypatch):
    monkeypatch.chdir(workdir)
    out = io.StringIO()
    bed = telostats.run("asm.fasta", out=out)
    assert os.path.exists(bed)
    text = out.getvalue()
    assert "contigs with 2 telo" in text
    # ctg1 has telomeres at both ends in the synthetic assembly
    rows = [l.split() for l in open(bed)]
    ctgs = {r[0] for r in rows}
    assert "ctg1" in ctgs
