"""Byte-parity: fa2bed, seq, nx, report, telocontigs, fixasm, minidot,
asmstats against C-oracle goldens."""

import io

from cornetto_tpu.tools import (asmstats, fa2bed, fixasm, minidot, nx, report,
                                seq, telocontigs)


def _cap(fn, *args, **kw):
    out = io.StringIO()
    fn(*args, out=out, **kw)
    return out.getvalue()


def test_fa2bed(synth, gold):
    assert _cap(fa2bed.run, str(synth / "asm.fasta")) == \
        (gold / "fa2bed.txt").read_text()


def test_seq_default(synth, gold):
    out, err = io.StringIO(), io.StringIO()
    seq.run(str(synth / "reads.fastq"), 30000, out=out, err=err)
    assert out.getvalue() == (gold / "seq_30k.txt").read_text()
    assert err.getvalue() == (gold / "seq_30k.stderr").read_text()


def test_seq_1k(synth, gold):
    out, err = io.StringIO(), io.StringIO()
    seq.run(str(synth / "reads.fastq"), 1000, out=out, err=err)
    assert out.getvalue() == (gold / "seq_1k.txt").read_text()
    assert err.getvalue() == (gold / "seq_1k.stderr").read_text()


def test_nx(synth, gold):
    assert _cap(nx.run, str(synth / "asm.fasta")) == \
        (gold / "nx.txt").read_text()


def test_ngx(synth, gold):
    assert _cap(nx.run, str(synth / "asm.fasta"), 200000) == \
        (gold / "ngx.txt").read_text()


def test_report(synth, gold):
    assert _cap(report.run, [str(synth / "asm.fasta"),
                             str(synth / "asm.fasta")]) == \
        (gold / "report.txt").read_text()


def test_telocontigs(synth, gold):
    got = _cap(telocontigs.run, str(synth / "asm.fasta"),
               str(gold / "telo.bed"))
    assert got == (gold / "telocontigs.txt").read_text()


def test_fixasm(synth, gold, tmp_path):
    out, err = io.StringIO(), io.StringIO()
    fixasm.run(str(synth / "asm.fasta"), str(synth / "asm_to_ref.paf"),
               missing_fn=str(tmp_path / "missing.txt"),
               report_fn=str(tmp_path / "report.tsv"),
               out_paf=str(tmp_path / "fixed.paf"), out=out, err=err)
    assert out.getvalue() == (gold / "fixasm_fixed.fasta").read_text()
    assert err.getvalue() == (gold / "fixasm.stderr").read_text()
    assert (tmp_path / "report.tsv").read_text() == \
        (gold / "fixasm_report.tsv").read_text()
    assert (tmp_path / "missing.txt").read_text() == \
        (gold / "fixasm_missing.txt").read_text()
    assert (tmp_path / "fixed.paf").read_text() == \
        (gold / "fixasm_fixed.paf").read_text()


def test_minidot(gold):
    got = _cap(minidot.run, str(gold / "fixasm_fixed.paf"), font_size=2)
    assert got == (gold / "minidot.eps").read_text()


def test_minidot_raw(synth, gold):
    got = _cap(minidot.run, str(synth / "asm_to_ref.paf"))
    assert got == (gold / "minidot_raw.eps").read_text()


def test_minidot_opts(synth, gold):
    got = _cap(minidot.run, str(synth / "asm_to_ref.paf"), min_match=50,
               min_iden=0.05, min_span=500, width=800, diagonal=False)
    assert got == (gold / "minidot_opts.eps").read_text()


def test_asmstats(gold, monkeypatch):
    # the first output line echoes the PAF path as given (reference :836);
    # the golden was generated with cwd = golden dir
    monkeypatch.chdir(gold)
    got = _cap(asmstats.run, "fixasm_fixed.paf", "telo_fixed.bed",
               "report_fixed.tsv")
    assert got == (gold / "asmstats.txt").read_text()


def test_asmstats_human1(gold, monkeypatch):
    monkeypatch.chdir(gold)
    got = _cap(asmstats.run, "fixasm_fixed.paf", "telo_fixed.bed",
               "report_fixed.tsv", order="human1")
    assert got == (gold / "asmstats_human1.txt").read_text()
