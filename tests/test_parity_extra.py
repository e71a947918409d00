"""Extra byte-parity coverage: --trim-pat-mat paths and FASTA chromosome
ordering in asmstats."""

import io


def _cap(fn, *args, **kw):
    out = io.StringIO()
    fn(*args, out=out, **kw)
    return out.getvalue()


def test_fixasm_trim(synth, gold, tmp_path):
    from cornetto_tpu.tools import fixasm
    out, err = io.StringIO(), io.StringIO()
    fixasm.run(str(synth / "asm.fasta"), str(gold / "trim_in.paf"),
               report_fn=str(tmp_path / "r.tsv"), trim_suffixes=True,
               out=out, err=err)
    assert out.getvalue() == (gold / "trim_fixed.fasta").read_text()
    assert (tmp_path / "r.tsv").read_text() == \
        (gold / "trim_report.tsv").read_text()


def test_asmstats_trim(gold, monkeypatch):
    # the reference errors out mid-report on this input (zero-length
    # chromosome after trimming) — parity means the same partial output
    # and a failing exit
    import pytest
    from cornetto_tpu.tools import asmstats
    monkeypatch.chdir(gold)
    out = io.StringIO()
    with pytest.raises(SystemExit):
        asmstats.run("trim_in.paf", "telo.bed", "report_fixed.tsv",
                     trim=True, out=out)
    assert out.getvalue() == (gold / "asmstats_trim.txt").read_text()


def test_asmstats_human2(gold, monkeypatch):
    from cornetto_tpu.tools import asmstats
    monkeypatch.chdir(gold)
    got = _cap(asmstats.run, "fixasm_fixed.paf", "telo_fixed.bed",
               "report_fixed.tsv", order="human2")
    assert got == (gold / "asmstats_human2.txt").read_text()


def test_asmstats_fasta_order(gold, monkeypatch):
    from cornetto_tpu.tools import asmstats
    monkeypatch.chdir(gold)
    got = _cap(asmstats.run, "fixasm_fixed.paf", "telo_fixed.bed",
               "report_fixed.tsv", order="order.fasta")
    assert got == (gold / "asmstats_fastaorder.txt").read_text()
