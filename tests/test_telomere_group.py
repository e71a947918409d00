"""Byte-parity tests for the telomere group (telofind/telowin/telobreaks/
sdust) against C-oracle goldens (reference: test/realtest.sh:53-70 style)."""

import io

from cornetto_tpu.tools import sdust, telobreaks, telofind, telowin


def _cap(fn, *args, **kw):
    out = io.StringIO()
    fn(*args, out=out, **kw)
    return out.getvalue()


def test_telofind(synth, gold):
    got = _cap(telofind.run, str(synth / "asm.fasta"))
    assert got == (gold / "telofind.txt").read_text()


def test_telofind_custom_motif(synth, gold):
    got = _cap(telofind.run, str(synth / "asm.fasta"), "CCCTAA")
    assert got == (gold / "telofind_ccctaa.txt").read_text()


def test_telowin(gold):
    got = _cap(telowin.run, str(gold / "telomere.txt"), 99.9, 0.4)
    assert got == (gold / "telowin.txt").read_text()


def test_telowin2(gold):
    got = _cap(telowin.run, str(gold / "telomere.txt"), 95.0, 0.3)
    assert got == (gold / "telowin2.txt").read_text()


def test_sdust(synth, gold):
    got = _cap(sdust.run, str(synth / "asm.fasta"))
    assert got == (gold / "sdust.txt").read_text()


def test_sdust_w32_t14(synth, gold):
    got = _cap(sdust.run, str(synth / "asm.fasta"), T=14, W=32)
    assert got == (gold / "sdust_w32t14.txt").read_text()


def test_telobreaks(gold):
    got = _cap(telobreaks.run, str(gold / "lens.txt"),
               str(gold / "sdust.txt"), str(gold / "telomere.txt"))
    assert got == (gold / "telobreaks.txt").read_text()
