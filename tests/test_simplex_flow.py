"""Simplex/duplex orchestration flows with stubbed external tools
(reference: shitflow/simplex-shitflow.sh, simplex/basecall-gta100.sh,
hifiasm-ont.pbs.sh, duplex/*), plus native gfa2fa and the native
duplex/simplex read split."""

import io
import os
import stat
import uuid

import numpy as np
import pytest

from cornetto_tpu.flow.simplex import (duplex_flow, simplex_flow,
                                       split_duplex_simplex)
from cornetto_tpu.io.gfa import gfa2fa


def _stub(bindir, name, body):
    path = os.path.join(bindir, name)
    with open(path, "w") as f:
        f.write("#!/bin/bash\necho \"%s $*\" >> %s/argv.log\n%s\n"
                % (name, bindir, body))
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)


@pytest.fixture()
def bindir(tmp_path, monkeypatch):
    d = tmp_path / "bin"
    d.mkdir()
    monkeypatch.setenv("PATH", "%s%s%s" % (d, os.pathsep,
                                           os.environ["PATH"]))
    return str(d)


def test_gfa2fa():
    buf = io.StringIO()
    gfa = io.StringIO()  # write a temp file instead
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".gfa",
                                     delete=False) as f:
        f.write("H\tVN:Z:1.0\n")
        f.write("S\tptg000001l\tACGTACGT\tLN:i:8\n")
        f.write("A\tptg000001l\t0\t+\tread1\t0\t8\n")
        f.write("S\tptg000002l\tGGGG\n")
        f.write("L\tptg000001l\t+\tptg000002l\t+\t0M\n")
        path = f.name
    n = gfa2fa(path, buf)
    os.unlink(path)
    assert n == 2
    assert buf.getvalue() == ">ptg000001l\nACGTACGT\n>ptg000002l\nGGGG\n"


def _write_basecalls_stub(bindir, reads):
    """slow5-dorado stub emitting a deterministic FASTQ."""
    fq = "".join("@r%d\n%s\n+\n%s\n" % (i, "ACGT" * (ln // 4), "I" * ln)
                 for i, ln in enumerate(reads))
    _stub(bindir, "slow5-dorado",
          'if [ "$1" = basecaller ]; then cat <<"EOF"\n%sEOF\nfi' % fq)


def test_simplex_flow_chain(tmp_path, bindir):
    wd = str(tmp_path / "wd")
    blow5 = str(tmp_path / "sampleX.blow5")
    with open(blow5, "w") as f:
        f.write("fake blow5")
    _stub(bindir, "slow5tools", "true")
    # 3 reads: 40k (kept), 30k (kept - boundary), 10k (dropped)
    _write_basecalls_stub(bindir, [40000, 30000, 10000])
    gfa_body = "S\tptg1\t%s\n" % ("ACGT" * 10)
    _stub(bindir, "hifiasm",
          'for last; do :; done; d=$(dirname "${last}"); '
          'b=$(basename "${last}" .fastq); '
          'printf "%s" > "$d/$b.bp.p_ctg.gfa"; '
          'printf "%s" > "$d/$b.bp.hap1.p_ctg.gfa"; '
          'printf "%s" > "$d/$b.bp.hap2.p_ctg.gfa"'
          % (gfa_body, gfa_body, gfa_body))
    flow = simplex_flow(wd, "sampleX", blow5,
                        config={"threads": 4, "model": "/models/sup"})
    assert flow.run() == 0
    # >=30 kb filter kept 2 of 3 reads (native seq tool)
    with open(os.path.join(wd, "sampleX.fastq")) as f:
        names = [ln for ln in f.read().splitlines()
                 if ln.startswith("@")]
    assert names == ["@r0", "@r1"]
    for out in ("sampleX.fasta", "sampleX.hap1.fasta",
                "sampleX.hap2.fasta"):
        with open(os.path.join(wd, out)) as f:
            assert f.read() == ">ptg1\n%s\n" % ("ACGT" * 10)
    with open(os.path.join(bindir, "argv.log")) as f:
        log = f.read()
    assert "--emit-fastq --min-qscore 10" in log
    assert "--ont" in log and "--telo-m CCCTAA" in log
    # resume skips everything
    with open(os.path.join(bindir, "argv.log")) as f:
        n = len(f.read().splitlines())
    assert flow.run() == 0
    with open(os.path.join(bindir, "argv.log")) as f:
        assert len(f.read().splitlines()) == n


def _duplex_bam(path, records):
    from cornetto_tpu.io.bam import BamWriter
    with BamWriter(path, ["ref"], [1000]) as w:
        for name, seq in records:
            w.write_record(name, 4, -1, -1, 0, [], seq=seq,
                           qual=[30] * len(seq))


def test_split_duplex_simplex(tmp_path):
    p1, p2 = str(uuid.uuid4()), str(uuid.uuid4())
    p3, p4 = str(uuid.uuid4()), str(uuid.uuid4())
    bam = str(tmp_path / "grp.bam")
    _duplex_bam(bam, [
        ("%s;%s" % (p1, p2), "ACGT" * 3000),    # duplex read
        (p1, "ACGT" * 4000),                    # parent -> dropped
        (p3, "ACGT" * 4000),                    # simplex kept
        (p4, "ACGT" * 100),                     # short -> dropped
    ])
    dup, simp = str(tmp_path / "d.fq"), str(tmp_path / "s.fq")
    stats = split_duplex_simplex([bam], dup, simp)
    assert stats == {"duplex": 1, "simplex": 1, "parents_dropped": 1,
                     "short_dropped": 1}
    with open(dup) as f:
        assert f.read().splitlines()[0] == "@%s;%s" % (p1, p2)
    with open(simp) as f:
        lines = f.read().splitlines()
    assert lines[0] == "@" + p3 and len(lines) == 4


def test_duplex_flow_with_retry(tmp_path, bindir):
    wd = str(tmp_path / "wd")
    blow5 = str(tmp_path / "s.blow5")
    with open(blow5, "w") as f:
        f.write("x")
    from cornetto_tpu.io.bam import BamWriter
    src_bam = str(tmp_path / "payload.bam")
    _duplex_bam(src_bam, [(str(uuid.uuid4()), "ACGT" * 3000)])
    _stub(bindir, "slow5tools",
          'if [ "$1" = split ]; then mkdir -p "${4}"; '
          'touch "${4}/g0.blow5" "${4}/g1.blow5"; fi')
    # duplex basecall FAILS on first attempt (flaky GPU), succeeds after
    marker = os.path.join(bindir, "failed_once")
    _stub(bindir, "slow5-dorado",
          'if [ "$1" = duplex ]; then\n'
          '  if [ ! -e %s ]; then touch %s; exit 1; fi\n'
          '  cat %s\nfi' % (marker, marker, src_bam))
    flow = duplex_flow(wd, "s", blow5, config={"basecall_attempts": 3})
    assert flow.run() == 0
    assert os.path.exists(os.path.join(wd, "s.duplex_reads.fastq"))
    with open(os.path.join(wd, "s.duplex_split.stats")) as f:
        stats = dict(ln.split("\t") for ln in f.read().splitlines())
    assert stats["simplex"] == "2"  # one kept read per channel group
