"""Eval-job flow layer: the getstat/quast/compleasm/yak/dipcall chains run
as real DAGs, with fake executables asserting the exact argv shapes the
reference scripts use (reference: shitflow/getstat.pbs.sh:59-63,
quast.pbs.sh, compleasm.pbs.sh, yak-qv.pbs.sh:35-37,
postcall/sv/{dipcall,truvari}.sh)."""

import gzip
import os
import stat
import sys

import numpy as np
import pytest

from cornetto_tpu.flow.evaljobs import eval_flow, filter_structural, sv_flow

HERE = os.path.dirname(os.path.abspath(__file__))
TD = os.path.join(os.path.dirname(HERE), "test_data")


def _stub(bindir, name, body):
    """A fake executable that logs its argv and runs `body` (shell)."""
    path = os.path.join(bindir, name)
    with open(path, "w") as f:
        f.write("#!/bin/bash\necho \"%s $*\" >> %s/argv.log\n%s\n"
                % (name, bindir, body))
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
    return path


@pytest.fixture()
def bindir(tmp_path, monkeypatch):
    d = tmp_path / "bin"
    d.mkdir()
    monkeypatch.setenv("PATH", "%s%s%s" % (d, os.pathsep,
                                           os.environ["PATH"]))
    return str(d)


def _argv_log(bindir):
    with open(os.path.join(bindir, "argv.log")) as f:
        return f.read().splitlines()


def test_eval_flow_getstat_chain(tmp_path, bindir):
    """getstat: native minidotplot/telostats/asmstats + stubbed QC jobs."""
    import shutil
    wd = str(tmp_path / "wd")
    asm = os.path.join(TD, "synth", "asm.fasta")
    # yak count writes <ref>.yak BESIDE the ref, so ref lives in tmp
    ref = str(tmp_path / "ref.fasta")
    shutil.copy(asm, ref)
    # minimap2 stub emits the checked-in synthetic asm->ref PAF
    _stub(bindir, "minimap2",
          'for last; do :; done; cat %s'
          % os.path.join(TD, "synth", "asm_to_ref.paf"))
    _stub(bindir, "quast.py", 'mkdir -p "${4}" && touch "${4}/report.txt"')
    _stub(bindir, "compleasm",
          'mkdir -p "${5}" && touch "${5}/summary.txt"')
    _stub(bindir, "yak", 'if [ "$1" = count ]; then touch "${7}"; '
                         'else echo "QV 50"; fi')
    flow = eval_flow(wd, ref, asm, config={"threads": 4,
                                           "lineage": "primates"})
    assert flow.run() == 0
    for out in ("asm.fixed.paf", "asm.report.tsv", "asm.eps",
                "asm.fasta.telostats.txt", "asm.fasta.asmstats.txt",
                "quast_out", "compleasm_out", "asm.fasta.yak.txt"):
        assert os.path.exists(os.path.join(wd, out)), out
    log = _argv_log(bindir)
    quast = next(x for x in log if x.startswith("quast.py"))
    assert "--large" in quast and "-l" in quast and "-t 4" in quast
    comp = next(x for x in log if x.startswith("compleasm"))
    assert comp.split()[1] == "run" and "-l primates" in comp
    yaks = [x for x in log if x.startswith("yak")]
    assert any("count -K1.5g" in x for x in yaks)
    assert any(" qv " in x for x in yaks)
    # resume: a second run skips everything (argv log unchanged)
    n = len(log)
    assert flow.run() == 0
    assert len(_argv_log(bindir)) == n


def test_yak_count_cached(tmp_path, bindir):
    """`test -e REF.yak` caching (reference: yak-qv.pbs.sh:35)."""
    wd = str(tmp_path / "wd")
    asm = os.path.join(TD, "synth", "asm.fasta")
    ref = str(tmp_path / "ref.fasta")
    with open(ref, "w") as f:
        f.write(">r\nACGT\n")
    with open(ref + ".yak", "w") as f:
        f.write("cached")
    _stub(bindir, "yak", 'if [ "$1" = count ]; then exit 1; '
                         'else echo "QV 50"; fi')
    flow = eval_flow(wd, ref, asm, config={
        "with_quast": False, "with_compleasm": False,
        "tools": {"minimap2_asm": "true {threads} {ref} {asm} {out}"}})
    # only run the yak step (minidotplot would need a real PAF)
    flow.run(only=["stage-asm", "yak-qv"])
    assert os.path.exists(os.path.join(wd, "asm.fasta.yak.txt"))
    log = _argv_log(bindir)
    assert not any(x.split()[1] == "count" for x in log
                   if x.startswith("yak"))  # cache hit: no yak count


def test_filter_structural_matches_awk_semantics(tmp_path):
    vcf = str(tmp_path / "split.vcf")
    rows = [
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        "c1\t10\t.\tA\tT\t.\t.\t.",                       # SNP: drop
        "c1\t20\t.\t%s\tT\t.\t.\t." % ("A" * 51),          # long REF: keep
        "c1\t30\t.\tA\t%s\t.\t.\t." % ("T" * 51),          # long ALT: keep
        "c1\t40\t.\t%s\tT\t.\t.\t." % ("A" * 50),          # ==50: drop
    ]
    with open(vcf, "w") as f:
        f.write("\n".join(rows) + "\n")
    out = str(tmp_path / "structural.vcf")
    kept = filter_structural(vcf, out)
    assert kept == 2
    with open(out) as f:
        lines = f.read().splitlines()
    assert lines[0].startswith("##") and lines[1].startswith("#CHROM")
    assert [ln.split("\t")[1] for ln in lines[2:]] == ["20", "30"]


def test_sv_flow_chain(tmp_path, bindir):
    wd = str(tmp_path / "wd")
    os.makedirs(wd)
    ref, pat, mat = (str(tmp_path / n)
                     for n in ("ref.fa", "pat.fa", "mat.fa"))
    for p in (ref, pat, mat):
        with open(p, "w") as f:
            f.write(">x\nACGT\n")
    base = str(tmp_path / "base.vcf.gz")
    with open(base, "w") as f:
        f.write("x")
    # dipcall writes the mak via shell redirection in the template; make
    # must then produce dip.dip.vcf.gz
    vcf_body = ("##fileformat=VCFv4.2\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
                "c1\t5\t.\t%s\tT\t.\t.\t.\n" % ("A" * 60))
    _stub(bindir, "run-dip", 'echo "all:"')
    _stub(bindir, "make", 'printf "" | gzip > "%s/dip.dip.vcf.gz"' % wd)
    # the > redirect lives in the command template; stub writes stdout
    _stub(bindir, "bcftools", 'cat <<"EOF"\n%sEOF' % vcf_body)
    _stub(bindir, "bgzip", 'gzip "$1"')
    _stub(bindir, "tabix", 'touch "$1.tbi"')
    _stub(bindir, "truvari", 'mkdir -p "${9}"')
    flow = sv_flow(wd, ref, pat, mat, base_vcf=base)
    assert flow.run() == 0
    assert os.path.exists(os.path.join(wd, "structural_split.vcf.gz"))
    assert os.path.exists(os.path.join(wd, "truvari_out"))
    with gzip.open(os.path.join(wd, "structural_split.vcf.gz"), "rt") as f:
        body = f.read()
    assert "A" * 60 in body  # the >50bp record survived the native filter
    log = _argv_log(bindir)
    assert any(x.startswith("truvari bench -b") for x in log)
