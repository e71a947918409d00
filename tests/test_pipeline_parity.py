"""COMPOSED pipeline byte-parity vs the reference shell scripts.

The goldens in test_data/golden/pipelines/ were produced by running the
reference's own scripts/{create,recreate}-cornetto.sh, *-hapnetto.sh and
telostats.sh (reference: test/realtest.sh:53-83 is the same bar) with
CORNETTO = the compiled reference binary and BEDTOOLS = the independent
bedtools_lite clone (see test_data/gen_pipeline_goldens.sh for the full
provenance).  These tests run OUR pipelines on identical inputs and demand
byte equality for every tmp-dir intermediate and final panel file.
"""

import io
import os
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
TD = os.path.join(REPO, "test_data")
GOLD = os.path.join(TD, "golden", "pipelines")

sys.path.insert(0, TD)
import gen_synth_pipe  # noqa: E402


@pytest.fixture(scope="session")
def pipe_synth():
    return gen_synth_pipe.ensure()


def _link_inputs(dst, synth):
    for name in ("pasm.fasta", "pasm.cov-total.bg", "pasm.cov-mq20.bg",
                 "pasm.bp.p_ctg.lowQ.bed", "pasm.hap1.fasta",
                 "pasm.hap2.fasta"):
        os.symlink(os.path.join(synth, name), os.path.join(dst, name))


def _diff_tree(golden_dir, produced_dir, skip=()):
    """Byte-compare every golden file against the produced tree."""
    mismatches = []
    for root, _, files in os.walk(golden_dir):
        for name in files:
            gpath = os.path.join(root, name)
            rel = os.path.relpath(gpath, golden_dir)
            if rel in skip:
                continue
            ppath = os.path.join(produced_dir, rel)
            if not os.path.exists(ppath):
                mismatches.append("MISSING: " + rel)
                continue
            with open(gpath, "rb") as f:
                g = f.read()
            with open(ppath, "rb") as f:
                p = f.read()
            if g != p:
                gl, pl = g.split(b"\n"), p.split(b"\n")
                ctx = next((i, a, b) for i, (a, b)
                           in enumerate(zip(gl + [b"<EOF>"], pl + [b"<EOF>"]))
                           if a != b)
                mismatches.append(
                    "DIFF %s at line %d:\n  golden:   %r\n  produced: %r"
                    % (rel, ctx[0] + 1, ctx[1], ctx[2]))
    assert not mismatches, "\n".join(mismatches)


def test_create_and_hapnetto_parity(pipe_synth, tmp_path, monkeypatch):
    from cornetto_tpu.pipelines import create_cornetto, hapnetto
    monkeypatch.chdir(tmp_path)
    _link_inputs(str(tmp_path), pipe_synth)
    assert create_cornetto.run("pasm.fasta") == 0
    assert hapnetto.run(
        "pasm",
        hap1_paf=os.path.join(pipe_synth, "pasm_hap1_to_asm.paf"),
        hap2_paf=os.path.join(pipe_synth, "pasm_hap2_to_asm.paf")) == 0
    _diff_tree(os.path.join(GOLD, "create"), str(tmp_path))


def test_recreate_and_hapnetto_parity(pipe_synth, tmp_path, monkeypatch):
    from cornetto_tpu.pipelines import hapnetto, recreate_cornetto
    monkeypatch.chdir(tmp_path)
    _link_inputs(str(tmp_path), pipe_synth)
    assert recreate_cornetto.run("pasm.fasta") == 0
    assert hapnetto.run(
        "pasm", recreate=True,
        hap1_paf=os.path.join(pipe_synth, "pasm_hap1_to_asm.paf"),
        hap2_paf=os.path.join(pipe_synth, "pasm_hap2_to_asm.paf")) == 0
    _diff_tree(os.path.join(GOLD, "recreate"), str(tmp_path))


@pytest.mark.parametrize("sub,fasta", [
    ("telo", None),                 # pipeline-scale assembly
    ("telosmall", os.path.join(TD, "synth", "asm.fasta")),
])
def test_telostats_parity(pipe_synth, tmp_path, monkeypatch, sub, fasta):
    from cornetto_tpu.pipelines import telostats
    monkeypatch.chdir(tmp_path)
    fasta = fasta or os.path.join(pipe_synth, "pasm.fasta")
    local = os.path.basename(fasta)
    os.symlink(fasta, os.path.join(tmp_path, local))
    buf = io.StringIO()
    telostats.run(local, out=buf)
    with open("telostats.stdout", "w") as f:
        f.write(buf.getvalue())
    _diff_tree(os.path.join(GOLD, sub), str(tmp_path))
