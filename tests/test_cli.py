"""CLI dispatcher smoke tests: subcommand wiring, usage tree, run footer."""

import subprocess
import sys

import pytest


def _run(*args, inp=None):
    return subprocess.run(
        [sys.executable, "-m", "cornetto_tpu.cli", *args],
        capture_output=True, text=True, timeout=120)


def test_usage():
    r = _run()
    assert r.returncode == 1
    assert "Usage: cornetto <command> [options]" in r.stderr
    for cmd in ("noboringbits", "bigenough", "fixasm", "minidot", "asmstats",
                "nx", "report", "telocontigs", "telowin", "telobreaks",
                "telofind", "sdust", "fa2bed", "seq"):
        assert cmd in r.stderr


def test_version():
    r = _run("--version")
    assert r.returncode == 0
    assert r.stdout.startswith("cornetto-tpu ")


def test_fa2bed_and_footer(synth):
    r = _run("fa2bed", str(synth / "asm.fasta"))
    assert r.returncode == 0
    assert r.stdout.startswith("ctg1\t0\t")
    assert "Real time:" in r.stderr and "Peak RAM:" in r.stderr
    assert "CMD: fa2bed" in r.stderr


def test_sdust_cli(synth, gold):
    r = _run("sdust", str(synth / "asm.fasta"))
    assert r.returncode == 0
    assert r.stdout == (gold / "sdust.txt").read_text()


def test_nx_cli(synth, gold):
    r = _run("nx", str(synth / "asm.fasta"))
    assert r.stdout == (gold / "nx.txt").read_text()


def test_unknown_command():
    r = _run("bogus")
    assert r.returncode == 1
    assert "Unrecognised command bogus" in r.stderr
