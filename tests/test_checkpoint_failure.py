"""Checkpoint/resume under real process death (round-2 verdict item #10).

A streaming worker (tests/_ckpt_worker.py) runs the production sharded
decision engine over a FASTQ with write-ahead part files + a
dist/checkpoint.py checkpoint per batch, and os._exit(9)s at injected
crash points: a torn part write, after the part rename but before the
checkpoint, and right after the checkpoint.  A relaunched worker must
resume from the last durable cursor, recompute only what was not yet
checkpointed, and produce decisions.tsv and final tallies byte-identical
to an uninterrupted run.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # slow: 8 subprocess lives each importing jax

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "_ckpt_worker.py")
REPO = os.path.dirname(HERE)

N_READS = 70   # 4 full batches of 16 + one partial


def _mk_fastq(path):
    rng = np.random.default_rng(77)
    bases = np.array(list("ACGT"))
    genome = {"ctgA": "".join(bases[rng.integers(0, 4, 50000)]),
              "ctgB": "".join(bases[rng.integers(0, 4, 30000)])}
    with open(path, "w") as f:
        for i in range(N_READS):
            if i % 5 == 4:
                seq = "".join(bases[rng.integers(0, 4, 300)])
            else:
                ctg = "ctgA" if i % 2 == 0 else "ctgB"
                s = int(rng.integers(0, len(genome[ctg]) - 300))
                seq = genome[ctg][s:s + 300]
            f.write("@r%03d\n%s\n+\n%s\n" % (i, seq, "I" * len(seq)))


def _run(workdir, fastq, crash):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    p = subprocess.run(
        [sys.executable, WORKER, workdir, fastq, crash],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300)
    return p.returncode, p.stdout + p.stderr


def _computed_batches(out):
    return [int(m) for m in re.findall(r"batch (\d+) computed", out)]


@pytest.mark.parametrize("crash", ["mid_part:1", "after_part:1",
                                   "after_ckpt:2"])
def test_resume_after_kill_is_byte_identical(tmp_path, crash):
    fastq = str(tmp_path / "reads.fq")
    _mk_fastq(fastq)

    # uninterrupted oracle
    oracle_dir = tmp_path / "oracle"
    oracle_dir.mkdir()
    rc, out = _run(str(oracle_dir), fastq, "none")
    assert rc == 0 and "DONE" in out, out[-2000:]
    want = (oracle_dir / "decisions.tsv").read_bytes()
    want_tally = re.search(r"tallies (.+)", out).group(1)
    assert _computed_batches(out) == [0, 1, 2, 3, 4]

    # crashed life
    wdir = tmp_path / "crashed"
    wdir.mkdir()
    rc, out1 = _run(str(wdir), fastq, crash)
    assert rc == 9 and ("CRASH " + crash) in out1, out1[-2000:]
    assert not (wdir / "decisions.tsv").exists()

    # resumed life: completes, recomputing ONLY past the durable cursor
    rc, out2 = _run(str(wdir), fastq, "none")
    assert rc == 0 and "DONE" in out2, out2[-2000:]
    kind, i = crash.split(":")
    cursor = int(i) + (1 if kind == "after_ckpt" else 0)
    if cursor:
        assert ("resumed at cursor %d" % cursor) in out2, out2[-2000:]
    assert _computed_batches(out2) == list(range(cursor, 5))

    got = (wdir / "decisions.tsv").read_bytes()
    got_tally = re.search(r"tallies (.+)", out2).group(1)
    assert got == want
    assert got_tally == want_tally
