"""Pallas telomere-scan kernels: bit-parity vs the XLA oracle and the
telofind golden outputs (interpret mode on the CPU test backend; the TPU
path compiles the same kernel via Mosaic)."""

import io
import os

import numpy as np
import pytest

from cornetto_tpu.kernels.pallas_telo import (scan_runs_from_mask,
                                              telo_match_mask_long,
                                              telo_match_mask_pallas,
                                              telo_run_stats_pallas)
from cornetto_tpu.kernels.telo_scan import (telo_match_mask_jax,
                                            telo_run_stats_jax)

HERE = os.path.dirname(os.path.abspath(__file__))
TD = os.path.join(os.path.dirname(HERE), "test_data")

MOTIF = (3, 3, 0, 2, 2, 2)  # TTAGGG


def _codes(rng, B, L, plant=True):
    codes = rng.integers(0, 5, size=(B, L)).astype(np.uint8)  # incl. N=4
    if plant:
        telo = np.tile(np.array(MOTIF, np.uint8), min(60, L // 12))
        codes[0, :len(telo)] = telo                      # terminal run
        codes[1 % B, 37:37 + len(telo)] = telo           # internal run
        codes[2 % B, L - len(telo):] = telo              # tail run
    return codes


@pytest.mark.parametrize("B,L", [(4, 512), (32, 4096), (7, 300), (1, 128)])
def test_stats_matches_xla(B, L):
    import jax.numpy as jnp
    rng = np.random.default_rng(B * 1000 + L)
    codes = _codes(rng, B, L)
    want = telo_run_stats_jax(jnp.asarray(codes), MOTIF)
    got = telo_run_stats_pallas(jnp.asarray(codes), MOTIF, interpret=True)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_mask_matches_xla():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    codes = _codes(rng, 16, 1024)
    want = np.asarray(telo_match_mask_jax(jnp.asarray(codes), MOTIF))
    got = np.asarray(telo_match_mask_pallas(jnp.asarray(codes), MOTIF,
                                            interpret=True))
    m = want.shape[1]
    np.testing.assert_array_equal(want, got[:, :m].astype(bool))
    assert not got[:, m:].any()


def test_mask_long_chunking():
    rng = np.random.default_rng(1)
    seq = rng.integers(0, 5, size=200_000).astype(np.uint8)
    telo = np.tile(np.array(MOTIF, np.uint8), 30)
    # plant runs straddling the chunk boundary (chunk=65536)
    seq[65520:65520 + len(telo)] = telo
    seq[131000:131000 + len(telo)] = telo
    got = telo_match_mask_long(seq, MOTIF, interpret=True)
    k = len(MOTIF)
    want = np.zeros(len(seq), dtype=bool)
    for i in range(len(seq) - k + 1):
        want[i] = (seq[i:i + k] == np.array(MOTIF, np.uint8)).all()
    np.testing.assert_array_equal(want, got)


def test_scan_runs_from_mask_matches_host_walk():
    from cornetto_tpu.tools.telofind import scan_runs
    rng = np.random.default_rng(2)
    motif = b"TTAGGG"
    bases = np.array(list("ACGTN"))
    seq = "".join(bases[rng.integers(0, 5, 5000)])
    # dense motif region with interruptions
    seq = seq[:900] + "TTAGGG" * 40 + "T" + "TTAGGG" * 3 + seq[900:]
    sb = seq.encode()
    k = len(motif)
    mask = np.zeros(len(sb), dtype=bool)
    for i in range(len(sb) - k + 1):
        mask[i] = sb[i:i + k] == motif
    assert scan_runs_from_mask(mask, k) == list(scan_runs(sb, motif))


def test_telofind_device_backend_golden():
    """Device-scanned telofind output is byte-identical to the golden
    produced by the reference C binary."""
    from cornetto_tpu.tools import telofind
    fasta = os.path.join(TD, "synth", "asm.fasta")
    golden = os.path.join(TD, "golden", "telofind.txt")
    buf = io.StringIO()
    telofind.run(fasta, backend="device", interpret=True, out=buf)
    with open(golden) as f:
        assert buf.getvalue() == f.read()


def test_telofind_device_backend_golden_ccctaa():
    from cornetto_tpu.tools import telofind
    fasta = os.path.join(TD, "synth", "asm.fasta")
    golden = os.path.join(TD, "golden", "telofind_ccctaa.txt")
    buf = io.StringIO()
    telofind.run(fasta, "CCCTAA", backend="device", interpret=True, out=buf)
    with open(golden) as f:
        assert buf.getvalue() == f.read()


def test_telofind_cli_backend_flag():
    """`telofind <fa> --backend device` (the CLI convention promoted from
    the round-2 CORNETTO_TELOFIND_DEVICE env var) matches the golden; the
    env var still works for back-compat."""
    import contextlib
    from cornetto_tpu.tools import telofind
    fasta = os.path.join(TD, "synth", "asm.fasta")
    golden = os.path.join(TD, "golden", "telofind.txt")
    for argv in ([fasta, "--backend", "device"],
                 [fasta, "--backend=device"]):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            assert telofind.main(argv) == 0
        with open(golden) as f:
            assert buf.getvalue() == f.read()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert telofind.main([fasta, "--backend", "nope"]) == 1
    assert buf.getvalue() == ""
