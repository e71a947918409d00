"""Lane-parallel Pallas SDUST vs the sequential DP: bit-identical.

Runs in interpret mode on the CPU test backend (Mosaic cannot compile
there); the TPU path is exercised by bench_kernels.py on the real chip
with the same equality assert."""

import numpy as np
import pytest

from cornetto_tpu.kernels.pallas_sdust import sdust_pallas
from cornetto_tpu.native.sdust import sdust


def _satellite(rng, n, unit="ATTCC", seg=1200, dense=0.6):
    parts, tot = [], 0
    while tot < n:
        if rng.random() < dense:
            parts.append((unit * (seg // len(unit) + 1))[:seg])
        else:
            parts.append("".join(
                np.array(list("ACGT"))[rng.integers(0, 4, seg)]))
        tot += seg
    return "".join(parts)[:n]


def test_dense_satellite():
    rng = np.random.default_rng(10)
    seq = _satellite(rng, 12_000).encode()
    assert sdust_pallas(seq, core=1024, interpret=True, lanes=128) == sdust(seq)


def test_pure_repeat():
    seq = ("ATT" * 4000).encode()
    assert sdust_pallas(seq, core=512, interpret=True, lanes=128) == sdust(seq)


def test_random_sparse():
    rng = np.random.default_rng(11)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 8_000)])
    seq = seq.encode()
    assert sdust_pallas(seq, core=1024, interpret=True, lanes=128) == sdust(seq)


def test_with_ns():
    rng = np.random.default_rng(12)
    base = list(_satellite(rng, 10_000, dense=0.5))
    for lo, hi in ((900, 902), (4_000, 4_200), (7_777, 7_790)):
        for i in range(lo, hi):
            base[i] = "N"
    seq = "".join(base).encode()
    assert sdust_pallas(seq, core=768, interpret=True, lanes=128) == sdust(seq)


def test_short_and_edges():
    rng = np.random.default_rng(13)
    for n in (0, 1, 2, 3, 7, 63, 64, 65, 200):
        seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, n)])
        seq = seq.encode() if n else b""
        assert sdust_pallas(seq, core=128, interpret=True, lanes=128) == sdust(seq)
    # all-N
    assert sdust_pallas(b"N" * 500, core=128, interpret=True, lanes=128) == \
        sdust(b"N" * 500)


def test_fuzz_mixed():
    rng = np.random.default_rng(14)
    for trial in range(4):
        parts = []
        for _ in range(rng.integers(2, 6)):
            kind = rng.integers(0, 4)
            n = int(rng.integers(150, 1500))
            if kind == 0:
                parts.append("".join(
                    np.array(list("ACGT"))[rng.integers(0, 4, n)]))
            elif kind == 1:
                u = "".join(np.array(list("ACGT"))[
                    rng.integers(0, 4, rng.integers(2, 7))])
                parts.append((u * (n // len(u) + 1))[:n])
            elif kind == 2:
                parts.append("N" * int(rng.integers(1, 80)))
            else:
                parts.append(_satellite(rng, n, seg=173))
        seq = "".join(parts).encode()
        core = int(rng.integers(128, 1024))
        got = sdust_pallas(seq, core=core, interpret=True, lanes=128)
        assert got == sdust(seq), (trial, core, len(seq))


def test_cli_backend_device_matches_host(tmp_path, monkeypatch):
    # --backend device (interpret-mode on the CPU test backend via the
    # kernel's own tests; here just the CLI wiring + byte identity)
    import io
    from cornetto_tpu.tools import sdust as tool
    rng = np.random.default_rng(5)
    fa = tmp_path / "x.fa"
    with open(fa, "w") as f:
        f.write(">c1\n" + ("ATTCC" * 300) + "\n>c2\n"
                + "".join(np.array(list("ACGT"))[rng.integers(0, 4, 2000)])
                + "\n")
    host_out = io.StringIO()
    tool.run(str(fa), out=host_out)
    import cornetto_tpu.kernels.pallas_sdust as pk
    real = pk.sdust_pallas
    monkeypatch.setattr(pk, "sdust_pallas",
                        lambda seq, T=20, W=64: real(seq, T=T, W=W,
                                                     interpret=True, lanes=128))
    dev_out = io.StringIO()
    tool.run(str(fa), out=dev_out, backend="device")
    assert dev_out.getvalue() == host_out.getvalue()
