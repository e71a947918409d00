"""The chunked SDUST decomposition must be bit-identical to the global
sequential DP — this is the correctness foundation of the lane-parallel
Pallas kernel (kernels/sdust_chunked.py docstring has the argument)."""

import numpy as np
import pytest

from cornetto_tpu.kernels.sdust_chunked import sdust_chunked_oracle
from cornetto_tpu.native.sdust import sdust


def _satellite(rng, n, unit="ATTCC", seg=1500, dense=0.6):
    parts, tot = [], 0
    while tot < n:
        if rng.random() < dense:
            parts.append((unit * (seg // len(unit) + 1))[:seg])
        else:
            parts.append("".join(
                np.array(list("ACGT"))[rng.integers(0, 4, seg)]))
        tot += seg
    return "".join(parts)[:n]


@pytest.mark.parametrize("core", [130, 512, 4096])
def test_dense_satellite(core):
    rng = np.random.default_rng(1)
    seq = _satellite(rng, 60_000).encode()
    assert sdust_chunked_oracle(seq, core=core) == sdust(seq)


@pytest.mark.parametrize("unit", ["AT", "ATT", "ATTCCG", "AAATTTCCCGGG"])
def test_pure_satellite_units(unit):
    # wall-to-wall repeats: evictions fire constantly, the state the
    # chunk warm-up must reconstruct is maximally active
    seq = (unit * (20_000 // len(unit) + 1))[:20_000].encode()
    assert sdust_chunked_oracle(seq, core=256) == sdust(seq)


def test_random_sparse():
    rng = np.random.default_rng(2)
    seq = "".join(np.array(list("ACGT"))[rng.integers(0, 4, 50_000)])
    seq = seq.encode()
    assert sdust_chunked_oracle(seq, core=512) == sdust(seq)


def test_n_patterns():
    rng = np.random.default_rng(3)
    base = list(_satellite(rng, 40_000, dense=0.5))
    # N runs of many shapes: single, short, long (assembly gap), and one
    # landing exactly on a chunk boundary's context
    for lo, hi in ((1000, 1001), (5000, 5030), (12_000, 15_000),
                   (19_990, 20_010), (33_000, 33_003)):
        for i in range(lo, hi):
            base[i] = "N"
    seq = "".join(base).encode()
    for core in (256, 1000):
        assert sdust_chunked_oracle(seq, core=core) == sdust(seq)


def test_n_everywhere():
    rng = np.random.default_rng(4)
    chars = np.array(list("ACGTN"))
    seq = "".join(chars[rng.integers(0, 5, 20_000)]).encode()
    assert sdust_chunked_oracle(seq, core=300) == sdust(seq)


def test_fuzz_mixed():
    rng = np.random.default_rng(5)
    for trial in range(8):
        parts = []
        for _ in range(rng.integers(3, 9)):
            kind = rng.integers(0, 4)
            n = int(rng.integers(200, 3000))
            if kind == 0:
                parts.append("".join(
                    np.array(list("ACGT"))[rng.integers(0, 4, n)]))
            elif kind == 1:
                u = "".join(np.array(list("ACGT"))[
                    rng.integers(0, 4, rng.integers(2, 9))])
                parts.append((u * (n // len(u) + 1))[:n])
            elif kind == 2:
                parts.append("N" * int(rng.integers(1, 400)))
            else:
                parts.append(_satellite(rng, n, seg=257))
        seq = "".join(parts).encode()
        core = int(rng.integers(130, 2000))
        assert sdust_chunked_oracle(seq, core=core) == sdust(seq), \
            (trial, core, len(seq))
