"""Hybrid device-filter + host-exact SDUST must be bit-identical to the
full-sequence DP on adversarial inputs (repeats, Ns, gap boundaries)."""

import numpy as np
import pytest

from cornetto_tpu.kernels.sdust_core import sdust as sdust_oracle
from cornetto_tpu.kernels.sdust_device import (_candidates_np,
                                               sdust_hybrid)

BASES = np.array(list("ACGT"))


def _mk_seq(rng, n, repeats=3, ns=2):
    s = list("".join(BASES[rng.integers(0, 4, n)]))
    for _ in range(repeats):
        unit = "".join(BASES[rng.integers(0, 4, rng.integers(1, 6))])
        copies = int(rng.integers(5, 60))
        pos = int(rng.integers(0, max(n - len(unit) * copies, 1)))
        rep = (unit * copies)[: n - pos]
        s[pos:pos + len(rep)] = list(rep)
    for _ in range(ns):
        pos = int(rng.integers(0, n))
        ln = int(rng.integers(1, 30))
        s[pos:pos + ln] = ["N"] * min(ln, n - pos)
    return "".join(s)


@pytest.mark.parametrize("trial", range(12))
def test_hybrid_matches_oracle(trial):
    rng = np.random.default_rng(trial)
    n = int(rng.integers(50, 4000))
    seq = _mk_seq(rng, n).encode()
    for T, W in ((20, 64), (14, 32)):
        want = sdust_oracle(seq, T=T, W=W)
        got = sdust_hybrid(seq, T=T, W=W, _filter_backend="np")
        assert got == want, (trial, T, W)


def test_hybrid_jax_filter_matches_np():
    import jax.numpy as jnp
    from cornetto_tpu.kernels.minimizer import encode_seq
    from cornetto_tpu.kernels.sdust_device import sdust_candidates_jax
    rng = np.random.default_rng(99)
    seq = _mk_seq(rng, 3000)
    codes = encode_seq(seq)
    a = _candidates_np(codes, T=20, W=64)
    b = np.asarray(sdust_candidates_jax(jnp.asarray(codes), T=20, W=64))
    np.testing.assert_array_equal(a, b)
    got = sdust_hybrid(seq.encode(), _filter_backend="jax")
    want = sdust_oracle(seq.encode())
    assert got == want


def test_repeat_edge_cases():
    for seq in (b"A" * 200, b"AT" * 100, b"ACG" * 70,
                b"N" * 50 + b"AT" * 40 + b"N" * 10,
                b"ACGTACGTGT" * 30, b"", b"AC", b"ACG"):
        assert sdust_hybrid(seq, _filter_backend="np") == \
            sdust_oracle(seq), seq[:20]
