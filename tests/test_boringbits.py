"""Byte-parity tests for boringbits/noboringbits against the C-oracle goldens
(reference: test/test.sh:24-30 golden-diff style)."""

import io

import numpy as np
import pytest

from cornetto_tpu.kernels import window_sum
from cornetto_tpu.tools import boringbits


def _run(synth, opt):
    out = io.StringIO()
    boringbits.run(str(synth / "cov-total.bg"), str(synth / "cov-mq20.bg"),
                   opt, out=out)
    return out.getvalue()


CASES = [
    ("boring_t1.txt", dict(boring=True, min_ctg_len=10000, edge_len=1000,
                           low_cov_thresh=0.6, low_mq_cov_thresh=0.6,
                           high_cov_thresh=1.6)),
    ("fun_t2.txt", dict(boring=False, high_cov_thresh=2.5, low_cov_thresh=0.5,
                        low_mq_cov_thresh=0.5, min_ctg_len=10000,
                        edge_len=1000)),
    ("fun_default.txt", dict(boring=False)),
    ("boring_odd.txt", dict(boring=True, window_size=999, window_inc=37,
                            min_ctg_len=20000, edge_len=3000)),
]


@pytest.mark.parametrize("backend", ["numpy", "jax"])
@pytest.mark.parametrize("golden,kw", CASES)
def test_golden(synth, gold, golden, kw, backend):
    opt = boringbits.BoringbitsOptions(backend=backend, **kw)
    got = _run(synth, opt)
    want = (gold / golden).read_text()
    assert got == want


def test_window_stats_jax_matches_numpy():
    rng = np.random.default_rng(0)
    for length in [1, 7, 99, 2500, 2501, 12345]:
        d = rng.integers(0, 65536, size=length).astype(np.int32)
        m = rng.integers(0, 65536, size=length).astype(np.int32)
        for w, inc in [(2500, 50), (999, 37), (1, 1), (64, 64)]:
            a = window_sum.window_stats_numpy(d, m, w, inc)
            b = window_sum.window_stats_jax(d, m, w, inc, pad_bucket=4096)
            for x, y in zip(a, b):
                np.testing.assert_array_equal(x, y)
