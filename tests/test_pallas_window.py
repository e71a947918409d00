"""Pallas sliding-window kernel parity (interpret mode on CPU; the compiled
kernel is exercised on hardware by bench_kernels)."""

import numpy as np
import pytest

from cornetto_tpu.kernels.pallas_window import sliding_window_sum_pallas
from cornetto_tpu.kernels.window_sum import sliding_sum_i32


@pytest.mark.parametrize("n,chunk,w", [(8192, 2048, 2500), (4096, 1024, 64),
                                       (2048, 2048, 1)])
def test_pallas_matches_xla(n, chunk, w):
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(n + w)
    x = rng.integers(0, 65536, n).astype(np.int32)
    a = np.asarray(sliding_window_sum_pallas(jnp.asarray(x), w, chunk=chunk,
                                             interpret=True))
    b = np.asarray(jax.jit(lambda v: sliding_sum_i32(v, w))(jnp.asarray(x)))
    np.testing.assert_array_equal(a, b)
