"""Sharded window-scan (SP + halo exchange) parity tests on the virtual
8-device CPU mesh."""

import numpy as np
import pytest

from cornetto_tpu.dist.mesh import make_mesh
from cornetto_tpu.dist.scan import sharded_window_stats
from cornetto_tpu.kernels.window_sum import window_stats_numpy


@pytest.mark.parametrize("n_sp", [1, 2, 4, 8])
@pytest.mark.parametrize("length,w,inc", [(100000, 2500, 50), (5000, 999, 37),
                                          (1000, 2500, 50)])
def test_sharded_scan_matches_host(n_sp, length, w, inc):
    rng = np.random.default_rng(n_sp * 1000 + length)
    d = rng.integers(0, 65536, size=length).astype(np.int32)
    mesh = make_mesh({"sp": n_sp})
    st, end, means = sharded_window_stats(mesh, d, length, w, inc)
    st0, end0, m0, _ = window_stats_numpy(d, d, w, inc)
    np.testing.assert_array_equal(st, st0)
    np.testing.assert_array_equal(end, end0)
    np.testing.assert_array_equal(means, m0)
