"""Native (C) index-build kernels vs their NumPy twins: extraction, dedup
and the bucket fill must be bit-identical (the C path is the production
build; NumPy is the validated oracle — native/minimizer_native.c)."""

import numpy as np
import pytest

from cornetto_tpu import native
from cornetto_tpu.kernels.minimizer import (encode_seq, minimizers_native,
                                            minimizers_np)

pytestmark = pytest.mark.skipif(
    native.load("minimizer_native", "minimizer_native.c") is None,
    reason="no C compiler")


def _rand_seq(rng, n, with_n=False):
    bases = np.array(list("ACGTN" if with_n else "ACGT"))
    probs = [0.24, 0.24, 0.24, 0.24, 0.04] if with_n else None
    return "".join(rng.choice(bases, size=n, p=probs))


@pytest.mark.parametrize("n,with_n", [(10_000, False), (10_000, True),
                                      (257, False), (14, False),
                                      (1_000_003, False)])
def test_extract_matches_numpy(n, with_n):
    rng = np.random.default_rng(n)
    codes = encode_seq(_rand_seq(rng, n, with_n))
    p0, h0 = minimizers_np(codes)
    p1, h1 = minimizers_native(codes)
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_array_equal(h0, h1)


@pytest.mark.parametrize("k,w", [(11, 5), (16, 10), (15, 1)])
def test_extract_matches_numpy_kw(k, w):
    rng = np.random.default_rng(99)
    codes = encode_seq(_rand_seq(rng, 50_000, True))
    p0, h0 = minimizers_np(codes, k=k, w=w)
    p1, h1 = minimizers_native(codes, k=k, w=w)
    np.testing.assert_array_equal(p0, p1)
    np.testing.assert_array_equal(h0, h1)


def _build_both(genome, n_shards, **kw):
    import cornetto_tpu.livefish.index as lfi
    idx_c = lfi.build_index(genome, n_shards=n_shards, **kw)
    real_load = native.load
    try:
        # force the NumPy fallback path
        native.load = lambda *a, **k: None
        idx_np = lfi.build_index(genome, n_shards=n_shards, **kw)
    finally:
        native.load = real_load
    return idx_c, idx_np


@pytest.mark.parametrize("n_shards", [1, 2, 4])
@pytest.mark.parametrize("two_choice", [True, False])
def test_build_index_native_equals_numpy(n_shards, two_choice):
    rng = np.random.default_rng(7)
    g1 = np.array(list("ACGT"))[rng.integers(0, 4, 60_000)]
    g1[40_000:45_000] = g1[5_000:10_000]    # exact repeat -> ambiguity
    genome = {"c1": "".join(g1),
              "c2": _rand_seq(np.random.default_rng(8), 30_000, True)}
    idx_c, idx_np = _build_both(genome, n_shards, two_choice=two_choice)
    assert idx_c.bucket_shift == idx_np.bucket_shift
    assert idx_c.btable.shape == idx_np.btable.shape
    np.testing.assert_array_equal(idx_c.btable, idx_np.btable)
    np.testing.assert_array_equal(idx_c.shard_counts, idx_np.shard_counts)
    np.testing.assert_array_equal(idx_c.hashes, idx_np.hashes)
    np.testing.assert_array_equal(idx_c.contigs, idx_np.contigs)
    np.testing.assert_array_equal(idx_c.positions, idx_np.positions)
    assert idx_c.dropped_frac == idx_np.dropped_frac


def test_keep_tables_false_roundtrip(tmp_path):
    from cornetto_tpu.dist.checkpoint import load_index, save_index
    from cornetto_tpu.livefish.index import build_index, build_panel_mask
    rng = np.random.default_rng(3)
    genome = {"c1": _rand_seq(rng, 20_000)}
    idx = build_index(genome, n_shards=2, keep_tables=False)
    assert idx.hashes is None
    assert idx.n_shards == 2
    panel = build_panel_mask(idx, [("c1", 100, 5_000)])
    save_index(str(tmp_path / "idx"), idx, panel_mask=panel)
    idx2, panel2, _ = load_index(str(tmp_path / "idx"))
    assert idx2.hashes is None
    np.testing.assert_array_equal(idx.btable, idx2.btable)
    np.testing.assert_array_equal(panel, panel2)
    # decisions identical to a keep_tables build (same btable)
    full = build_index(genome, n_shards=2, keep_tables=True)
    np.testing.assert_array_equal(full.btable, idx.btable)
