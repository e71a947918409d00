"""livefish decision-engine tests on the virtual 8-device CPU mesh:
single-chip vs sharded parity, and decision correctness against ground
truth read origins."""

import numpy as np
import pytest

from cornetto_tpu.kernels.minimizer import encode_seq, minimizers_np
from cornetto_tpu.livefish.decide import (DecisionParams, SingleChipEngine,
                                          make_sharded_engine)
from cornetto_tpu.livefish.index import build_index, build_panel_mask

BASES = np.array(list("ACGT"))


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(99)
    return {
        "ctgA": "".join(BASES[rng.integers(0, 4, 60000)]),
        "ctgB": "".join(BASES[rng.integers(0, 4, 40000)]),
    }


@pytest.fixture(scope="module")
def panel_rows():
    # boring (reject) panel: middle of ctgA
    return [("ctgA", 20000, 40000)]


def _sample_reads(genome, rng, n, L, contig, lo, hi):
    seq = genome[contig]
    reads = np.zeros((n, L), dtype=np.uint8)
    starts = []
    for i in range(n):
        s = int(rng.integers(lo, hi - L))
        reads[i] = encode_seq(seq[s:s + L])
        starts.append(s)
    return reads, starts


def test_minimizer_np_jax_parity(genome):
    import jax.numpy as jnp
    from cornetto_tpu.kernels.minimizer import read_minimizers_jax
    seq = genome["ctgA"][:1024]
    codes = encode_seq(seq)
    pos_np, h_np = minimizers_np(codes, k=15, w=10)
    pos_j, h_j, v_j = read_minimizers_jax(jnp.asarray(codes[None, :]),
                                          k=15, w=10)
    pos_j = np.asarray(pos_j[0])[np.asarray(v_j[0])]
    h_j = np.asarray(h_j[0])[np.asarray(v_j[0])]
    np.testing.assert_array_equal(pos_np, pos_j)
    np.testing.assert_array_equal(h_np, h_j)


def test_decisions_ground_truth(genome, panel_rows):
    rng = np.random.default_rng(5)
    idx = build_index(genome, n_shards=1)
    panel = build_panel_mask(idx, panel_rows)
    eng = SingleChipEngine(idx, panel)
    L = 400
    boring_reads, _ = _sample_reads(genome, rng, 16, L, "ctgA", 21000, 38000)
    fun_reads, _ = _sample_reads(genome, rng, 16, L, "ctgA", 42000, 59000)
    other_reads, _ = _sample_reads(genome, rng, 16, L, "ctgB", 0, 39000)
    random_reads = rng.integers(0, 4, size=(16, L)).astype(np.uint8)
    d_boring, best, est, nh = eng.decide(boring_reads)[:4]
    d_fun = eng.decide(fun_reads)[0]
    d_other, bo = eng.decide(other_reads)[:2]
    res_rand = eng.decide(random_reads)
    d_rand, nh_rand = res_rand[0], res_rand[3]
    assert np.all(np.asarray(d_boring) == 0)      # reject boring-region reads
    assert np.all(np.asarray(d_fun) == 1)         # keep fun-region reads
    assert np.all(np.asarray(d_other) == 1)       # ctgB not in panel
    assert np.all(np.asarray(bo) == 1)
    assert np.all(np.asarray(d_rand) == 1)        # unmapped -> keep
    assert np.all(np.asarray(nh_rand) < 3)


@pytest.mark.parametrize("dp,ep", [(2, 4), (4, 1)])
def test_sharded_packed_matches_single(genome, panel_rows, dp, ep):
    """The dp/ep-sharded packed fast path (2-bit codes + lengths only)
    must equal the single-chip packed decisions."""
    import jax
    from jax.sharding import Mesh
    from cornetto_tpu.kernels.minimizer import pack_reads
    rng = np.random.default_rng(13)
    devices = np.array(jax.devices()[:dp * ep]).reshape(dp, ep)
    mesh = Mesh(devices, ("dp", "ep"))
    idx1 = build_index(genome, n_shards=1)
    idxE = build_index(genome, n_shards=ep)
    panel = build_panel_mask(idx1, panel_rows)
    eng1 = SingleChipEngine(idx1, panel)
    engE = make_sharded_engine(mesh, idxE, panel)
    L = 400
    rows = np.full((16, L), 4, dtype=np.uint8)
    lens = rng.integers(120, L + 1, size=16).astype(np.int32)
    for i in range(16):
        s = int(rng.integers(0, 59000 - L))
        rows[i, :lens[i]] = encode_seq(
            genome["ctgA"][s:s + int(lens[i])])
    packed, nmask = pack_reads(rows)
    for nm, ln in ((nmask, None), (None, lens), (None, None)):
        r1 = eng1.decide_packed(packed, nm, L, lengths=ln)
        rE = engE.decide_packed(packed, nm, L, lengths=ln)
        for a, b in zip(r1, rE):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("dp,ep", [(2, 4), (4, 2), (1, 8), (8, 1)])
def test_sharded_matches_single(genome, panel_rows, dp, ep):
    import jax
    from jax.sharding import Mesh
    rng = np.random.default_rng(6)
    devices = np.array(jax.devices()[:dp * ep]).reshape(dp, ep)
    mesh = Mesh(devices, ("dp", "ep"))
    idx1 = build_index(genome, n_shards=1)
    idxE = build_index(genome, n_shards=ep)
    panel = build_panel_mask(idx1, panel_rows)
    eng1 = SingleChipEngine(idx1, panel)
    engE = make_sharded_engine(mesh, idxE, panel)
    L = 400
    reads = np.concatenate([
        _sample_reads(genome, rng, 8, L, "ctgA", 21000, 38000)[0],
        _sample_reads(genome, rng, 8, L, "ctgA", 42000, 59000)[0],
        _sample_reads(genome, rng, 8, L, "ctgB", 0, 39000)[0],
        rng.integers(0, 4, size=(8, L)).astype(np.uint8),
    ])
    res1 = eng1.decide(reads)
    resE = engE(reads)
    # all six outputs (incl. hq hits + second repeat-copy estimate) must
    # be sharding-invariant
    for a, b in zip(res1, resE):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_est_exact_on_chromosome_scale_positions():
    """Position means must be exact for positions far beyond the ~47 Mb
    ceiling a single int32 sum had (human chr1 is 248 Mb): the lookup
    accumulates hi/lo 16-bit halves and _decide_from_minima reconstructs
    floor(mean) overflow-free."""
    import jax.numpy as jnp
    from cornetto_tpu.livefish.decide import _decide_from_minima
    from cornetto_tpu.livefish.index import build_index
    rng = np.random.default_rng(21)
    bases = np.array(list("ACGT"))
    genome = {"big": "".join(bases[rng.integers(0, 4, 40_000)])}
    idx = build_index(genome, n_shards=1)
    bt = np.array(idx.btable[0])
    # relocate every stored position to chromosome scale (~240 Mb):
    # pos words are rows [:, K:2K]; keep the ambiguity sign bit
    OFF = 240_000_000
    K = bt.shape[1] // 2
    pw = bt[:, K:]
    ct = np.stack([(bt[:, K // 2 + s // 2] >> (16 * (s % 2))) & 0xFFFF
                   for s in range(K)], axis=1)
    used = ct != 0xFFFF
    amb = (pw < 0) & used
    base = np.where(used, (pw & 0x7FFFFFFF) + OFF, pw)
    bt[:, K:] = np.where(amb, base | np.int32(-2**31),
                         np.where(used, base, pw))
    n = int(idx.shard_counts[0])
    h = idx.hashes[0, :n]
    q = jnp.asarray(h[:64][None, :])          # one read of 64 real hashes
    d, best, est, nh, nhq, est2 = _decide_from_minima(
        jnp.asarray(bt), q, jnp.ones_like(q, bool),
        jnp.asarray(np.zeros((1, 128), bool)), 3, 1000, idx.bucket_shift)
    # int64 oracle over the same stored (possibly relocated) positions
    exp_pos = (idx.positions[0, :64].astype(np.int64) & 0x7FFFFFFF) + OFF
    is_amb = idx.positions[0, :64] < 0
    exp = int(exp_pos[~is_amb].sum() // max((~is_amb).sum(), 1)) \
        if (~is_amb).any() else int(exp_pos[is_amb].sum() // is_amb.sum())
    assert int(np.asarray(est)[0]) == exp
    assert int(np.asarray(est)[0]) >= OFF     # no int32 wrap
