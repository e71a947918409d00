"""Fused Pallas minimizer-extraction kernel: bit-parity with the XLA path
(kernels.minimizer.read_minimizers_jax) and with the host index build, plus
the fingerprinted-lookup decision path on packed reads."""

import numpy as np
import pytest

import jax.numpy as jnp

from cornetto_tpu.kernels.minimizer import (encode_seq, pack_reads,
                                            read_minimizers_jax,
                                            unpack_reads_jax)
from cornetto_tpu.kernels.pallas_extract import extract_minima_pallas


@pytest.mark.parametrize("B,L,k,w", [
    (64, 450, 15, 10),
    (32, 300, 15, 10),
    (16, 1024, 13, 8),
    (8, 200, 15, 12),
])
def test_extract_parity(B, L, k, w):
    rng = np.random.default_rng(7 + B)
    reads = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    reads[rng.random((B, L)) < 0.01] = 4      # sprinkle Ns
    packed, nmask = pack_reads(reads)
    codes = unpack_reads_jax(jnp.asarray(packed), jnp.asarray(nmask), L)
    _, h_ref, v_ref = read_minimizers_jax(codes, k=k, w=w, want_pos=False)
    h_p, v_p = extract_minima_pallas(jnp.asarray(packed),
                                     jnp.asarray(nmask), L, k, w,
                                     interpret=True)
    np.testing.assert_array_equal(np.asarray(h_ref), np.asarray(h_p))
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v_p))


def test_decide_packed_pallas_matches_xla():
    """decision_core_packed(use_pallas) == decision_core on unpacked reads,
    including the fingerprinted single-gather lookup."""
    import functools
    import jax
    from cornetto_tpu.livefish.decide import (decision_core,
                                              decision_core_packed)
    from cornetto_tpu.livefish.index import build_index, build_panel_mask
    rng = np.random.default_rng(11)
    bases = np.array(list("ACGT"))
    genome = {"c1": "".join(bases[rng.integers(0, 4, 30000)]),
              "c2": "".join(bases[rng.integers(0, 4, 20000)])}
    idx = build_index(genome, n_shards=1)
    panel = build_panel_mask(idx, [("c1", 5000, 15000)])
    L = 400
    reads = np.zeros((32, L), dtype=np.uint8)
    for i in range(16):
        s = int(rng.integers(0, 30000 - L))
        reads[i] = encode_seq(genome["c1"][s:s + L])
    reads[16:] = rng.integers(0, 4, size=(16, L)).astype(np.uint8)
    packed, nmask = pack_reads(reads)
    kw = dict(k=idx.k, w=idx.w, min_hits=3, bin_size=1000,
              bucket_shift=idx.bucket_shift)
    ref = decision_core(jnp.asarray(idx.btable[0]), jnp.asarray(reads),
                        jnp.asarray(panel), **kw)
    got = decision_core_packed(jnp.asarray(idx.btable[0]),
                               jnp.asarray(packed), jnp.asarray(nmask),
                               jnp.asarray(panel), L=L, use_pallas=True,
                               interpret=True, **kw)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
    # sanity: genome reads map, random mostly don't
    assert int(np.asarray(ref[3])[:16].min()) >= 3


def test_decide_packed_lengths_paths_agree():
    """The three packed input variants (nmask bitmap / lengths / XLA
    fallback with lengths) must produce identical decisions for short,
    N-free reads."""
    from cornetto_tpu.livefish.decide import decision_core_packed
    from cornetto_tpu.livefish.index import build_index, build_panel_mask
    rng = np.random.default_rng(21)
    bases = np.array(list("ACGT"))
    genome = {"c1": "".join(bases[rng.integers(0, 4, 20000)])}
    idx = build_index(genome, n_shards=1)
    panel = build_panel_mask(idx, [("c1", 2000, 9000)])
    L = 300
    rows = np.full((16, L), 4, dtype=np.uint8)
    lens = rng.integers(60, L + 1, size=16).astype(np.int32)
    for i in range(16):
        s = int(rng.integers(0, 20000 - L))
        rows[i, :lens[i]] = encode_seq(genome["c1"][s:s + int(lens[i])])
    packed, nmask = pack_reads(rows)
    kw = dict(L=L, k=idx.k, w=idx.w, min_hits=3, bin_size=1000,
              bucket_shift=idx.bucket_shift)
    bt, pn = jnp.asarray(idx.btable[0]), jnp.asarray(panel)
    ref = decision_core_packed(bt, jnp.asarray(packed), jnp.asarray(nmask),
                               pn, use_pallas=True, interpret=True, **kw)
    got_len = decision_core_packed(bt, jnp.asarray(packed), None, pn,
                                   use_pallas=True, interpret=True,
                                   lengths=jnp.asarray(lens), **kw)
    got_xla = decision_core_packed(bt, jnp.asarray(packed), None, pn,
                                   use_pallas=False,
                                   lengths=jnp.asarray(lens), **kw)
    for r, a, b in zip(ref, got_len, got_xla):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(a))
        np.testing.assert_array_equal(np.asarray(r), np.asarray(b))


def test_fingerprint_lookup_exact():
    """Every indexed minimizer must be found by the fingerprint lookup with
    its exact contig and position (zero drops at this scale).  One query per
    row so the per-contig stats pin each hash individually: exactly one
    vote, on the right contig, with the position sum equal to the stored
    refpos.  The genome carries a deliberate exact repeat so ambiguous
    (multi-occurrence) hashes exercise the two-slot path: their first AND
    second occurrences must both come back (numer_a1 / numer_a2)."""
    from cornetto_tpu.livefish.decide import _lookup_votes
    from cornetto_tpu.livefish.index import build_index
    rng = np.random.default_rng(3)
    bases = np.array(list("ACGT"))
    g1 = bases[rng.integers(0, 4, 30000)]
    g1[20000:23000] = g1[2000:5000]          # exact repeat -> ambiguity
    genome = {"c1": "".join(g1),
              "c2": "".join(bases[rng.integers(0, 4, 20000)])}
    idx = build_index(genome, n_shards=1)
    assert idx.dropped_frac == 0.0
    n = int(idx.shard_counts[0])
    h = idx.hashes[0, :n]
    pos_raw = idx.positions[0, :n]
    amb = pos_raw < 0
    assert amb.any(), "repeat failed to produce ambiguous hashes"
    pos = pos_raw & 0x7FFFFFFF
    q = jnp.asarray(h[:, None])                      # (n, 1): one per row
    (votes, votes_un, nu_hi, nu_lo, votes_amb,
     a1_hi, a1_lo, a2_hi, a2_lo) = (
        np.asarray(x, dtype=np.int64) for x in _lookup_votes(
            jnp.asarray(idx.btable[0]), idx.bucket_shift, q,
            jnp.ones_like(q, dtype=bool), 2))
    numer_un = (nu_hi << 16) + nu_lo
    numer_a1 = (a1_hi << 16) + a1_lo
    numer_a2 = (a2_hi << 16) + a2_lo
    rows = np.arange(n)
    exp_ctg = idx.contigs[0, :n]
    assert (votes.sum(axis=1) == 1).all()            # found, exactly once
    np.testing.assert_array_equal(votes[rows, exp_ctg], 1)
    # ambiguity classification matches the index marks
    np.testing.assert_array_equal(votes_un[rows, exp_ctg], (~amb) * 1)
    np.testing.assert_array_equal(votes_amb[rows, exp_ctg], amb * 1)
    # unambiguous hashes: exact stored position
    np.testing.assert_array_equal(numer_un[rows, exp_ctg][~amb], pos[~amb])
    # ambiguous hashes are stored as adjacent (first, second) occurrence
    # pairs: both dup rows of a pair answer with (first_pos, second_pos)
    first = np.flatnonzero(amb[:-1] & (h[:-1] == h[1:]))
    assert len(first), "expected adjacent ambiguous pairs"
    for i in first:
        for r in (i, i + 1):
            assert numer_a1[r, exp_ctg[r]] == pos[i]
            assert numer_a2[r, exp_ctg[r]] == pos[i + 1]
