"""Wide-bucket device table (round-4 verdict item 4): K=16 slot rows must
halve the directory bytes/entry at the same 0.5% overflow bound, while
lookups stay a single row-gather and decisions stay exact.

Reference for the role: the readfish+minimap2 index the reference protocol
delegates to (docs/protocol.md) — this table is livefish's on-device
replacement; layout in cornetto_tpu/livefish/index.py."""

import numpy as np
import pytest

from cornetto_tpu.livefish.index import build_index, build_panel_mask


def _genome(mbp: float, seed: int = 3):
    rng = np.random.default_rng(seed)
    bases = np.array(list("ACGT"))
    n = int(mbp * 1e6)
    return {"g": "".join(bases[rng.integers(0, 4, n)])}


def _stored_entries(idx):
    K = idx.bucket_slots
    bt = idx.btable
    ct = np.stack([(bt[:, :, K // 2 + s // 2] >> (16 * (s % 2))) & 0xFFFF
                   for s in range(K)], axis=2)
    return int((ct != 0xFFFF).sum())


@pytest.mark.slow
def test_wide_rows_shrink_table_at_scale():
    # sized so the overflow-growth loop binds (the 16-log2E fingerprint
    # floor dominates below ~1M entries and hides the occupancy effect)
    g = _genome(6.0)
    idx4 = build_index(g, bucket_slots=4, keep_tables=False)
    idx16 = build_index(g, bucket_slots=16, keep_tables=False)
    assert idx4.dropped_frac <= 0.005
    assert idx16.dropped_frac <= 0.005
    n4, n16 = _stored_entries(idx4), _stored_entries(idx16)
    bpe4 = idx4.btable.nbytes / n4
    bpe16 = idx16.btable.nbytes / n16
    # the headline claim: >= 1.8x fewer table bytes per stored entry
    assert bpe16 <= 0.55 * bpe4, (bpe4, bpe16)
    occ16 = n16 / (idx16.btable.shape[1] * 16)
    assert occ16 >= 0.45, occ16


def test_decisions_identical_across_slot_widths():
    # at a scale where NO bucket overflows, every slot width stores the
    # exact same entry set -> the full 6-tuple decision output must match
    import jax.numpy as jnp
    from cornetto_tpu.livefish.decide import DecisionParams, SingleChipEngine
    g = _genome(0.1)   # small enough that no bucket overflows at any K
    rng = np.random.default_rng(11)
    bases = np.array(list("ACGT"))
    seq = g["g"]
    reads = np.empty((64, 450), dtype=np.uint8)
    from cornetto_tpu.kernels.minimizer import encode_seq
    for i in range(64):
        if i % 2 == 0:
            s = int(rng.integers(0, len(seq) - 450))
            reads[i] = encode_seq(seq[s:s + 450])
        else:
            reads[i] = rng.integers(0, 4, 450).astype(np.uint8)
    outs = []
    for K in (4, 8, 16):
        idx = build_index(g, bucket_slots=K)
        assert idx.dropped_frac == 0.0
        panel = build_panel_mask(idx, [("g", 0, len(seq) // 2)])
        eng = SingleChipEngine(idx, panel, DecisionParams())
        outs.append([np.asarray(x) for x in eng.decide(reads)])
    for got in outs[1:]:
        for a, b in zip(outs[0], got):
            np.testing.assert_array_equal(a, b)
