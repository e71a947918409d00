"""Pallas telomere-motif scan kernels + the telofind device path.

MEASUREMENT HISTORY (kept because each round's number taught something):
round 1's "3.2% of roofline" timed the tunnel's ~25 ms per-dispatch cost,
not the kernel; round 2's chained_time fix measured the XLA kernel at
~131 Gbases/s and called it "132% of roofline" — which round 5 exposed
as a second artifact, this time in the ROOFLINE probe (plain-timeit ate
dispatch latency and deflated it ~3x).  Current honest numbers
(BENCH_KERNELS.json): XLA telo_run_stats_jax ~103 Gbases/s = ~16% of
the 629 GB/s memcpy roofline on its 1 B/base minimum-IO model; the
Pallas stats twin here is ~3x slower (Mosaic serializes the doubling
less efficiently than XLA's fusion); the match-mask Pallas kernel runs
within ~2x of XLA.  TPU-first means letting XLA fuse this one: the XLA
kernels stay the production path, and these Pallas twins are kept as
the VMEM-explicit variants plus the chunked long-sequence mask
machinery for tools/telofind.py.

- telo_match_mask_pallas / telo_match_mask_long: match[i] = AND_j
  codes[i+j]==motif[j] — the exact occurrence set of tools/telofind.py
  (reference semantics: src/find_telomere.c:44-74); scan_runs_from_mask
  reconstructs the greedy run rows byte-identically from the sparse
  match positions.
- telo_run_stats_pallas: per-read (n_matches, longest tandem run,
  terminal) for livefish read tagging, bit-identical to
  telo_scan.telo_run_stats_jax.

Mosaic notes: rolls are 32-bit only (codes widen on load); i8/i16 buy no
VPU throughput (32-bit lanes); pltpu.roll has no CPU interpret lowering
(interpret mode falls back to concatenate).
"""

import functools

import numpy as np


def _steps_for(m: int, k: int) -> int:
    max_copies = max(m // k, 1)
    return max(int(np.ceil(np.log2(max_copies))), 0)


def _roll_left(x, s, L, interpret):
    import jax.numpy as jnp
    if interpret:
        # pltpu.roll has no interpret-mode lowering on CPU
        return jnp.concatenate([x[:, s:], x[:, :s]], axis=1)
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.roll(x, L - s, axis=1)


def _mask_kernel(x_ref, o_ref, *, motif, m, interpret):
    import jax
    import jax.numpy as jnp
    BT, L = x_ref.shape
    x = x_ref[:].astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (BT, L), 1)
    ok = x == motif[0]
    for j in range(1, len(motif)):
        ok = ok & (_roll_left(x, j, L, interpret) == motif[j])
    o_ref[:] = (ok & (col < m)).astype(jnp.int8)


def telo_match_mask_pallas(codes, motif_codes, block_rows: int = 32,
                           interpret: bool = False):
    """codes (B, L) uint8 (0-3 bases; 4+ never matches).  Returns
    (B, L) int8 — 1 where the motif matches starting at that position
    (positions >= L-k+1 are always 0)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    k = len(motif_codes)
    B, L = codes.shape
    m = L - k + 1
    BT = min(block_rows, B)
    pad_b = (-B) % BT
    if pad_b:
        codes = jnp.pad(codes, ((0, pad_b), (0, 0)))
    kern = functools.partial(_mask_kernel, motif=tuple(motif_codes), m=m,
                             interpret=interpret)
    out = pl.pallas_call(
        kern,
        grid=(codes.shape[0] // BT,),
        in_specs=[pl.BlockSpec((BT, L), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BT, L), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((codes.shape[0], L), jnp.int8),
        interpret=interpret,
    )(codes)
    return out[:B]


def telo_match_mask_long(seq_codes: np.ndarray, motif_codes,
                         chunk: int = 1 << 16, interpret: bool = False
                         ) -> np.ndarray:
    """Match mask for ONE long sequence (a contig): host-side chunking into
    an overlapping (n_chunks, chunk + k - 1) batch (k-1-byte halo per
    chunk), one kernel launch, reassembled to (len(seq),) bool."""
    k = len(motif_codes)
    L = len(seq_codes)
    if L < k:
        return np.zeros(L, dtype=bool)
    halo = k - 1
    # pad so every chunk row has a full halo; pad code 4 never matches
    n_chunks = max(-(-L // chunk), 1)
    padded = np.full(n_chunks * chunk + halo, 4, dtype=np.uint8)
    padded[:L] = seq_codes
    # row r = padded[r*chunk : r*chunk + chunk + halo]
    rows = np.lib.stride_tricks.sliding_window_view(
        padded, chunk + halo)[::chunk][:n_chunks]
    # pad width to a lane multiple; code 4 tail never matches
    W = -(-(chunk + halo) // 128) * 128
    batch = np.full((n_chunks, W), 4, dtype=np.uint8)
    batch[:, :chunk + halo] = rows
    mask = np.asarray(telo_match_mask_pallas(batch, motif_codes,
                                             interpret=interpret))
    return mask[:, :chunk].reshape(-1)[:L].astype(bool)


def _stats_kernel(x_ref, o_ref, *, motif, m, steps, k, thresh, interpret):
    import jax
    import jax.numpy as jnp
    BT, L = x_ref.shape
    x = x_ref[:].astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, (BT, L), 1)
    ok = x == motif[0]
    for j in range(1, k):
        ok = ok & (_roll_left(x, j, L, interpret) == motif[j])
    ok = ok & (col < m)
    run = ok.astype(jnp.int32)
    n = jnp.sum(run, axis=1, dtype=jnp.int32)
    width = 1
    for _ in range(steps):
        s = width * k
        if s < L:
            shifted = jnp.where(col < L - s,
                                _roll_left(run, s, L, interpret), 0)
        else:
            shifted = jnp.zeros_like(run)
        run = jnp.where(run == width, run + shifted, run)
        width *= 2
    longest = jnp.max(run, axis=1)
    terminal = (run[:, 0] >= thresh).astype(jnp.int32)
    o_ref[:] = jnp.stack([n, longest, terminal] + [jnp.zeros_like(n)] * 5,
                         axis=1)


def telo_run_stats_pallas(codes, motif_codes, min_run_bases: int = 24,
                          block_rows: int = 32, interpret: bool = False):
    """codes (B, L) uint8.  Returns (n_matches (B,) int32, longest_run (B,)
    int32 in motif copies, terminal (B,) bool) — bit-identical to
    telo_scan.telo_run_stats_jax."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    k = len(motif_codes)
    B, L = codes.shape
    m = L - k + 1
    BT = min(block_rows, B)
    pad_b = (-B) % BT
    if pad_b:
        codes = jnp.pad(codes, ((0, pad_b), (0, 0)))
    kern = functools.partial(_stats_kernel, motif=tuple(motif_codes), m=m,
                             steps=_steps_for(m, k), k=k,
                             thresh=-(-min_run_bases // k),
                             interpret=interpret)
    out = pl.pallas_call(
        kern,
        grid=(codes.shape[0] // BT,),
        in_specs=[pl.BlockSpec((BT, L), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BT, 8), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((codes.shape[0], 8), jnp.int32),
        interpret=interpret,
    )(codes)
    return out[:B, 0], out[:B, 1], out[:B, 2].astype(bool)


def scan_runs_from_mask(mask: np.ndarray, k: int):
    """Reconstruct tools/telofind.scan_runs' greedy walk from a match mask:
    next occurrence >= cursor, extend in k-steps while matching, resume at
    end+1 (reference: src/find_telomere.c:44-74).  O(#matches), exact."""
    idx = np.flatnonzero(mask)
    pos = 0
    out = []
    for q in idx:
        if q < pos:
            continue
        p = int(q)
        while p < len(mask) and mask[p]:
            p += k
        out.append((int(q), p, p - int(q)))
        pos = p + 1
    return out
