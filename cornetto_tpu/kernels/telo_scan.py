"""Device telomere-motif scan kernel.

Batched shifted-compare over 2-bit codes: match[i] = AND_j (codes[i+j] ==
motif[j]) — k compares + k-1 ANDs per base, pure VPU, fused by XLA into a
single elementwise kernel.  Used by the livefish path to tag telomeric
reads on device; the host tool path (tools/telofind.py) uses the memchr
scan which is already IO-bound.

Speed-of-light: on the 1 B/base minimum-IO model the scan measures
~103 Gbases/s device-resident = ~16% of the properly-measured 629 GB/s
memcpy roofline (BENCH_KERNELS.json telo_scan_xla; the round-4 "132% of
roofline" figure was an artifact of a dispatch-deflated roofline probe
and is retired).  The gap is the ~log2(m/k) int32 doubling passes of
the run-length phase; it is still the production path — faster than the
Pallas twins (kernels.pallas_telo) and far beyond what the IO-bound
host tools can feed.
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
