"""Minimizer extraction kernels (device + host twins).

The livefish decision loop replaces the reference protocol's dependency on
readfish+minimap2 for real-time accept/reject decisions
(reference: docs/protocol.md:137-161 hands this to readfish).  Reads are
2-bit packed, k-mers built with shifted ORs, canonicalised, hashed with an
invertible finalizer, and windowed minima taken at stride w — all static
shapes, all VPU-friendly elementwise ops, so XLA fuses the entire extraction
into a handful of kernels.

Design notes (TPU-first):
- dense stride-w sampling (one minimizer per w-window) instead of the
  classic (w,k) scheme keeps every shape static under jit;
- the k-mer build is O(k) shifted ors on uint32 lanes; sliding minima use
  log2(w) doubling steps — no data-dependent control flow anywhere.
"""

import functools

import numpy as np

DEFAULT_K = 15
DEFAULT_W = 10

_CODE = np.full(256, 4, dtype=np.uint8)
for _i, _c in enumerate("ACGT"):
    _CODE[ord(_c)] = _i
    _CODE[ord(_c.lower())] = _i


def encode_seq(seq: str) -> np.ndarray:
    """ASCII -> 2-bit codes (4 = N/other)."""
    return _CODE[np.frombuffer(seq.encode("latin-1"), dtype=np.uint8)]


def _hash32_np(x: np.ndarray) -> np.ndarray:
    """Invertible 32-bit mix (minimap2-style finalizer), numpy."""
    x = x.astype(np.uint64)
    mask = np.uint64(0xFFFFFFFF)
    x = (~x + (x << np.uint64(21))) & mask
    x = x ^ (x >> np.uint64(24))
    x = (x + (x << np.uint64(3)) + (x << np.uint64(8))) & mask
    x = x ^ (x >> np.uint64(14))
    x = (x + (x << np.uint64(2)) + (x << np.uint64(4))) & mask
    x = x ^ (x >> np.uint64(28))
    x = (x + (x << np.uint64(31))) & mask
    return x.astype(np.uint32)


def minimizers_np(codes: np.ndarray, k: int = DEFAULT_K, w: int = DEFAULT_W):
    """Host twin of the device kernel: returns (positions, hashes) of the
    stride-w windowed minima over canonical k-mer hashes."""
    n = len(codes)
    if n < k:
        return (np.empty(0, dtype=np.int32), np.empty(0, dtype=np.uint32))
    m = n - k + 1
    valid = np.ones(m, dtype=bool)
    fwd = np.zeros(m, dtype=np.uint64)
    rev = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        c = codes[j:m + j]
        valid &= c < 4
        fwd = (fwd << np.uint64(2)) | c.astype(np.uint64)
        rev = rev | ((np.uint64(3) - np.minimum(c, 3).astype(np.uint64))
                     << np.uint64(2 * j))
    mask = np.uint64((1 << (2 * k)) - 1)
    fwd &= mask
    canon = np.minimum(fwd, rev)
    h = _hash32_np(canon.astype(np.uint64))
    h = np.where(valid, h, np.uint32(0xFFFFFFFF))
    nwin = m // w
    if nwin == 0:
        return (np.empty(0, dtype=np.int32), np.empty(0, dtype=np.uint32))
    hw = h[:nwin * w].reshape(nwin, w)
    arg = hw.argmin(axis=1)
    pos = (np.arange(nwin) * w + arg).astype(np.int32)
    hmin = hw[np.arange(nwin), arg]
    keep = hmin != np.uint32(0xFFFFFFFF)
    return pos[keep], hmin[keep]


# ---------------------------------------------------------------------------
# JAX device kernel
# ---------------------------------------------------------------------------

def hash32_jax(x):
    import jax.numpy as jnp
    x = x.astype(jnp.uint32)
    x = (~x) + (x << 21)
    x = x ^ (x >> 24)
    x = x + (x << 3) + (x << 8)
    x = x ^ (x >> 14)
    x = x + (x << 2) + (x << 4)
    x = x ^ (x >> 28)
    x = x + (x << 31)
    return x


def read_minimizers_jax(codes, k: int = DEFAULT_K, w: int = DEFAULT_W):
    """Batched device kernel: codes (B, L) uint8 -> (positions (B, M) int32,
    hashes (B, M) uint32, valid (B, M) bool), M = (L-k+1)//w, static.

    NOTE: the 32-bit hash here finalizes the low 32 bits of the canonical
    k-mer (k<=16); the host index build must use matching semantics — see
    livefish.index.build_index which hashes with the same function.
    """
    import jax.numpy as jnp
    B, L = codes.shape
    m = L - k + 1
    valid = jnp.ones((B, m), dtype=bool)
    fwd = jnp.zeros((B, m), dtype=jnp.uint32)
    rev = jnp.zeros((B, m), dtype=jnp.uint32)
    for j in range(k):
        c = codes[:, j:m + j]
        valid &= c < 4
        c32 = jnp.minimum(c, 3).astype(jnp.uint32)
        fwd = (fwd << 2) | c32
        rev = rev | ((jnp.uint32(3) - c32) << (2 * j))
    if 2 * k < 32:
        fwd = fwd & jnp.uint32((1 << (2 * k)) - 1)
    canon = jnp.minimum(fwd, rev)
    h = hash32_jax(canon)
    h = jnp.where(valid, h, jnp.uint32(0xFFFFFFFF))
    nwin = m // w
    hw = h[:, :nwin * w].reshape(B, nwin, w)
    arg = jnp.argmin(hw, axis=2).astype(jnp.int32)
    win_base = (jnp.arange(nwin, dtype=jnp.int32) * w)[None, :]
    pos = win_base + arg
    hmin = jnp.take_along_axis(hw, arg[:, :, None], axis=2)[:, :, 0]
    vmin = hmin != jnp.uint32(0xFFFFFFFF)
    return pos, hmin, vmin
