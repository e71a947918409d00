"""Sliding-window depth statistics, TPU-first.

This replaces the reference's O(L * W / inc) scalar inner loop
(reference: src/boringbits_main.c:346-366 sums window_size bases per window,
~50x genome-size integer adds at the defaults) with an O(L log W) data-parallel
formulation that XLA maps onto the VPU:

  sliding sums of length W at EVERY base position are built with ~log2(W)
  shifted adds (binary decomposition of W), entirely in int32 — safe because
  W * 65535 < 2^31 for any W <= 32767 (the default is 2500) — then window
  means are a strided gather + integer division.

Integer semantics match the C exactly: uint16 depths, truncating division by
the (possibly end-clamped) window length, and the reference's window-count
formula including its C truncation-toward-zero quirk for contigs shorter than
one window.
"""

import functools
from typing import Tuple

import numpy as np

from cornetto_tpu.utils.cformat import c_div

_INT32_SAFE_MAX_W = 32767  # W * 65535 < 2^31


def resolve_backend(backend: str) -> str:
    """'auto' picks the jax path only when a real accelerator is attached:
    on a CPU-only host the device path adds jit compile time plus a second
    int32 copy of every contig for no throughput gain over the vectorised
    NumPy twin (measured 2x slower and ~1 GB heavier at 50 Mbp)."""
    if backend != "auto":
        return backend
    import os
    if os.environ.get("CORNETTO_FORCE_CPU") == "1":
        return "numpy"
    try:
        import jax
        if any(d.platform != "cpu" for d in jax.devices()):
            return "jax"
    except Exception:
        pass
    return "numpy"


def n_windows(length: int, window_size: int, window_inc: int) -> int:
    """Reference window count (src/boringbits_main.c:338-339): C truncating
    division, clamped to >= 1."""
    n = c_div(length - window_size + window_inc - 1, window_inc) + 1
    return max(n, 1)


# ---------------------------------------------------------------------------
# NumPy reference implementation (host, exact, used for validation + fallback)
# ---------------------------------------------------------------------------

def window_stats_numpy(depth: np.ndarray, mq_depth: np.ndarray,
                       window_size: int, window_inc: int
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Returns (st, end, mean_depth, mean_mq_depth) int32 arrays, exact."""
    length = len(depth)
    nw = n_windows(length, window_size, window_inc)
    st = np.arange(nw, dtype=np.int64) * window_inc
    end = np.minimum(st + window_size, length)
    cs = np.zeros(length + 1, dtype=np.int64)
    np.cumsum(depth.astype(np.int64), out=cs[1:])
    cs_mq = np.zeros(length + 1, dtype=np.int64)
    np.cumsum(mq_depth.astype(np.int64), out=cs_mq[1:])
    div = end - st
    d = (cs[end] - cs[st]) // div
    mq = (cs_mq[end] - cs_mq[st]) // div
    return (st.astype(np.int32), end.astype(np.int32),
            d.astype(np.int32), mq.astype(np.int32))


# ---------------------------------------------------------------------------
# JAX/XLA implementation
# ---------------------------------------------------------------------------

def _shift_left_zeropad(a, s: int):
    """out[i] = a[i+s], zero-filled past the end (static shift)."""
    import jax.numpy as jnp
    if s == 0:
        return a
    return jnp.concatenate([a[s:], jnp.zeros((s,), dtype=a.dtype)])


def sliding_sum_i32(x, w: int):
    """Sliding sums of length `w` at every position of 1-D int32 `x` via
    binary decomposition: O(log w) shifted adds.  Positions within `w` of the
    end sum only the in-bounds suffix (zero padding semantics)."""
    import jax.numpy as jnp
    assert w >= 1
    total = None
    offset = 0
    cur = x          # sliding sum of length 2^k starting at each position
    width = 1
    rem = w
    while rem:
        if rem & 1:
            part = _shift_left_zeropad(cur, offset)
            total = part if total is None else total + part
            offset += width
        rem >>= 1
        if rem:
            cur = cur + _shift_left_zeropad(cur, width)
            width <<= 1
    return total


def _window_sums_strided(x, window_size: int, window_inc: int, nw_max: int):
    """Window sums at starts j*window_inc for j < nw_max.

    Fast path when window_inc divides window_size (the defaults, 2500/50):
    two-level decomposition — per-inc block sums (one dense reduce over the
    full array) followed by a sliding sum of window_size/inc blocks over
    the inc-times-smaller block array.  O(1) passes over the big array
    instead of O(log window_size).
    """
    import jax
    import jax.numpy as jnp
    n = x.shape[0]
    # NB: a (n/inc, inc)-reshape block-sum two-level path was measured but
    # the (M, 50) minor-dim layout stalls the TPU compiler.  On TPU the
    # single-pass Pallas tile kernel is 1.6x the flat doubling form
    # (kernels.pallas_window); CPU/interpret falls back to doubling.
    if jax.default_backend() not in ("cpu",) and window_size <= 65536:
        from cornetto_tpu.kernels.pallas_window import \
            sliding_window_sum_pallas
        win = sliding_window_sum_pallas(x, window_size)
    else:
        win = sliding_sum_i32(x, window_size)
    j = jnp.arange(nw_max, dtype=jnp.int32)
    st_c = jnp.minimum(j * window_inc, n - 1)
    return win[st_c]


def _window_stats_jax_padded(depth_pad, mq_pad, length,
                             window_size: int, window_inc: int, nw_max: int):
    """Jittable core over a zero-padded contig.

    depth_pad/mq_pad: int32 (padded_len,), zeros beyond `length`.
    Returns (st, end, d, mq) each (nw_max,) int32.
    """
    import jax.numpy as jnp
    win = _window_sums_strided(depth_pad, window_size, window_inc, nw_max)
    win_mq = _window_sums_strided(mq_pad, window_size, window_inc, nw_max)
    j = jnp.arange(nw_max, dtype=jnp.int32)
    st = j * window_inc
    end = jnp.minimum(st + window_size, length)
    div = jnp.maximum(end - st, 1)
    d = win // div
    mq = win_mq // div
    return st, end, d, mq


_jit_cache = {}


def window_stats_jax(depth: np.ndarray, mq_depth: np.ndarray,
                     window_size: int, window_inc: int, pad_bucket: int = 1 << 20
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Device-accelerated window stats, bit-identical to window_stats_numpy.

    Contigs are padded to bucket multiples so jit compiles once per bucket
    size rather than once per contig (XLA static shapes).
    """
    import jax
    import jax.numpy as jnp
    if window_size > _INT32_SAFE_MAX_W:
        return window_stats_numpy(depth, mq_depth, window_size, window_inc)
    length = len(depth)
    nw = n_windows(length, window_size, window_inc)
    padded_len = max(-(-(length + window_size) // pad_bucket), 1) * pad_bucket
    # keep the padded length a multiple of window_inc so the two-level
    # block-sum fast path applies
    padded_len = -(-padded_len // window_inc) * window_inc
    nw_max = n_windows(padded_len - window_size, window_size, window_inc)
    key = (padded_len, window_size, window_inc, nw_max)
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(
            functools.partial(_window_stats_jax_padded,
                              window_size=window_size,
                              window_inc=window_inc, nw_max=nw_max))
    fn = _jit_cache[key]
    dp = np.zeros(padded_len, dtype=np.int32)
    dp[:length] = depth
    mp = np.zeros(padded_len, dtype=np.int32)
    mp[:length] = mq_depth
    st, end, d, mq = fn(jnp.asarray(dp), jnp.asarray(mp),
                        jnp.int32(length))
    st = np.asarray(st)[:nw]
    end = np.asarray(end)[:nw]
    d = np.asarray(d)[:nw]
    mq = np.asarray(mq)[:nw]
    return st, end, d, mq
