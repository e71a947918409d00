"""Fused minimizer-extraction Pallas kernel for the livefish decision loop.

The XLA extraction path (kernels.minimizer.read_minimizers_jax) materializes
the unpacked codes plus every doubling-pyramid intermediate in HBM — ~20
full-array passes per batch that dominate the decision step.  This kernel
performs the whole chain per VMEM-resident tile of reads:

    2-bit unpack -> k-mer doubling pyramid (fwd + reverse-complement) ->
    canonical hash -> sliding window-min of width w

so HBM traffic is one uint8 read of the packed reads and one uint32 write
of the sliding minima (the stride-w downsample to one minimizer per window
is a single strided slice left to XLA, fused into the consumer).

Bit-identical to read_minimizers_jax / minimizers_np (the host index build),
which replace the minimap2 index of readfish's decision path (reference:
docs/protocol.md:137-161).  All shifts are lane-rolls on full 128-multiple
arrays — static shapes, no data-dependent control flow.
"""

import functools

import numpy as np

from cornetto_tpu.kernels.minimizer import hash32_jax

_LANE = 128


def _rol(x, s: int):
    """Left-rotate along the lane (last) axis: out[i] = x[i+s] (wrapping).

    Wrapped lanes only ever land on positions >= m which are masked to the
    0xFFFFFFFF sentinel afterwards, so the wraparound is harmless.  Uses
    Mosaic's native lane rotate (pltpu.roll takes non-negative shifts, so
    left-by-s = right-by-(N-s)) instead of a two-slice concatenate.
    """
    from jax.experimental.pallas import tpu as pltpu
    if s == 0:
        return x
    return pltpu.roll(x, x.shape[1] - s, 1)


def _doubling_minimizers(codes_i32, valid0, k: int, w: int, m: int,
                         skip_valid: bool = False):
    """Shared kernel body: (TB, Lp) int32 codes (0..3) + validity ->
    (TB, Lp) int32 sliding window-min (width w) of canonical k-mer hashes
    in SORTABLE-SIGNED form (h ^ 0x80000000 viewed as int32 — Mosaic has no
    unsigned vector min, and signed order of the flipped bits equals
    unsigned hash order), with invalid / out-of-range positions at the
    int32-max sentinel (= flipped 0xFFFFFFFF).

    valid0: per-BASE validity as int32 0/1 (Mosaic cannot roll / bitcast
    i1 vectors), pyramided down to per-k-mer validity; None = every base
    valid; skip_valid = valid0 is ALREADY per-k-mer (e.g. a length bound),
    no pyramid needed."""
    import jax
    import jax.numpy as jnp

    assert 2 * k < 32, "k-mer must leave the int32 sign bit clear"
    c = codes_i32
    r = jnp.int32(3) - c
    track_valid = valid0 is not None and not skip_valid

    # doubling pyramid: fwds[width][i] = big-endian packed word of `width`
    # bases at i; revs[width][i] = complement packed little-endian (the
    # full-k combine then yields the reverse complement), as in
    # kernels.minimizer.read_minimizers_jax.
    widths = [1]
    fwds = {1: c}
    revs = {1: r}
    vals = {1: valid0}
    width = 1
    while width * 2 <= k:
        f, rv = fwds[width], revs[width]
        fs, rs = _rol(f, width), _rol(rv, width)
        fwds[width * 2] = (f << (2 * width)) | fs
        revs[width * 2] = rv | (rs << (2 * width))
        if track_valid:
            vv = vals[width]
            vals[width * 2] = vv & _rol(vv, width)
        width *= 2
        widths.append(width)

    fwd = rev = valid = None
    off = 0
    covered = 0
    for width in reversed(widths):
        if k & width:
            f = _rol(fwds[width], off)
            rv = _rol(revs[width], off)
            vv = _rol(vals[width], off) if track_valid else None
            if fwd is None:
                fwd, rev, valid, covered = f, rv, vv, width
            else:
                fwd = (fwd << (2 * width)) | f
                rev = rev | (rv << (2 * covered))
                if track_valid:
                    valid = valid & vv
                covered += width
            off += width
    if skip_valid:
        valid = valid0

    canon = jnp.minimum(fwd, rev)           # < 2^30: signed min is exact
    h = hash32_jax(jax.lax.bitcast_convert_type(canon, jnp.uint32))
    hs = jax.lax.bitcast_convert_type(h, jnp.int32) \
        ^ jnp.int32(-2 ** 31)               # sortable-signed
    lane = jax.lax.broadcasted_iota(jnp.int32, hs.shape, 1)
    ok = lane < m
    if valid is not None:
        ok = (valid > 0) & ok
    hs = jnp.where(ok, hs, jnp.int32(2 ** 31 - 1))

    # sliding min of width w by the same binary decomposition
    mins = {1: hs}
    wws = [1]
    width = 1
    while width * 2 <= w:
        mins[width * 2] = jnp.minimum(mins[width],
                                      _rol(mins[width], width))
        width *= 2
        wws.append(width)
    total = None
    off = 0
    for width in reversed(wws):
        if w & width:
            part = _rol(mins[width], off)
            total = part if total is None else jnp.minimum(total, part)
            off += width
    return total


def _extract_kernel(c_ref, o_ref, *, k: int, w: int, m: int):
    import jax.numpy as jnp
    cc = c_ref[:].astype(jnp.int32)
    o_ref[:] = _doubling_minimizers(jnp.minimum(cc, 3),
                                    (cc < 4).astype(jnp.int32), k, w, m)


def _extract_kernel_nfree(c_ref, o_ref, *, k: int, w: int, m: int):
    """N-free fast path (no N bitmap transferred — ONT basecalls emit pure
    ACGT): skips the per-base validity pyramid entirely."""
    import jax.numpy as jnp
    o_ref[:] = _doubling_minimizers(c_ref[:].astype(jnp.int32), None,
                                    k, w, m)


def _extract_kernel_len(c_ref, n_ref, o_ref, *, k: int, w: int, m: int):
    """N-free + per-read valid length (n_ref, (TB, 1) int32): positions
    whose k-mer crosses the read end are invalid.  4 bytes/read instead of
    the ceil(L/8) N bitmap."""
    import jax
    import jax.numpy as jnp
    cc = c_ref[:].astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, cc.shape, 1)
    valid = (lane + (k - 1) < n_ref[:]).astype(jnp.int32)
    o_ref[:] = _doubling_minimizers(cc, valid, k, w, m, skip_valid=True)


def extract_minima_pallas(packed, nmask, L: int, k: int, w: int,
                          tile: int = 256, interpret: bool = False,
                          lengths=None):
    """Packed-reads in, per-window minimizer hashes out (one fused kernel).

    packed: (B, ceil(L/4)) uint8 2-bit codes (kernels.minimizer.pack_reads).
    nmask: (B, ceil(L/8)) uint8 N-position bitmap, or None when the batch
    is N-free (the normal case — ONT basecalls emit pure ACGT), which
    skips the bitmap transfer AND the per-base validity pyramid.
    lengths: optional (B,) int32 true read lengths (short reads padded to
    L); 4 bytes/read instead of the bitmap.  nmask wins if both given.
    Returns (hmin (B, nwin) uint32, vmin (B, nwin) bool), nwin = (L-k+1)//w,
    bit-identical to read_minimizers_jax(unpack_reads_jax(...), want_pos=
    False) with pad-with-4 beyond `lengths`.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = packed.shape[0]
    m = L - k + 1
    nwin = m // w
    # scoped VMEM holds ~14 live (tb, Lp) int32 intermediates (pyramid +
    # window-min stages); cap the row tile so tb*Lp stays at the proven
    # 256x512 footprint — long accumulated prefixes (the chunk engine's
    # max_len) otherwise stack-OOM the 16 MB scoped-vmem limit
    Lp_est = -(-L // _LANE) * _LANE
    cap = max(8, (256 * 512) // Lp_est)
    cap = 1 << (cap.bit_length() - 1)          # power of two
    tb = min(tile, B, cap)
    while B % tb:
        tb //= 2
    assert tb >= 1

    if nmask is not None:
        Lp = -(-L // _LANE) * _LANE
        # XLA prologue: unpack 2-bit codes + N bitmap into (B, Lp) uint8
        # codes, padding beyond L with 4 (=N).  One cheap fused pass; the
        # pyramid and hash stay in VMEM inside the kernel.
        shifts = jnp.arange(4, dtype=jnp.uint8) * 2
        c = ((packed[:, :, None] >> shifts[None, None, :]) & 3) \
            .reshape(B, -1)
        bit = jnp.arange(8, dtype=jnp.uint8)
        nm = ((nmask[:, :, None] >> bit[None, None, :]) & 1).reshape(B, -1)
        n4 = c.shape[1]
        if n4 < Lp:
            c = jnp.pad(c, ((0, 0), (0, Lp - n4)), constant_values=4)
        else:
            c = c[:, :Lp]
        nm = nm[:, :L]
        if L < Lp:
            nm = jnp.pad(nm, ((0, 0), (0, Lp - L)), constant_values=1)
        codes = jnp.where(nm == 1, jnp.uint8(4), c.astype(jnp.uint8))
        kern = functools.partial(_extract_kernel, k=k, w=w, m=m)
        args = (codes,)
        in_specs = [pl.BlockSpec((tb, Lp), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
    else:
        # N-free: only the packed bytes (and optionally 4-byte lengths)
        # cross host->device; the unpack to uint8 codes is a device-side
        # XLA pass (pad value is irrelevant — masked by m / lengths)
        Lp = -(-L // _LANE) * _LANE
        shifts = jnp.arange(4, dtype=jnp.uint8) * 2
        c = ((packed[:, :, None] >> shifts[None, None, :]) & 3) \
            .reshape(B, -1)
        n4 = c.shape[1]
        codes = (jnp.pad(c, ((0, 0), (0, Lp - n4))) if n4 < Lp
                 else c[:, :Lp])
        if lengths is None:
            kern = functools.partial(_extract_kernel_nfree, k=k, w=w, m=m)
            args = (codes,)
            in_specs = [pl.BlockSpec((tb, Lp), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)]
        else:
            kern = functools.partial(_extract_kernel_len, k=k, w=w, m=m)
            args = (codes, lengths.astype(jnp.int32).reshape(B, 1))
            in_specs = [pl.BlockSpec((tb, Lp), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((tb, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)]

    s = pl.pallas_call(
        kern,
        grid=(B // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, Lp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Lp), jnp.int32),
        interpret=interpret,
    )(*args)
    # undo the sortable-signed transform (see _doubling_minimizers)
    hmin = jax.lax.bitcast_convert_type(
        s[:, :nwin * w:w] ^ jnp.int32(-2 ** 31), jnp.uint32)
    return hmin, hmin != jnp.uint32(0xFFFFFFFF)
