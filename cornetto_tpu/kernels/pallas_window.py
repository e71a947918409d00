"""Pallas single-pass sliding-window sum.

The XLA doubling form (kernels.window_sum.sliding_sum_i32) materializes
~log2(W) shifted copies in HBM; this kernel reads each input element once:
the grid walks CHUNK-wide tiles, each instance DMAs its tile plus a
W-element halo from HBM into VMEM scratch, runs the same binary-
decomposition doubling entirely in VMEM, and writes one output tile.
Traffic = 1 read + 1 write per element.

Correctness contract matches sliding_sum_i32: out[i] = sum(x[i:i+W]) with
zero padding past the end.
"""



def _doubling_body(x, window: int, chunk: int):
    """Doubling over a VMEM-resident (chunk+window,) vector -> (chunk,)
    sliding sums.  cur invariant: cur[i] = sum(x[i:i+width])."""
    total = None
    offset = 0
    cur = x
    width = 1
    rem = window
    while rem:
        if rem & 1:
            part = cur[offset:offset + chunk]
            total = part if total is None else total + part
            offset += width
        rem >>= 1
        if rem:
            n = cur.shape[0] - width
            cur = cur[:n] + cur[width:n + width]
            width <<= 1
    return total


def sliding_window_sum_pallas(x, window: int, chunk: int = 65536,
                              interpret: bool = False):
    """x: (N,) int32, N % chunk == 0.  Returns (N,) int32 sliding sums of
    `window` with zero padding past the end."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_in = x.shape[0]
    # pad to a chunk multiple (zeros keep the sliding-sum contract)
    n = -(-n_in // chunk) * chunk
    # DMA slice widths must be 128-lane aligned; round the halo up
    halo = -(-window // 128) * 128
    xp = jnp.concatenate(
        [x, jnp.zeros((n - n_in + halo,), dtype=x.dtype)])
    xp = xp.reshape(1, n + halo)

    def kernel(x_hbm, o_ref, scratch, sem):
        j = pl.program_id(0)
        dma = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(j * chunk, chunk + halo)], scratch, sem)
        dma.start()
        dma.wait()
        o_ref[0, :] = _doubling_body(scratch[0, :chunk + window],
                                     window, chunk)

    out = pl.pallas_call(
        kernel,
        grid=(n // chunk,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
        out_specs=pl.BlockSpec((1, chunk), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((1, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, chunk + halo), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp)
    return out[0, :n_in]
