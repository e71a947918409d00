"""Contig-sharded window scanning with halo exchange — the framework's
sequence-parallel (SP) axis.

SURVEY.md §5.7: the reference's longest sequence is a 242-Mb contig scanned
serially; here the depth array is sharded across devices and each shard
needs only a (window_size)-element halo from its right neighbour, fetched
with one `ppermute` over the ``sp`` axis, to compute its sliding-window
sums independently.
"""

import numpy as np

from cornetto_tpu.kernels.window_sum import sliding_sum_i32


def make_sharded_sliding_sum(mesh, window_size: int):
    """Returns fn(x_padded (Ltot,) int32) -> (Ltot,) int32 sliding sums of
    `window_size`, where x_padded is sharded over the mesh's "sp" axis and
    its trailing `window_size` elements (within the last shard) are zeros.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_sp = mesh.shape["sp"]

    def local(x):
        # send my leading window_size elements to my LEFT neighbour; the
        # last shard's incoming halo (wrapped from shard 0) is masked to
        # zero — the caller guarantees the global array is zero-padded.
        halo = x[:window_size]
        if n_sp > 1:
            perm = [(i, (i - 1) % n_sp) for i in range(n_sp)]
            recv = jax.lax.ppermute(halo, "sp", perm)
        else:
            recv = jnp.zeros_like(halo)
        idx = jax.lax.axis_index("sp")
        recv = jnp.where(idx == n_sp - 1, jnp.zeros_like(recv), recv)
        ext = jnp.concatenate([x, recv])
        return sliding_sum_i32(ext, window_size)[:x.shape[0]]

    fn = shard_map(local, mesh=mesh, in_specs=P("sp"), out_specs=P("sp"),
                   check_vma=False)
    return jax.jit(fn)


def sharded_window_stats(mesh, depth: np.ndarray, length: int,
                         window_size: int, window_inc: int):
    """End-to-end sharded window means for one contig: pads/shards the depth
    array over "sp", halo-exchanges, and gathers strided window means.
    Bit-identical to kernels.window_sum.window_stats_numpy."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cornetto_tpu.kernels.window_sum import n_windows

    n_sp = mesh.shape["sp"]
    shard = -(-(length + window_size) // n_sp)
    # a single-neighbour halo covers the window only if shards >= window
    shard = max(shard, window_size)
    shard = -(-shard // 128) * 128
    total = shard * n_sp
    x = np.zeros(total, dtype=np.int32)
    x[:length] = depth[:length]
    xs = jax.device_put(x, NamedSharding(mesh, P("sp")))
    win = np.asarray(make_sharded_sliding_sum(mesh, window_size)(xs))
    nw = n_windows(length, window_size, window_inc)
    st = np.arange(nw, dtype=np.int64) * window_inc
    end = np.minimum(st + window_size, length)
    div = end - st
    means = win[np.minimum(st, total - 1)] // div
    return (st.astype(np.int32), end.astype(np.int32),
            means.astype(np.int32))
