"""Real-time adaptive-sampling decision engine.

The new capability on top of the reference toolkit (SURVEY.md §0: the
reference delegates live decisions to readfish — docs/protocol.md:137-161).
Design (TPU-first, SPMD over a ("dp", "ep") mesh):

- read chunks are data-parallel over ``dp``;
- the minimizer index is hash-range sharded over ``ep`` (livefish.index);
- each device extracts minimizers from its read shard (VPU elementwise
  kernel), looks them up in its local index shard (one searchsorted),
  and contributes per-(read, contig) hit votes;
- votes and position estimates are merged with ``psum`` over ``ep`` (rides
  ICI), decisions (accept / reject-from-boring-region) are emitted per read.

Everything is static-shape; one jit compile per (batch, read-len) bucket.
"""

import functools
from dataclasses import dataclass

import numpy as np

from cornetto_tpu.kernels.minimizer import read_minimizers_jax
from cornetto_tpu.livefish.index import MinimizerIndex


@dataclass
class DecisionParams:
    min_hits: int = 3
    bin_size: int = 1000


def pack_table(bkeys, bvals):
    """(2^B, K) uint32 keys + (2^B, K, 2) int32 vals -> one (2^B, 3K)
    int32 row table [keys | contigs | positions] so a lookup is a single
    row-gather."""
    n_buckets, K = bkeys.shape
    return np.concatenate(
        [bkeys.view(np.int32), bvals[:, :, 0], bvals[:, :, 1]],
        axis=1)


def _lookup_votes(btable, bucket_shift, q_hash, q_valid, n_contigs):
    """Local-shard lookup against the packed bucketed table: exactly ONE
    row-gather per query batch — the TPU-friendly alternative to binary
    search, whose ~20 dependent gather rounds dominate runtime.

    btable: (2^B, 3K) int32 rows of [keys | contigs | positions].
    Returns (votes (b, C) int32, hit (b, M) bool, hit_contig (b, M) int32,
    hit_refpos (b, M) int32).
    """
    import jax.numpy as jnp
    b, M = q_hash.shape
    n_buckets = btable.shape[0]
    K = btable.shape[1] // 3
    import jax
    q = q_hash.ravel()
    bucket = ((q >> jnp.uint32(bucket_shift))
              & jnp.uint32(n_buckets - 1)).astype(jnp.int32)
    row = jnp.take(btable, bucket, axis=0)                    # (Q, 3K)
    cand = row[:, :K]
    q_i32 = jax.lax.bitcast_convert_type(q, jnp.int32)
    eq = (cand == q_i32[:, None]) & q_valid.ravel()[:, None]
    found = jnp.any(eq, axis=1)
    j = jnp.argmax(eq, axis=1).astype(jnp.int32)
    contig = jnp.take_along_axis(row[:, K:2 * K], j[:, None], axis=1)[:, 0]
    refpos = jnp.take_along_axis(row[:, 2 * K:], j[:, None], axis=1)[:, 0]
    contig = jnp.where(found, contig, 0)
    refpos = jnp.where(found, refpos, 0)
    found = found.reshape(b, M)
    contig = contig.reshape(b, M)
    refpos = refpos.reshape(b, M)
    if n_contigs <= 64:
        # dense one-hot reduction beats scatter-add for small contig counts
        oh = (contig[:, :, None]
              == jnp.arange(n_contigs, dtype=jnp.int32)[None, None, :])
        votes = jnp.sum(oh & found[:, :, None], axis=1, dtype=jnp.int32)
    else:
        rows = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None],
                                (b, M))
        votes = jnp.zeros((b, n_contigs), dtype=jnp.int32)
        votes = votes.at[rows.ravel(), contig.ravel()].add(
            found.ravel().astype(jnp.int32))
    return votes, found, contig, refpos


def decision_core(btable, reads, panel_mask,
                  k: int, w: int, min_hits: int, bin_size: int,
                  bucket_shift: int, ep_axis: str = None):
    """Single-device (or per-shard, when ep_axis is set) decision step.

    btable: packed (2^B, 3K) int32 lookup rows (see pack_table).
    reads: (b, L) uint8 codes.  Returns (decision (b,) int8 — 1 accept /
    0 reject, best_contig (b,) int32, est_pos (b,) int32, nhits (b,) int32).
    """
    import jax
    import jax.numpy as jnp
    n_contigs = panel_mask.shape[0]
    pos, h, valid = read_minimizers_jax(reads, k=k, w=w, want_pos=False)
    votes, found, contig, refpos = _lookup_votes(
        btable, bucket_shift, h, valid, n_contigs)
    if ep_axis is not None:
        votes = jax.lax.psum(votes, ep_axis)
    best = jnp.argmax(votes, axis=1).astype(jnp.int32)
    nhits = jnp.take_along_axis(votes, best[:, None], axis=1)[:, 0]
    hob = found & (contig == best[:, None])
    numer = jnp.sum(jnp.where(hob, refpos, 0), axis=1)
    denom = jnp.sum(hob.astype(jnp.int32), axis=1)
    if ep_axis is not None:
        numer = jax.lax.psum(numer, ep_axis)
        denom = jax.lax.psum(denom, ep_axis)
    est = numer // jnp.maximum(denom, 1)
    mapped = nhits >= min_hits
    est_bin = jnp.clip(est // bin_size, 0, panel_mask.shape[1] - 1)
    in_panel = panel_mask[best, est_bin]
    # adaptive-sampling policy: reject (unblock) reads mapping into the
    # boring (already-resolved) panel; keep sequencing everything else
    reject = mapped & in_panel
    decision = (~reject).astype(jnp.int8)
    return decision, best, est, nhits


class SingleChipEngine:
    """jitted single-device decision engine over a host-resident index."""

    def __init__(self, index: MinimizerIndex, panel_mask: np.ndarray,
                 params: DecisionParams = DecisionParams()):
        import jax
        import jax.numpy as jnp
        assert index.n_shards == 1
        self._btable = jnp.asarray(pack_table(index.bkeys[0],
                                              index.bvals[0]))
        self._panel = jnp.asarray(panel_mask)
        self._fn = jax.jit(functools.partial(
            decision_core, k=index.k, w=index.w,
            min_hits=params.min_hits, bin_size=params.bin_size,
            bucket_shift=index.bucket_shift))

    def decide(self, reads: np.ndarray):
        import jax.numpy as jnp
        return self._fn(self._btable, jnp.asarray(reads), self._panel)

    def decide_packed(self, packed: np.ndarray, nmask: np.ndarray, L: int):
        """2-bit-packed input path: ~2.6x less host->device traffic
        (kernels.minimizer.pack_reads); unpacks on device."""
        import jax
        import jax.numpy as jnp
        from cornetto_tpu.kernels.minimizer import unpack_reads_jax
        if not hasattr(self, "_pfn"):
            core = self._fn

            def packed_fn(btable, packed, nmask, panel):
                reads = unpack_reads_jax(packed, nmask, L)
                return core.__wrapped__(btable, reads, panel)
            self._pfn = jax.jit(packed_fn)
        return self._pfn(self._btable, jnp.asarray(packed),
                         jnp.asarray(nmask), self._panel)


def make_sharded_engine(mesh, index: MinimizerIndex, panel_mask: np.ndarray,
                        params: DecisionParams = DecisionParams()):
    """shard_map'd decision step over a ("dp", "ep") mesh.

    The returned callable takes reads (B, L) uint8 (B divisible by dp size)
    and returns decisions (B,) int8.  Index tables are sharded over ep,
    reads over dp, panel replicated; vote merge is a psum over ep.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    ep = mesh.shape["ep"]
    assert index.n_shards == ep, (index.n_shards, ep)

    def local_step(btable, reads, panel):
        d, b, e, n = decision_core(btable[0], reads, panel,
                                   k=index.k, w=index.w,
                                   min_hits=params.min_hits,
                                   bin_size=params.bin_size,
                                   bucket_shift=index.bucket_shift,
                                   ep_axis="ep")
        return d, b, e, n

    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("ep", None, None), P("dp", None), P(None, None)),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        check_vma=False)
    jfn = jax.jit(fn)

    btable = jax.device_put(
        np.stack([pack_table(index.bkeys[s], index.bvals[s])
                  for s in range(ep)]),
        NamedSharding(mesh, P("ep", None, None)))
    panel = jax.device_put(np.asarray(panel_mask),
                           NamedSharding(mesh, P(None, None)))

    def decide(reads):
        reads = jax.device_put(np.asarray(reads),
                               NamedSharding(mesh, P("dp", None)))
        return jfn(btable, reads, panel)

    return decide
