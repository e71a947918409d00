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


def _lookup_votes(table_h, table_c, table_p, q_hash, q_valid, n_contigs):
    """Local-shard lookup: returns (votes (b, C) int32, hit (b, M) bool,
    hit_contig (b, M) int32, hit_refpos (b, M) int32)."""
    import jax.numpy as jnp
    b, M = q_hash.shape
    idx = jnp.searchsorted(table_h, q_hash.ravel(), side="left")
    idx = jnp.minimum(idx, table_h.shape[0] - 1).astype(jnp.int32)
    found = (jnp.take(table_h, idx) == q_hash.ravel()) & q_valid.ravel()
    contig = jnp.where(found, jnp.take(table_c, idx), 0)
    refpos = jnp.where(found, jnp.take(table_p, idx), 0)
    found = found.reshape(b, M)
    contig = contig.reshape(b, M)
    refpos = refpos.reshape(b, M)
    rows = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, M))
    votes = jnp.zeros((b, n_contigs), dtype=jnp.int32)
    votes = votes.at[rows.ravel(), contig.ravel()].add(
        found.ravel().astype(jnp.int32))
    return votes, found, contig, refpos


def decision_core(table_h, table_c, table_p, reads, panel_mask,
                  k: int, w: int, min_hits: int, bin_size: int,
                  ep_axis: str = None):
    """Single-device (or per-shard, when ep_axis is set) decision step.

    reads: (b, L) uint8 codes.  Returns (decision (b,) int8 — 1 accept /
    0 reject, best_contig (b,) int32, est_pos (b,) int32, nhits (b,) int32).
    """
    import jax
    import jax.numpy as jnp
    n_contigs = panel_mask.shape[0]
    pos, h, valid = read_minimizers_jax(reads, k=k, w=w)
    votes, found, contig, refpos = _lookup_votes(
        table_h, table_c, table_p, h, valid, n_contigs)
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
        self._th = jnp.asarray(index.hashes[0])
        self._tc = jnp.asarray(index.contigs[0])
        self._tp = jnp.asarray(index.positions[0])
        self._panel = jnp.asarray(panel_mask)
        self._fn = jax.jit(functools.partial(
            decision_core, k=index.k, w=index.w,
            min_hits=params.min_hits, bin_size=params.bin_size))

    def decide(self, reads: np.ndarray):
        import jax.numpy as jnp
        return self._fn(self._th, self._tc, self._tp,
                        jnp.asarray(reads), self._panel)


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

    def local_step(th, tc, tp, reads, panel):
        d, b, e, n = decision_core(th[0], tc[0], tp[0], reads, panel,
                                   k=index.k, w=index.w,
                                   min_hits=params.min_hits,
                                   bin_size=params.bin_size, ep_axis="ep")
        return d, b, e, n

    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(P("ep", None), P("ep", None), P("ep", None),
                  P("dp", None), P(None, None)),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        check_vma=False)
    jfn = jax.jit(fn)

    th = jax.device_put(index.hashes,
                        NamedSharding(mesh, P("ep", None)))
    tc = jax.device_put(index.contigs,
                        NamedSharding(mesh, P("ep", None)))
    tp = jax.device_put(index.positions,
                        NamedSharding(mesh, P("ep", None)))
    panel = jax.device_put(np.asarray(panel_mask),
                           NamedSharding(mesh, P(None, None)))

    def decide(reads):
        reads = jax.device_put(np.asarray(reads),
                               NamedSharding(mesh, P("dp", None)))
        return jfn(th, tc, tp, reads, panel)

    return decide
