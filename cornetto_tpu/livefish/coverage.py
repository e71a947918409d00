"""Aligner-free coverage estimation from livefish decision hits.

The reference protocol computes its per-base coverage tracks by realigning
every read to the draft with minimap2 and running `samtools depth -aa` /
`-Q20 -aa` (reference: shitflow/create-launch.pbs.sh:61-67) — hours of
CPU work per iteration.  This module estimates the same two tracks as a
by-product of the decisions the engine is already making: every mapped
read scatter-adds its length into a device-resident (contig, bin) tally,
and the tallies convert to bedgraph step functions that the existing
boringbits/create-cornetto pipeline consumes unchanged ("approximate
panel mode").

Approximations (documented contract):
- resolution is `bin_size` (default 1000 bp), not 1 bp: each read's bases
  land in the single bin of its estimated position (two bins for
  repeat-only reads, below);
- the MQ>=20 track's proxy is UNAMBIGUOUS hit strength: reads whose best
  contig collected >= `hq_hits` hits on single-occurrence minimizers
  (hits on multi-occurrence minimizers are excluded — that is exactly
  what MAPQ<20 filtering removes; round-3 counted ambiguous hits, so
  exact-repeat reads passed as high-confidence and the repeat SOURCE
  copy was wrongly rejected, EVAL_ALIGNERFREE r03);
- a read whose hits are ALL ambiguous (wholly inside an exact repeat)
  splits its bases across the repeat's two stored copies (est/est2 from
  livefish.decide) instead of piling onto the first occurrence;
- depth = binned bases / bin_size, so numbers match true mean depth in
  expectation but are smoothed at bin granularity.
"""

from dataclasses import dataclass

import numpy as np


@dataclass
class CoverageParams:
    bin_size: int = 1000
    min_hits: int = 3       # mapped (total-coverage track)
    hq_hits: int = 8        # high-confidence (the MQ>=20 track proxy)


class CoverageTally:
    """Device-resident (2, C, BINS) int32 base tallies [total, hq]."""

    def __init__(self, index, params: CoverageParams = CoverageParams()):
        import jax
        import jax.numpy as jnp
        self.params = params
        self.contig_names = list(index.contig_names)
        self.contig_lens = np.asarray(index.contig_lens, dtype=np.int64)
        C = len(self.contig_names)
        bins = int(-(-int(self.contig_lens.max()) // params.bin_size)) \
            if C else 1
        bins = max(-(-bins // 128) * 128, 128)
        self._tally = jnp.zeros((2, C, bins), dtype=jnp.int32)
        p = params

        def _accum(tally, best, est, est2, nhits, nhits_hq, lengths):
            b1 = jnp.clip(est // p.bin_size, 0, tally.shape[2] - 1)
            b2 = jnp.clip(est2 // p.bin_size, 0, tally.shape[2] - 1)
            mapped = nhits >= p.min_hits
            hq = nhits_hq >= p.hq_hits
            ln = lengths.astype(jnp.int32)
            # repeat-only reads (no unambiguous anchor -> est2 != est)
            # split their bases across both stored copies
            split = mapped & (b2 != b1)
            w1 = jnp.where(mapped, jnp.where(split, ln - ln // 2, ln), 0)
            w2 = jnp.where(split, ln // 2, 0)
            t0 = tally[0].at[best, b1].add(w1).at[best, b2].add(w2)
            t1 = tally[1].at[best, b1].add(jnp.where(hq, ln, 0))
            return jnp.stack([t0, t1])

        self._fn = jax.jit(_accum, donate_argnums=0)

    def update(self, best, est, est2, nhits, nhits_hq, lengths) -> None:
        """Fold one decided batch in (device arrays from the engine plus
        per-read true lengths; rows not in the batch must have nhits 0)."""
        import jax.numpy as jnp
        self._tally = self._fn(self._tally, best, est, est2, nhits,
                               nhits_hq, jnp.asarray(lengths))

    def counts(self) -> np.ndarray:
        return np.asarray(self._tally)

    def write_bedgraphs(self, total_path: str, mq_path: str) -> None:
        """Emit cov-total / cov-mq20 style bedgraphs (1-bp-resolution rows
        are what boringbits expects; we emit bin-sized rows, which the
        bedgraph reader expands identically)."""
        t = self.counts()
        bs = self.params.bin_size
        for track, path in ((t[0], total_path), (t[1], mq_path)):
            with open(path, "w") as out:
                for ci, name in enumerate(self.contig_names):
                    ln = int(self.contig_lens[ci])
                    nb = -(-ln // bs)
                    depth = track[ci, :nb] // bs
                    # run-length encode equal-depth neighbouring bins
                    st = 0
                    for b in range(1, nb + 1):
                        if b == nb or depth[b] != depth[st]:
                            out.write("%s\t%d\t%d\t%d\n"
                                      % (name, st * bs, min(b * bs, ln),
                                         int(depth[st])))
                            st = b


def stream_coverage(engine, tally: CoverageTally, fastq_path: str,
                    batch: int = 4096, read_len: int = 450, out=None):
    """Run streaming decisions over a FASTQ while folding every batch into
    the coverage tally.  Returns (n_reads, n_accepted)."""
    from cornetto_tpu.kernels.minimizer import pack_reads
    from cornetto_tpu.livefish.stream import (Prefetcher,
                                              batches_from_fastq, _drain,
                                              _has_interior_n)
    total = accepted = 0
    pending = None
    for rb in Prefetcher(batches_from_fastq(fastq_path, batch, read_len)):
        packed, nmask = pack_reads(rb.codes)
        if rb.lengths is not None and not _has_interior_n(rb):
            res = engine.decide_packed(packed, None, read_len,
                                       lengths=rb.lengths)
        else:
            res = engine.decide_packed(packed, nmask, read_len)
        d, best, est, nhits, nhits_hq, est2 = res
        lens = rb.lengths if rb.lengths is not None else \
            np.full(rb.codes.shape[0], read_len, np.int32)
        lens = lens.copy()
        lens[rb.count:] = 0
        tally.update(best, est, est2, nhits, nhits_hq, lens)
        if pending is not None and out is not None:
            total, accepted = _drain(pending[0], pending[1], out,
                                     total, accepted, engine)
        elif pending is not None:
            dd = np.asarray(pending[1][0])
            total += pending[0].count
            accepted += int(dd[:pending[0].count].sum())
        pending = (rb, res)
    if pending is not None:
        if out is not None:
            total, accepted = _drain(pending[0], pending[1], out,
                                     total, accepted, engine)
        else:
            dd = np.asarray(pending[1][0])
            total += pending[0].count
            accepted += int(dd[:pending[0].count].sum())
    return total, accepted
