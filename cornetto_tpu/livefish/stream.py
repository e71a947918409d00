"""Streaming read pipeline: host-side producer threads feeding fixed-shape
device batches — the moral successor of the reference's batch work pool
(reference: src/thread.c:48-156 work-stealing batch loop; here the "work"
is parse+pack on CPU overlapped with decide() on device, double-buffered
through a bounded queue)."""

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

from cornetto_tpu.io.fasta import read_fastx
from cornetto_tpu.kernels.minimizer import encode_seq


@dataclass
class ReadBatch:
    ids: List[str]
    codes: np.ndarray   # (B, L) uint8, padded with 4 (N)
    count: int          # valid rows
    lengths: np.ndarray = None   # (B,) int32 true read lengths


def batches_from_fastq(path: str, batch: int, read_len: int
                       ) -> Iterator[ReadBatch]:
    """Pack the first `read_len` bases of each read (the adaptive-sampling
    chunk) into fixed (batch, read_len) blocks."""
    ids: List[str] = []
    codes = np.full((batch, read_len), 4, dtype=np.uint8)
    lens = np.zeros(batch, dtype=np.int32)
    n = 0
    for rec in read_fastx(path):
        c = encode_seq(rec.seq[:read_len])
        codes[n, :len(c)] = c
        lens[n] = len(c)
        ids.append(rec.name)
        n += 1
        if n == batch:
            yield ReadBatch(ids, codes, n, lens)
            ids = []
            codes = np.full((batch, read_len), 4, dtype=np.uint8)
            lens = np.zeros(batch, dtype=np.int32)
            n = 0
    if n:
        yield ReadBatch(ids, codes, n, lens)


class Prefetcher:
    """Producer thread + bounded queue so host packing overlaps device
    compute."""

    _DONE = object()

    def __init__(self, it: Iterator[ReadBatch], depth: int = 4):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(target=self._fill, args=(it,),
                                        daemon=True)
        self._err: Optional[BaseException] = None
        self._thread.start()

    def _fill(self, it):
        try:
            for b in it:
                self._q.put(b)
        except BaseException as e:  # propagate to consumer
            self._err = e
        finally:
            self._q.put(self._DONE)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            yield item


def stream_decisions(engine, fastq_path: str, batch: int = 4096,
                     read_len: int = 450, out=None) -> Tuple[int, int]:
    """Run the decision engine over a FASTQ, writing
    `read_id\tdecision\tcontig\tpos\tnhits` rows.  Returns
    (n_reads, n_accepted)."""
    import sys
    from cornetto_tpu.kernels.minimizer import pack_reads
    out = out or sys.stdout
    total = accepted = 0
    use_packed = hasattr(engine, "decide_packed")
    pending = None  # (ReadBatch, device result) for pipelining
    for rb in Prefetcher(batches_from_fastq(fastq_path, batch, read_len)):
        if use_packed:
            packed, nmask = pack_reads(rb.codes)
            # the N bitmap only needs to cross host->device when a read
            # has an interior N (rare: basecallers emit pure ACGT); pad-
            # to-batch tails are covered by per-read lengths (4 B/read)
            if rb.lengths is not None and not _has_interior_n(rb):
                res = engine.decide_packed(packed, None, read_len,
                                           lengths=rb.lengths)
            else:
                res = engine.decide_packed(packed, nmask, read_len)
        else:
            res = engine.decide(rb.codes)
        if pending is not None:
            total, accepted = _drain(pending[0], pending[1], out,
                                     total, accepted, engine)
        pending = (rb, res)
    if pending is not None:
        total, accepted = _drain(pending[0], pending[1], out,
                                 total, accepted, engine)
    return total, accepted


def _has_interior_n(rb: ReadBatch) -> bool:
    pos = np.arange(rb.codes.shape[1], dtype=np.int32)
    within = pos[None, :] < rb.lengths[:, None]
    return bool(np.any((rb.codes >= 4) & within))


def _drain(rb: ReadBatch, res, out, total, accepted, engine):
    d, best, est, nhits = (np.asarray(x) for x in res)
    names = getattr(engine, "contig_names", None)
    for i in range(rb.count):
        ctg = (names[best[i]] if names is not None else str(int(best[i])))
        out.write("%s\t%s\t%s\t%d\t%d\n"
                  % (rb.ids[i],
                     "proceed" if d[i] else "unblock",
                     ctg if nhits[i] > 0 else ".",
                     int(est[i]), int(nhits[i])))
        total += 1
        accepted += int(d[i])
    return total, accepted
