#!/usr/bin/env python3
"""Probe: e2e stream throughput with the round-3 pipeline (drain thread +
native TSV formatter + lengths elision), at two batch sizes."""
import os
import sys
import time

import numpy as np


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import tempfile
    from cornetto_tpu.livefish.index import build_index, build_panel_mask
    from cornetto_tpu.livefish.decide import SingleChipEngine
    from cornetto_tpu.livefish.stream import stream_decisions
    from cornetto_tpu.native.fastq_pack import iter_packed_batches

    rng = np.random.default_rng(99)
    bases = np.array(list("ACGT"))
    n = 8_000_000
    genome = {"c0": "".join(bases[rng.integers(0, 4, n)])}
    idx = build_index(genome, n_shards=1)
    panel = build_panel_mask(idx, [("c0", 0, n // 3)])

    NR, LR = 196_608, 450
    g0 = genome["c0"]
    fq = os.path.join(tempfile.gettempdir(), "bench_stream_reads_%d.fq" % NR)
    if not os.path.exists(fq):
        with open(fq, "w") as f:
            qual = "I" * LR
            for i in range(NR):
                if i % 2 == 0:
                    s = int(rng.integers(0, len(g0) - LR))
                    seq = g0[s:s + LR]
                else:
                    seq = "".join(bases[rng.integers(0, 4, LR)])
                f.write("@read_%d\n%s\n+\n%s\n" % (i, seq, qual))
    for pb in iter_packed_batches(fq, 16384, LR):
        pass

    eng = SingleChipEngine(idx, panel)
    eng.contig_names = idx.contig_names

    class _Sink:
        def write(self, s):
            pass

    sink = _Sink()
    for batch in (8192, 16384, 32768):
        stream_decisions(eng, fq, batch=batch, read_len=LR, out=sink)
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            tot, _a = stream_decisions(eng, fq, batch=batch, read_len=LR,
                                       out=sink)
            best = max(best, tot / (time.perf_counter() - t0))
        print("batch=%d e2e %.0f reads/s" % (batch, best), flush=True)


if __name__ == "__main__":
    sys.exit(main())
