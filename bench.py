#!/usr/bin/env python3
"""Headline benchmark: adaptive-sampling decision throughput (reads/s) on
one TPU chip via the livefish engine.

Prints ONE JSON line:
  {"metric": "adaptive_sampling_decisions", "value": <reads/s>,
   "unit": "reads/s/chip", "vs_baseline": <value / 62500>}

Baseline normalisation: the BASELINE.json north-star target is >= 1M reads/s
on a v5e-16 (16 chips), i.e. a 62,500 reads/s/chip fair share; vs_baseline
is measured throughput against that per-chip share (>1.0 beats the target
share).  The reference itself publishes no benchmark numbers (BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def build_problem(genome_mb: float = 8.0, batch: int = 16384,
                  read_len: int = 450):
    from cornetto_tpu.livefish.index import build_index, build_panel_mask
    rng = np.random.default_rng(12345)
    bases = np.array(list("ACGT"))
    n = int(genome_mb * 1e6)
    half = n // 2
    genome = {
        "ctg1": "".join(bases[rng.integers(0, 4, half)]),
        "ctg2": "".join(bases[rng.integers(0, 4, n - half)]),
    }
    idx = build_index(genome, n_shards=1)
    panel = build_panel_mask(idx, [("ctg1", half // 4, half // 2),
                                   ("ctg2", 0, (n - half) // 3)])
    # reads: half sampled from the genome, half random
    reads = np.empty((batch, read_len), dtype=np.uint8)
    from cornetto_tpu.kernels.minimizer import encode_seq
    g1 = genome["ctg1"]
    for i in range(batch // 2):
        s = int(rng.integers(0, half - read_len))
        reads[i] = encode_seq(g1[s:s + read_len])
    reads[batch // 2:] = rng.integers(
        0, 4, size=(batch - batch // 2, read_len)).astype(np.uint8)
    return idx, panel, reads


def main() -> int:
    import jax
    from cornetto_tpu.livefish.decide import DecisionParams, SingleChipEngine

    batch = 16384
    idx, panel, reads = build_problem(batch=batch)
    eng = SingleChipEngine(idx, panel, DecisionParams())

    from cornetto_tpu.kernels.minimizer import pack_reads
    read_len = reads.shape[1]
    packed, _ = pack_reads(reads)
    # N-free batch (basecallers emit pure ACGT): the 2-bit packed codes are
    # the ONLY per-read host->device traffic — 113 B/read at L=450

    # warmup / compile (np.asarray forces a host readback — on the axon
    # tunnel block_until_ready alone does not actually synchronise)
    d = eng.decide_packed(packed, None, read_len)
    np.asarray(d[0])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        d = eng.decide_packed(packed, None, read_len)
    np.asarray(d[0])
    dt = time.perf_counter() - t0

    reads_per_s = batch * iters / dt
    result = {
        "metric": "adaptive_sampling_decisions",
        "value": round(reads_per_s, 1),
        "unit": "reads/s/chip",
        "vs_baseline": round(reads_per_s / 62500.0, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
