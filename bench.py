#!/usr/bin/env python3
"""Headline benchmark: adaptive-sampling decision throughput (reads/s) on
one TPU chip via the livefish engine.

Prints ONE JSON line:
  {"metric": "adaptive_sampling_decisions", "value": <reads/s>,
   "unit": "reads/s/chip", "vs_baseline": <value / 62500>, ...diagnostics}

Baseline normalisation: the BASELINE.json north-star target is >= 1M reads/s
on a v5e-16 (16 chips), i.e. a 62,500 reads/s/chip fair share; vs_baseline
is measured throughput against that per-chip share (>1.0 beats the target
share).  The reference itself publishes no benchmark numbers (BASELINE.md).

This benchmark is BOUND BY THE AXON TUNNEL'S HOST->DEVICE BANDWIDTH, not
by device code (round-3 root cause of the r01->r02 "regression"): each
16,384-read batch uploads 1.85 MB of 2-bit packed codes (113 B/read —
the entropy floor for ACGT) over a ~45 MB/s tunnel, while the decision
step itself takes ~3 ms on-chip.

Round-4 postmortem (the 151.6k headline, 2.6x under round 3 and 38% of
its own transfer bound): NOT a code regression — bench_probe3.py re-ran
the exact round-4 loop on a quiet host at 423k reads/s.  The dip matches
CLAUDE.md's documented failure mode (TPU benches on this 2-core box
degrade ~3x under concurrent CPU load; the driver runs bench.py right
after round-end CPU-heavy work).  Round 5 hardens the harness instead of
trusting the schedule: the e2e loop now mirrors the production stream
(ONE fused result array per batch, readbacks on a drain thread — the
probe also showed that dropping a result buffer while its computation is
still queued stalls the tunnel ~37 ms, so results are read back, not
freed-pending), takes best-of-3 slopes, and records a host-load sentinel
(spin_ms) so a contended run is visible in the artifact.
  value                        — slope-timed e2e rate ((T(n2)-T(n1)) /
                                 (n2-n1) cancels warm-up + thread setup)
                                 of the production-shaped pipeline
  device_resident_reads_per_s  — pure chip time via the SAME chained
                                 fori_loop method as BENCH_KERNELS.json's
                                 decision_step_device (ONE canonical
                                 number; the tunnel's ~10 ms/dispatch RPC
                                 is a harness artifact a production host
                                 does not pay)
  upload_MBps                  — slope-timed pipelined tunnel bandwidth
  transfer_bound_value         — max(upload-probe ceiling, the rate the
                                 e2e run itself demonstrated): value <=
                                 ceiling holds in every emitted artifact
                                 by measurement, not by fiat
  spin_ms                      — wall time of a fixed pure-Python spin
                                 (70-150 ms quiet on this box, the
                                 spread is CPU clock scaling); values
                                 well beyond that mean the host was
                                 contended and the e2e number is
                                 untrustworthy
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
    import os

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: first jit through the axon tunnel takes
    # 40-470 s (measured); cached reruns skip it entirely
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

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
    np.asarray(eng.decide_packed_fused(packed, None, read_len))

    # host-load sentinel: a fixed pure-Python spin (70-150 ms on this
    # box when quiet).  The round-4 headline dip was concurrent host
    # load (see module docstring); this pins whether THIS run was clean.
    t0 = time.perf_counter()
    s = 0
    for i in range(2_000_000):
        s += i
    spin_ms = (time.perf_counter() - t0) * 1e3

    # All timings below are SLOPES, (T(n2)-T(n1))/(n2-n1): plain loop
    # timing pays a one-off warm-up + final sync that slope timing
    # cancels (bench_probe.py established the method; this file is the
    # single source BENCH_KERNELS/ROADMAP quote).
    def slope_rate(fn, n1, n2, per_iter_units, reps=2):
        def run(n):
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = fn()
            np.asarray(r)
            return time.perf_counter() - t0
        run(2)   # steady state
        best = None
        for _ in range(reps):
            dt = (run(n2) - run(n1)) / (n2 - n1)
            best = dt if best is None else min(best, dt)
        return per_iter_units / best

    # e2e headline: the PRODUCTION pipeline shape (livefish/stream.py
    # _stream_decisions_native minus parse/format) — fused decide (ONE
    # result array), uploads back-to-back on this thread, every result
    # read back on a drain thread.  Reading results back (instead of
    # dropping them) matters beyond realism: bench_probe3.py measured
    # ~37 ms/iter of tunnel stall when a result buffer is freed while
    # its computation is still queued.
    import queue
    import threading

    def run_pipelined(n):
        dq: "queue.Queue" = queue.Queue(maxsize=4)
        DONE = object()
        acc = []
        err = []

        def drain():
            while True:
                item = dq.get()
                if item is DONE:
                    return
                if err:
                    continue      # keep consuming so the producer unblocks
                try:
                    acc.append(np.asarray(item))   # full (2, B) readback
                except BaseException as e:
                    err.append(e)

        th = threading.Thread(target=drain, daemon=True)
        th.start()
        t0 = time.perf_counter()
        for _ in range(n):
            dq.put(eng.decide_packed_fused(packed, None, read_len))
        dq.put(DONE)
        th.join()
        if err:
            raise err[0]
        return time.perf_counter() - t0

    run_pipelined(3)   # steady state
    best = None
    for _ in range(3):
        dt = (run_pipelined(18) - run_pipelined(6)) / 12
        best = dt if best is None else min(best, dt)
    reads_per_s = batch / best

    # device-resident step (inputs pre-staged on chip): what a production
    # host with PCIe/DMA at GB/s would see.  THE canonical device figure —
    # measured with the SAME chained fori_loop method as
    # BENCH_KERNELS.json decision_step_device (pure chip time; the
    # tunnel's ~10 ms per-dispatch RPC is a harness artifact), so the two
    # artifacts quote one number.
    import functools
    from bench_kernels import chained_time
    from cornetto_tpu.livefish.decide import decision_core_packed
    dp = jax.device_put(packed)
    np.asarray(dp[:1])
    step = functools.partial(
        decision_core_packed, jnp.asarray(idx.btable[0]), nmask=None,
        panel_mask=jnp.asarray(panel), L=read_len, k=idx.k, w=idx.w,
        min_hits=3, bin_size=1000, bucket_shift=idx.bucket_shift,
        use_pallas=jax.default_backend() == "tpu")
    dev_step_s = chained_time(lambda p: step(packed=p)[1], dp, 0x7FFFFFFF)
    dev_reads_per_s = batch / dev_step_s

    # pipelined upload probe: issue the transfer and a trivial consumer;
    # slope timing over many iterations measures the SUSTAINED pipelined
    # bandwidth (the round-3 per-call probe under-measured it and printed
    # a "ceiling" below the measured e2e value)
    up = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))
    np.asarray(up(dp))
    upload_bps = slope_rate(lambda: up(jnp.asarray(packed)), 5, 20,
                            packed.nbytes)

    # transfer-implied ceiling.  The e2e run itself proves the tunnel
    # sustained at least `reads_per_s` worth of bytes, so the honest
    # ceiling is the max of the direct probe and that demonstrated rate:
    # value <= transfer_bound_value holds in every emitted artifact by
    # measurement, not by fiat.
    probe_ceiling = upload_bps / packed.nbytes * batch
    transfer_bound = max(probe_ceiling, reads_per_s)

    result = {
        "metric": "adaptive_sampling_decisions",
        "value": round(reads_per_s, 1),
        "unit": "reads/s/chip",
        "vs_baseline": round(reads_per_s / 62500.0, 3),
        "device_resident_reads_per_s": round(dev_reads_per_s, 1),
        "device_step_ms": round(dev_step_s * 1e3, 3),
        "upload_MBps": round(upload_bps / 1e6, 1),
        "transfer_bound_value": round(transfer_bound, 1),
        "transfer_bound_source": ("upload_probe"
                                  if transfer_bound == probe_ceiling
                                  else "e2e_demonstrated"),
        "spin_ms": round(spin_ms, 1),
        "note": "value tracks the axon tunnel's upload bandwidth "
                "(113 B/read is the 2-bit entropy floor); production-"
                "shaped pipeline (fused decide + drain-thread "
                "readbacks), best-of-3 slopes; spin_ms 70-150 on a "
                "quiet host — see bench.py docstring + ROADMAP.md",
    }
    print(json.dumps(result))
    # checked-in copy so README/ROADMAP prose can be GENERATED from the
    # artifact (gen_perf_table.py) instead of hand-synced — three rounds
    # of manual number drift is enough evidence prose won't stay synced
    # by discipline
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_HEADLINE.json"), "w") as f:
            json.dump(result, f, indent=1)
        # resync the generated README/ROADMAP blocks so a driver-run
        # bench can never leave prose drifted from its own artifact
        import gen_perf_table
        gen_perf_table.main()
    except Exception:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
