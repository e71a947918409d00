#!/usr/bin/env python3
"""One-off: decompose the decision-step time on the real chip.

Times (all with device-resident inputs, np.asarray readback per CLAUDE.md):
  - rpc: per-call overhead of a trivial jitted op through the tunnel
  - extract_pallas / extract_xla: fused kernel vs XLA extraction
  - lookup: fingerprinted row-gather + votes tail
  - full: decision_core_packed end to end (device-resident)
  - upload: host->device transfer of one packed batch
"""
import time

import numpy as np


def timeit(fn, iters=20):
    fn()  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    np.asarray(r if not isinstance(r, tuple) else r[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    import functools
    import jax
    import jax.numpy as jnp
    from bench import build_problem
    from cornetto_tpu.kernels.minimizer import (pack_reads,
                                                read_minimizers_jax,
                                                unpack_reads_jax)
    from cornetto_tpu.kernels.pallas_extract import extract_minima_pallas
    from cornetto_tpu.livefish.decide import (_decide_from_minima,
                                              decision_core_packed)

    batch = 16384
    idx, panel, reads = build_problem(batch=batch)
    packed, nmask = pack_reads(reads)
    L = reads.shape[1]
    print("btable:", idx.btable.shape, "shift:", idx.bucket_shift,
          "dropped:", idx.dropped_frac, flush=True)

    dp = jax.device_put(packed)
    dn = jax.device_put(nmask)
    dt = jax.device_put(idx.btable[0])
    dpanel = jax.device_put(panel)
    np.asarray(dp); np.asarray(dt)

    trivial = jax.jit(lambda x: x + 1)
    print("rpc_ms %.2f" % timeit(lambda: trivial(dn)), flush=True)

    ext_p = jax.jit(functools.partial(extract_minima_pallas, L=L,
                                      k=idx.k, w=idx.w))
    print("extract_pallas_ms %.2f" % timeit(lambda: ext_p(dp, dn)),
          flush=True)

    def _xla(p, n):
        r = unpack_reads_jax(p, n, L)
        _, h, v = read_minimizers_jax(r, k=idx.k, w=idx.w, want_pos=False)
        return h, v
    ext_x = jax.jit(_xla)
    print("extract_xla_ms %.2f" % timeit(lambda: ext_x(dp, dn)), flush=True)

    h, v = ext_p(dp, dn)
    h = jax.device_put(np.asarray(h)); v = jax.device_put(np.asarray(v))
    tail = jax.jit(functools.partial(_decide_from_minima, min_hits=3,
                                     bin_size=1000,
                                     bucket_shift=idx.bucket_shift))
    print("lookup_votes_ms %.2f" % timeit(lambda: tail(dt, h, v, dpanel)),
          flush=True)

    full = jax.jit(functools.partial(decision_core_packed, L=L, k=idx.k,
                                     w=idx.w, min_hits=3, bin_size=1000,
                                     bucket_shift=idx.bucket_shift,
                                     use_pallas=True))
    print("full_device_ms %.2f" % timeit(
        lambda: full(dt, dp, dn, dpanel)), flush=True)

    t0 = time.perf_counter()
    for _ in range(10):
        x = jax.device_put(packed)
    np.asarray(x)
    print("upload_ms %.2f" % ((time.perf_counter() - t0) / 10 * 1e3),
          flush=True)

    def full_with_upload():
        return full(dt, jnp.asarray(packed), jnp.asarray(nmask), dpanel)
    print("full_upload_ms %.2f" % timeit(full_with_upload), flush=True)


if __name__ == "__main__":
    main()
