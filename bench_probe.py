#!/usr/bin/env python3
"""Round-3 regression probe v2: slope-based timing (T(n2)-T(n1))/(n2-n1)
cancels the one-off final-readback cost; every probe returns a SCALAR
(sum) so readback size is constant and XLA cannot DCE the work under
test (pallas_call is opaque; sums of gathers keep the gather).
"""
import functools
import time

import numpy as np


def slope_ms(fn, n1=10, n2=40):
    fn()  # compile

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        np.asarray(r)
        return time.perf_counter() - t0
    run(3)  # steady-state
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from bench import build_problem
    from cornetto_tpu.kernels.minimizer import pack_reads
    from cornetto_tpu.kernels.pallas_extract import extract_minima_pallas
    from cornetto_tpu.livefish.decide import (_decide_from_minima,
                                              _lookup_votes,
                                              decision_core_packed)

    batch = 16384
    idx, panel, reads = build_problem(batch=batch)
    packed, _ = pack_reads(reads)
    L = reads.shape[1]

    dp = jax.device_put(packed)
    dt = jax.device_put(idx.btable[0])
    dpanel = jax.device_put(panel)
    np.asarray(dp); np.asarray(dt)

    trivial = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))
    print("rpc_ms %.2f" % slope_ms(lambda: trivial(dpanel)), flush=True)

    ext_raw = jax.jit(functools.partial(extract_minima_pallas, nmask=None,
                                        L=L, k=idx.k, w=idx.w))

    @jax.jit
    def ext_sum(p):
        h, v = extract_minima_pallas(p, None, L, idx.k, idx.w)
        return jnp.sum(h.astype(jnp.int32)) + jnp.sum(v)
    print("extract_nfree_ms %.2f" % slope_ms(lambda: ext_sum(dp)),
          flush=True)

    @jax.jit
    def full_sum(t, p, pm):
        d, b, e, nh, _, _ = decision_core_packed(
            t, p, None, pm, L=L, k=idx.k, w=idx.w, min_hits=3,
            bin_size=1000, bucket_shift=idx.bucket_shift, use_pallas=True)
        return (jnp.sum(d.astype(jnp.int32)) + jnp.sum(b) + jnp.sum(e)
                + jnp.sum(nh))
    print("full_nfree_ms %.2f" % slope_ms(lambda: full_sum(dt, dp, dpanel)),
          flush=True)

    h, v = ext_raw(dp)
    h = jax.device_put(np.asarray(h)); v = jax.device_put(np.asarray(v))
    np.asarray(h)

    @jax.jit
    def tail_sum(t, hh, vv, pm):
        d, b, e, nh, _, _ = _decide_from_minima(t, hh, vv, pm, 3, 1000,
                                          idx.bucket_shift)
        return (jnp.sum(d.astype(jnp.int32)) + jnp.sum(b) + jnp.sum(e)
                + jnp.sum(nh))
    print("tail_ms %.2f" % slope_ms(lambda: tail_sum(dt, h, v, dpanel)),
          flush=True)

    @jax.jit
    def lv_sum(t, hh, vv):
        stats = _lookup_votes(t, idx.bucket_shift, hh, vv, 2)
        return sum(jnp.sum(x) for x in stats)
    print("lookup_votes_ms %.2f" % slope_ms(lambda: lv_sum(dt, h, v)),
          flush=True)

    @jax.jit
    def gather_sum(t, hh):
        n_buckets = t.shape[0]
        q = hh.ravel()
        bucket = ((q >> jnp.uint32(idx.bucket_shift))
                  & jnp.uint32(n_buckets - 1)).astype(jnp.int32)
        return jnp.sum(jnp.take(t, bucket, axis=0))
    print("gather_ms %.2f" % slope_ms(lambda: gather_sum(dt, h)),
          flush=True)

    # upload probe: fresh transfer each iter, tiny compute
    @jax.jit
    def up_sum(p):
        return jnp.sum(p.astype(jnp.int32))
    print("upload_slope_ms %.2f" % slope_ms(
        lambda: up_sum(jnp.asarray(packed)), n1=5, n2=20), flush=True)


if __name__ == "__main__":
    main()
