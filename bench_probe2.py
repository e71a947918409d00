#!/usr/bin/env python3
"""Gather-layout probe: the one row-gather is 2.5 ms of the 3.7 ms
device step.  Try row sizes / layouts for 704k random row-gathers."""
import time

import numpy as np


def slope_ms(fn, n1=10, n2=40):
    fn()

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        np.asarray(r)
        return time.perf_counter() - t0
    run(3)
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    Q = 16384 * 43

    for name, nrows, rowlen in [
        ("32B_1M", 1 << 20, 8),
        ("16B_2M", 1 << 21, 4),
        ("16B_1M", 1 << 20, 4),
        ("8B_4M", 1 << 22, 2),
        ("32B_256k", 1 << 18, 8),
    ]:
        table = jnp.asarray(
            rng.integers(-2**31, 2**31, size=(nrows, rowlen),
                         dtype=np.int64).astype(np.int32))
        idxs = jnp.asarray(
            rng.integers(0, nrows, size=Q, dtype=np.int64).astype(np.int32))
        np.asarray(table[:1]); np.asarray(idxs[:1])

        @jax.jit
        def g(t, i):
            return jnp.sum(jnp.take(t, i, axis=0))
        print("%s gather_ms %.2f" % (name, slope_ms(lambda: g(table, idxs))),
              flush=True)

    # transposed: 8 separate 4B gathers from (8, N) — column layout
    tableT = jnp.asarray(rng.integers(-2**31, 2**31, size=(8, 1 << 20),
                                      dtype=np.int64).astype(np.int32))
    idxs = jnp.asarray(rng.integers(0, 1 << 20, size=Q,
                                    dtype=np.int64).astype(np.int32))
    np.asarray(tableT[:1])

    @jax.jit
    def gt(t, i):
        s = jnp.int32(0)
        for r in range(8):
            s = s + jnp.sum(jnp.take(t[r], i))
        return s
    print("colT_8x4B gather_ms %.2f" % slope_ms(lambda: gt(tableT, idxs)),
          flush=True)

    # single flat 4B gather (1M) — baseline granularity
    flat = jnp.asarray(rng.integers(-2**31, 2**31, size=(1 << 20,),
                                    dtype=np.int64).astype(np.int32))

    @jax.jit
    def gf(t, i):
        return jnp.sum(jnp.take(t, i))
    print("flat_1x4B gather_ms %.2f" % slope_ms(lambda: gf(flat, idxs)),
          flush=True)

    # sorted indices (locality): does ordering matter?
    sidx = jnp.asarray(np.sort(np.asarray(idxs)))
    table = jnp.asarray(rng.integers(-2**31, 2**31, size=(1 << 20, 8),
                                     dtype=np.int64).astype(np.int32))

    @jax.jit
    def gs(t, i):
        return jnp.sum(jnp.take(t, i, axis=0))
    print("32B_1M_sorted gather_ms %.2f" % slope_ms(lambda: gs(table, sidx)),
          flush=True)


if __name__ == "__main__":
    main()
