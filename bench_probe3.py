#!/usr/bin/env python3
"""Round-5 probe: decompose the r04 headline dip (151.6k reads/s at 38% of
its own transfer bound, while the FULLER e2e stream did 289.9k).

Candidate costs in the r04 loop (bench.py e2e_once), per iteration:
  A. the 1.85 MB packed upload (the honest bound, ~41 ms at 45 MB/s)
  B. per-dispatch RPC latency (~10 ms through the tunnel)
  C. device-buffer deallocation RPCs: the 6-tuple result (+ the input
     buffer) is dropped every iteration; if each free costs a tunnel
     round-trip, that alone is ~60-70 ms/iter
  D. result-count: decide_packed returns SIX arrays; the fused variant
     returns ONE

Variants (all slope-timed (T(15)-T(5))/10 like bench.py):
  r04_loop      — exact round-4 loop: decide_packed(...)[0], tuple freed
  hold_all      — same calls but EVERY result kept (no frees in the
                  timed region): isolates C
  fused         — decide_packed_fused (one result array), freed per iter
  fused_hold    — fused + results kept: C with D minimized
  upload_only   — jnp.asarray(packed) + trivial jit consumer

Writes PROBE_R05.json and prints it.
"""

import json
import time

import numpy as np


def main() -> int:
    import os

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_problem
    from cornetto_tpu.livefish.decide import DecisionParams, SingleChipEngine

    batch = 16384
    idx, panel, reads = build_problem(batch=batch)
    eng = SingleChipEngine(idx, panel, DecisionParams())
    from cornetto_tpu.kernels.minimizer import pack_reads
    read_len = reads.shape[1]
    packed, _ = pack_reads(reads)

    # warm/compile both variants
    np.asarray(eng.decide_packed(packed, None, read_len)[0])
    np.asarray(eng.decide_packed_fused(packed, None, read_len))

    def slope(fn, n1=5, n2=15, reps=2):
        def run(n):
            keep = []
            t0 = time.perf_counter()
            r = None
            for _ in range(n):
                r = fn(keep)
            np.asarray(r if not isinstance(r, tuple) else r[0])
            dt = time.perf_counter() - t0
            del keep
            return dt
        run(2)
        best = None
        for _ in range(reps):
            dt = (run(n2) - run(n1)) / (n2 - n1)
            best = dt if best is None else min(best, dt)
        return best

    out = {}

    def put(name, dt):
        out[name] = {"ms_per_iter": round(dt * 1e3, 2),
                     "reads_per_s": round(batch / dt, 1)}
        print(name, out[name])

    put("r04_loop", slope(
        lambda keep: eng.decide_packed(packed, None, read_len)[0]))

    def hold_all(keep):
        r = eng.decide_packed(packed, None, read_len)
        keep.append(r)
        return r[0]
    put("hold_all", slope(hold_all))

    put("fused", slope(
        lambda keep: eng.decide_packed_fused(packed, None, read_len)))

    def fused_hold(keep):
        r = eng.decide_packed_fused(packed, None, read_len)
        keep.append(r)
        return r
    put("fused_hold", slope(fused_hold))

    up = jax.jit(lambda x: jnp.sum(x.astype(jnp.int32)))
    np.asarray(up(jnp.asarray(packed)))
    put("upload_only", slope(lambda keep: up(jnp.asarray(packed))))

    out["note"] = ("slope-timed (T(15)-T(5))/10; hold_* variants keep "
                   "all device results alive so no deallocations happen "
                   "inside the timed region")
    with open("PROBE_R05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
