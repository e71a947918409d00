"""SDUST DP as a lane-parallel Pallas TPU kernel.

SURVEY.md §7 names the sdust DP "the one kernel needing a genuine Pallas
scan with carried state" (reference: src/sdust/sdust.c:66-128 — a
sequential window recurrence with data-dependent queue evictions).  The
round-3 hybrid only FILTERED on device and ran the DP on host, which
degenerates on dense (satellite) input — the case where DUST actually
fires.  This kernel runs the DP itself on the TPU:

- the sequence is tiled into independent chunks by the exactness-proven
  decomposition of kernels/sdust_chunked.py (4W warm-up context, W+8
  lookahead, clip-and-union reassembly; bit-identical by
  tests/test_sdust_chunked.py);
- 128 chunks execute concurrently as VPU LANES: one carried DP state per
  lane, every data-dependent scalar branch of the C becomes a masked
  vector op.  State per lane: the 62-word ring (kept newest-first via a
  roll so all ring reads are static or uniform rows), the cv/cw
  64-triplet histograms (one-hot updates), rv/rw/L/len_w scalars, and
  the pending perfect-interval list P as 128 START-GROUP slots (the C's
  flat sorted vector reaches ~1700 entries on homopolymers, but entries
  group by start coordinate with an active span < 128, and only each
  group's newest finish + sequential-ratio winner are ever read — see
  the in-kernel comment for the exactness argument).
- the three data-dependent loops of the C map to:
    eviction  -> oldest-occurrence row via a masked iota-max, then a
                 64-value histogram rebuild of cv (guarded: runs only
                 when some lane evicts);
    find_perfect -> a static 64-row backward sweep with uniform row
                 reads; the C's per-fire P rescan becomes an incremental
                 descending-start group incorporation (the qualifying
                 prefix only grows as the sweep walks back, and the
                 strict-ratio max is associative);
    save/flush -> minimum-start group pop + below-threshold group
                 delete, all as masked (128, LANES) plane ops.

Interval outputs append to per-lane rows of the output block (masked
one-hot scatter); lanes that overflow the per-chunk interval budget are
re-run exactly on host (never observed outside adversarial inputs).

Validated bit-for-bit against the sequential DP via interpret mode and
on-TPU (tests/test_pallas_sdust.py); dense-satellite throughput in
BENCH_KERNELS.json sdust_pallas_dense.
"""

import functools
from typing import List, Tuple

import numpy as np

from cornetto_tpu.kernels.sdust_chunked import (DEF_W, assemble, plan_chunks,
                                                run_host_spans)

SD_WLEN = 3
LANES_DEFAULT = 512  # default chunk-lanes per grid step: measured optimum on
                # v5e (128 was instruction-issue-bound: 1.9 -> 2.2 Mb/s
                # dense; 1024 exceeds VMEM with the codes block).
                # Interpret-mode tests pass lanes=128 for simulation speed.
ROWS = 64       # ring capacity (>= W - SD_WLEN + 1 = 62) AND word values


def _roll1(a):
    """Roll rows down by one (row r <- row r-1), lane dim untouched."""
    import jax.numpy as jnp
    return jnp.roll(a, 1, axis=0)


def _sdust_kernel(codes_ref, outs_ref, outf_ref, outn_ref, *,
                  T: int, W: int, CLEN: int, MAXI: int, LANES: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    NW = W - SD_WLEN + 1
    GSLOT = 128   # pending-interval START slots, cyclic by start & 127
    i32 = jnp.int32
    BIG = jnp.int32(1 << 30)
    iota_r = jax.lax.broadcasted_iota(i32, (ROWS, LANES), 0)
    iota_g = jax.lax.broadcasted_iota(i32, (GSLOT, LANES), 0)
    iota_m = jax.lax.broadcasted_iota(i32, (MAXI, LANES), 0)

    def hist_get(H, val):
        """H[val[lane], lane] per lane (val (1, LANES), rows = values)."""
        return jnp.sum(jnp.where(iota_r == val, H, 0), axis=0,
                       keepdims=True)

    def hist_add(H, val, delta):
        """H[val[lane], lane] += delta[lane] (masked one-hot update)."""
        return H + jnp.where(iota_r == val, delta, 0)

    # ---- state (loop carry) ------------------------------------------
    # The C keeps P as a flat sorted vector that reaches ~1700 entries on
    # homopolymers; entries GROUP by start coordinate (active span < 128
    # starts), and the only group facts the algorithm ever reads are
    #   - the group's newest entry's finish   (save_masked saves P[-1],
    #     the newest entry of the minimum-start group),
    #   - the group's winner under the sequential strict-ratio max
    #     (associative: first-wins ties = higher-start group first,
    #     within-group insertion order = winner update order),
    # so five (GSLOT, LANES) planes replace the unbounded vector exactly.
    z1 = jnp.zeros((1, LANES), i32)
    state0 = dict(
        ring=jnp.zeros((ROWS, LANES), i32),      # row 0 = newest word
        cw=jnp.zeros((ROWS, LANES), i32),        # rows = word values
        cv=jnp.zeros((ROWS, LANES), i32),
        Gs=jnp.zeros((GSLOT, LANES), i32),       # group start coord
        Gf=jnp.zeros((GSLOT, LANES), i32),       # newest entry's finish
        Gr=jnp.zeros((GSLOT, LANES), i32),       # ratio-winner r
        Gl=jnp.zeros((GSLOT, LANES), i32),       # ratio-winner l
        Gu=jnp.zeros((GSLOT, LANES), i32),       # occupancy (0/1)
        rv=z1, rw=z1, L=z1, lenw=z1, lrun=z1, tw=z1,
        res_s=z1, res_f=z1, res_has=z1, outn=z1,
    )

    def save_masked(st, thresh, mask):
        """One save_masked_regions(thresh) step (src/sdust/sdust.c:88-102):
        save the newest entry of the minimum-start group if its start <
        thresh, merge it into the running res tail, then delete every
        group below thresh."""
        below = (st["Gu"] > 0) & (st["Gs"] < thresh) & mask
        any_below = jnp.any(below, axis=0, keepdims=True)
        min_s = jnp.min(jnp.where(below, st["Gs"], BIG), axis=0,
                        keepdims=True)
        p_f = jnp.sum(jnp.where(below & (st["Gs"] == min_s), st["Gf"], 0),
                      axis=0, keepdims=True)
        fire = mask & any_below
        ovl = fire & (st["res_has"] > 0) & (min_s <= st["res_f"])
        new_seg = fire & ~ovl
        emit = new_seg & (st["res_has"] > 0)
        at = st["outn"]
        sel = (iota_m == at) & emit & (at < MAXI)
        outs_ref[:, :] = jnp.where(sel, st["res_s"], outs_ref[:, :])
        outf_ref[:, :] = jnp.where(sel, st["res_f"], outf_ref[:, :])
        st["outn"] = at + jnp.where(emit, 1, 0)
        st["res_f"] = jnp.where(ovl, jnp.maximum(st["res_f"], p_f),
                                st["res_f"])
        st["res_s"] = jnp.where(new_seg, min_s, st["res_s"])
        st["res_f"] = jnp.where(new_seg, p_f, st["res_f"])
        st["res_has"] = jnp.where(new_seg, 1, st["res_has"])
        st["Gu"] = jnp.where(below & fire, 0, st["Gu"])
        return st

    def flush(st, thresh0, mask, iters):
        """The C's N/end flush: save_masked with an incrementing threshold
        until the groups drain (starts are < thresh0 + iters)."""
        def body(k, st):
            alive = jnp.any((st["Gu"] > 0) & mask, axis=0, keepdims=True)
            return save_masked(st, thresh0 + k, mask & alive)
        return jax.lax.fori_loop(0, iters, body, st)

    def find_perfect(st, start, mask):
        """src/sdust/sdust.c:104-128 — backward sweep over the non-v part
        of the window; the C's per-fire P rescan becomes an incremental
        descending-start group incorporation (the qualifying prefix only
        grows as the sweep walks back, and the strict-ratio max is
        associative)."""
        c = st["cv"]
        r_acc = st["rv"]
        maxr = z1
        maxl = z1
        inc = jnp.zeros((GSLOT, LANES), jnp.int32)   # incorporated groups
        lenw = st["lenw"]

        def body(rr, carry):
            st, c, r_acc, maxr, maxl, inc = carry
            act = mask & (rr >= st["L"]) & (rr < lenw)
            t_i = jnp.sum(jnp.where(iota_r == rr, st["ring"], 0), axis=0,
                          keepdims=True)
            r_acc = r_acc + jnp.where(act, hist_get(c, t_i), 0)
            c = hist_add(c, t_i, jnp.where(act, 1, 0))
            fire = act & (r_acc * 10 > T * rr)
            # candidate coordinates (C: i + start / len(w)+WLEN-1+start,
            # with i the oldest-first window index = lenw-1-rr)
            e_s = lenw - 1 - rr + start
            e_f = lenw + (SD_WLEN - 1) + start

            # incorporate qualifying groups (start >= e_s) in descending
            # start order, updating the running strict-ratio winner
            def adv_cond(cr):
                _, _, inc = cr
                todo = (st["Gu"] > 0) & (inc == 0) & (st["Gs"] >= e_s) \
                    & fire
                return jnp.any(todo)

            def adv_body(cr):
                maxr, maxl, inc = cr
                todo = (st["Gu"] > 0) & (inc == 0) & (st["Gs"] >= e_s) \
                    & fire
                nxt = jnp.max(jnp.where(todo, st["Gs"], -1), axis=0,
                              keepdims=True)
                pick = todo & (st["Gs"] == nxt)
                g_r = jnp.sum(jnp.where(pick, st["Gr"], 0), axis=0,
                              keepdims=True)
                g_l = jnp.sum(jnp.where(pick, st["Gl"], 0), axis=0,
                              keepdims=True)
                has = jnp.any(pick, axis=0, keepdims=True)
                upd = has & ((maxr == 0) | (g_r * maxl > maxr * g_l))
                maxr = jnp.where(upd, g_r, maxr)
                maxl = jnp.where(upd, g_l, maxl)
                return maxr, maxl, inc + pick.astype(i32)

            maxr, maxl, inc = jax.lax.while_loop(
                adv_cond, adv_body, (maxr, maxl, inc))
            ins = fire & ((maxr == 0) | (r_acc * maxl >= maxr * rr))
            maxr = jnp.where(ins, r_acc, maxr)
            maxl = jnp.where(ins, rr, maxl)
            # group insert: slot = start & (GSLOT-1); newest finish
            # overwrites; the winner updates by the within-group rule
            slot = e_s & (GSLOT - 1)
            sel = (iota_g == slot) & ins
            exists = sel & (st["Gu"] > 0)
            better = exists & (r_acc * st["Gl"] > st["Gr"] * rr)
            fresh = sel & (st["Gu"] == 0)
            winner = better | fresh
            st["Gr"] = jnp.where(winner, r_acc, st["Gr"])
            st["Gl"] = jnp.where(winner, rr, st["Gl"])
            st["Gs"] = jnp.where(sel, e_s, st["Gs"])
            st["Gf"] = jnp.where(sel, e_f, st["Gf"])
            st["Gu"] = jnp.where(sel, 1, st["Gu"])
            inc = jnp.where(sel, 1, inc)
            return st, c, r_acc, maxr, maxl, inc

        st, *_ = jax.lax.fori_loop(
            1, ROWS, body, (st, c, r_acc, maxr, maxl, inc))
        return st

    def shift_window(st, t, mask):
        """src/sdust/sdust.c:66-86 — pop the oldest word when full, push
        t, run the cv*10 > 2T eviction."""
        full = mask & (st["lenw"] >= NW)
        s = st["ring"][NW - 1:NW, :]                 # oldest (static row)
        # pop: cw[s] -= 1; rw -= cw[s]
        st["cw"] = hist_add(st["cw"], s, jnp.where(full, -1, 0))
        st["rw"] = st["rw"] - jnp.where(full, hist_get(st["cw"], s), 0)
        shrink = full & (st["L"] >= st["lenw"])
        st["L"] = st["L"] - jnp.where(shrink, 1, 0)
        st["cv"] = hist_add(st["cv"], s, jnp.where(shrink, -1, 0))
        st["rv"] = st["rv"] - jnp.where(shrink, hist_get(st["cv"], s), 0)
        st["lenw"] = jnp.where(mask,
                               jnp.minimum(st["lenw"] + 1, NW), st["lenw"])
        rolled = _roll1(st["ring"])
        ring = jnp.where(mask, rolled, st["ring"])
        st["ring"] = jnp.where((iota_r == 0) & mask, t, ring)
        # push: L++; rw += cw[t]; cw[t]++; rv += cv[t]; cv[t]++
        st["L"] = st["L"] + jnp.where(mask, 1, 0)
        st["rw"] = st["rw"] + jnp.where(mask, hist_get(st["cw"], t), 0)
        st["cw"] = hist_add(st["cw"], t, jnp.where(mask, 1, 0))
        st["rv"] = st["rv"] + jnp.where(mask, hist_get(st["cv"], t), 0)
        st["cv"] = hist_add(st["cv"], t, jnp.where(mask, 1, 0))
        evict = mask & (hist_get(st["cv"], t) * 10 > (T << 1))

        def do_evict(st):
            # pops run oldest-first until the oldest occurrence of t pops:
            # the new v-window is everything strictly newer than that row
            occ = (st["ring"] == t) & (iota_r < st["L"]) & evict
            j_old = jnp.max(jnp.where(occ, iota_r, -1), axis=0,
                            keepdims=True)
            L_new = jnp.where(evict, j_old, st["L"])

            # rebuild cv as the histogram of ring rows < L_new
            def hv(v, cv):
                cnt = jnp.sum(((st["ring"] == v) & (iota_r < L_new))
                              .astype(i32), axis=0, keepdims=True)
                return jnp.where((iota_r == v) & evict, cnt, cv)

            cv = jax.lax.fori_loop(0, ROWS, hv, st["cv"])
            rv = jnp.sum(cv * (cv - 1) // 2, axis=0, keepdims=True)
            st["cv"] = cv
            st["rv"] = jnp.where(evict, rv, st["rv"])
            st["L"] = L_new
            return st

        return jax.lax.cond(jnp.any(evict), do_evict, lambda s: s, st)

    # ---- main per-base loop ------------------------------------------
    def body(i, st):
        b = codes_ref[pl.ds(i, 1), :]                        # (1, LANES)
        isN = b >= 4
        l_old = st["lrun"]
        # N branch: flush all pending intervals (guarded — rare)
        flush_mask = isN & jnp.any(st["Gu"] > 0, axis=0, keepdims=True)

        def do_flush(st):
            th0 = (jnp.maximum(l_old - W + 1, 0) + (i + 1 - l_old))
            return flush(st, jnp.where(flush_mask, th0, BIG),
                         flush_mask, W + GSLOT + 8)

        st = jax.lax.cond(jnp.any(flush_mask), do_flush, lambda s: s, st)
        st["lrun"] = jnp.where(isN, 0, l_old + 1)
        st["tw"] = jnp.where(
            isN, 0, ((st["tw"] << 2) | jnp.minimum(b, 3)) & (ROWS - 1))
        ready = (~isN) & (st["lrun"] >= SD_WLEN)
        start = jnp.maximum(st["lrun"] - W, 0) + (i + 1 - st["lrun"])
        st = save_masked(st, start, ready)
        st = shift_window(st, st["tw"], ready)
        fp = ready & (st["rw"] * 10 > st["L"] * T)
        st = jax.lax.cond(jnp.any(fp),
                          lambda s: find_perfect(s, start, fp),
                          lambda s: s, st)
        return st

    st = jax.lax.fori_loop(0, CLEN, body, state0)

    # ---- end-of-sequence flush (the virtual b=4 at i == l_seq) -------
    l_old = st["lrun"]
    th0 = jnp.maximum(l_old - W + 1, 0) + (CLEN + 1 - l_old)
    st = flush(st, th0, jnp.full((1, LANES), True), W + GSLOT + 8)
    # final res tail
    emit = st["res_has"] > 0
    at = st["outn"]
    sel = (iota_m == at) & emit & (at < MAXI)
    outs_ref[:, :] = jnp.where(sel, st["res_s"], outs_ref[:, :])
    outf_ref[:, :] = jnp.where(sel, st["res_f"], outf_ref[:, :])
    outn_ref[:, :] = at + jnp.where(emit, 1, 0)


def sdust_pallas_chunks(rows: np.ndarray, T: int = 20, W: int = DEF_W,
                        interpret: bool = False, lanes: int = None):
    """Run the lane-parallel DP over (n, CLEN) uint8 code rows (4 = N);
    n padded to a lane multiple internally.  Returns per-row interval
    lists in ROW-LOCAL coordinates plus an overflow mask."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    LANES = lanes or LANES_DEFAULT
    n, CLEN = rows.shape
    MAXI = max(CLEN // 48, 16)
    g = -(-n // LANES)
    # round the grid up to a power of two: one compile per size bucket
    # instead of one per sequence length (all-N pad rows flush to empty)
    g = 1 << (g - 1).bit_length() if g > 1 else 1
    padded = np.full((g * LANES, CLEN), 4, dtype=np.uint8)
    padded[:n] = rows
    # (g, CLEN, LANES) int32, lanes minor (Mosaic rejects a uint8 block
    # here — measured, not assumed; the 4x upload cost only matters
    # through the dev tunnel)
    blocks = (padded.reshape(g, LANES, CLEN).transpose(0, 2, 1)
              .astype(np.int32))

    fn = _jit_kernel(CLEN, MAXI, T, W, interpret, LANES)
    outs, outf, outn = fn(jnp.asarray(blocks))
    outs = np.asarray(outs)
    outf = np.asarray(outf)
    outn = np.asarray(outn)
    per_row: List[List[Tuple[int, int]]] = []
    overflow = np.zeros(n, dtype=bool)
    for j in range(n):
        gi, lane = divmod(j, LANES)
        cnt = int(outn[gi, 0, lane])
        if cnt >= MAXI:
            overflow[j] = True
            per_row.append([])
            continue
        per_row.append([(int(outs[gi, k, lane]), int(outf[gi, k, lane]))
                        for k in range(cnt)])
    return per_row, overflow


@functools.lru_cache(maxsize=None)
def _jit_kernel(CLEN: int, MAXI: int, T: int, W: int, interpret: bool,
                LANES: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    kern = functools.partial(_sdust_kernel, T=T, W=W, CLEN=CLEN, MAXI=MAXI,
                             LANES=LANES)

    def run(blocks):
        g = blocks.shape[0]
        return pl.pallas_call(
            kern,
            grid=(g,),
            in_specs=[pl.BlockSpec((None, CLEN, LANES),
                                   lambda i: (i, 0, 0))],
            out_specs=[pl.BlockSpec((None, MAXI, LANES),
                                    lambda i: (i, 0, 0)),
                       pl.BlockSpec((None, MAXI, LANES),
                                    lambda i: (i, 0, 0)),
                       pl.BlockSpec((None, 1, LANES),
                                    lambda i: (i, 0, 0))],
            out_shape=[jax.ShapeDtypeStruct((g, MAXI, LANES), jnp.int32),
                       jax.ShapeDtypeStruct((g, MAXI, LANES), jnp.int32),
                       jax.ShapeDtypeStruct((g, 1, LANES), jnp.int32)],
            interpret=interpret,
        )(blocks)

    return jax.jit(run)


def sdust_pallas(seq: bytes, T: int = 20, W: int = DEF_W,
                 core: int = 2048, interpret: bool = False,
                 lanes: int = None) -> List[Tuple[int, int]]:
    """Full-sequence SDUST on TPU: plan chunks, run the lane-parallel DP,
    re-run overflow/N-proximal chunks exactly on host, clip and union
    (bit-identical to the sequential DP)."""
    from cornetto_tpu.kernels.sdust_core import _NT4
    from cornetto_tpu.native.sdust import sdust as sdust_exact
    codes = _NT4[np.frombuffer(seq, dtype=np.uint8)]
    device, host = plan_chunks(codes, core, W)
    if device:
        ctx, look = 4 * W, W + 8
        CLEN = ctx + core + look
        rows = np.full((len(device), CLEN), 4, dtype=np.uint8)
        offs = []
        for r, (a, b, c0, stop) in enumerate(device):
            pad_left = ctx - (a - c0)
            rows[r, pad_left:pad_left + (stop - c0)] = codes[c0:stop]
            offs.append(c0 - pad_left)
        per_row, overflow = sdust_pallas_chunks(rows, T=T, W=W,
                                                interpret=interpret,
                                                lanes=lanes)
        per_chunk = []
        for r, (a, b, c0, stop) in enumerate(device):
            if overflow[r]:
                per_chunk.append(sdust_exact(seq[c0:stop], T=T, W=W))
            else:
                # kernel coords are row-local; shift to slice-local
                d = offs[r] - c0
                per_chunk.append([(s + d, f + d) for s, f in per_row[r]])
    else:
        per_chunk = []
    host_parts = run_host_spans(seq, host, T, W)
    return assemble(per_chunk, device, host_parts, W)
