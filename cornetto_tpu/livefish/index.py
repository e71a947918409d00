"""Sharded minimizer index of a draft assembly.

The TPU-native replacement for readfish's minimap2 index in the adaptive-
sampling loop (SURVEY.md §7 item 7): minimizers of the draft are extracted
host-side, sorted by hash, and partitioned into E equal hash-range shards
(the expert-parallel axis of the decision mesh).  Each shard is a sorted
(hash, contig, pos) table padded to a common static size so lookups are a
single `searchsorted` per shard under jit.
"""

from dataclasses import dataclass
from typing import Dict, List

import numpy as np

from cornetto_tpu.kernels.minimizer import (DEFAULT_K, DEFAULT_W, encode_seq,
                                            minimizers_np)


@dataclass
class MinimizerIndex:
    # shard tables, each (E, N_pad)
    hashes: np.ndarray      # uint32, padded with 0xFFFFFFFF
    contigs: np.ndarray     # int32, padded with -1
    positions: np.ndarray   # int32
    shard_counts: np.ndarray  # (E,) int32 true sizes
    contig_names: List[str]
    contig_lens: np.ndarray  # (C,) int64
    k: int
    w: int
    # bucketed device layout: bucket b of shard e holds up to K entries
    # whose hash satisfies ((h >> bucket_shift) & (2^B - 1)) == b.  A
    # lookup is then exactly two row-gathers (keys row + values row) — the
    # TPU-friendly alternative to binary search, whose ~20 dependent gather
    # rounds dominate runtime.
    bkeys: np.ndarray = None      # (E, 2^B, K) uint32, sentinel 0xFFFFFFFF
    bvals: np.ndarray = None      # (E, 2^B, K, 2) int32 (contig, pos)
    bucket_shift: int = 32
    bucket_slots: int = 0
    dropped_frac: float = 0.0     # overflow entries dropped at build

    @property
    def n_shards(self) -> int:
        return self.hashes.shape[0]


def build_index(contigs: Dict[str, str], n_shards: int = 1,
                k: int = DEFAULT_K, w: int = DEFAULT_W,
                repeat_cap: int = 256, dir_slots: int = 8) -> MinimizerIndex:
    """contigs: name -> sequence.  n_shards must be a power of two.

    The table keeps one entry per unique hash (first occurrence, matching
    the lookup's first-match semantics); hashes occurring more than
    `repeat_cap` times are dropped entirely (repeat masking).  A per-shard
    bucket directory bounds device lookups to one directory gather plus a
    `dir_slots`-wide scan.
    """
    assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of two"
    names = list(contigs)
    lens = np.array([len(contigs[n]) for n in names], dtype=np.int64)
    all_h = []
    all_c = []
    all_p = []
    for ci, name in enumerate(names):
        pos, h = minimizers_np(encode_seq(contigs[name]), k=k, w=w)
        all_h.append(h)
        all_c.append(np.full(len(h), ci, dtype=np.int32))
        all_p.append(pos)
    h = np.concatenate(all_h) if all_h else np.empty(0, np.uint32)
    c = np.concatenate(all_c) if all_c else np.empty(0, np.int32)
    p = np.concatenate(all_p) if all_p else np.empty(0, np.int32)
    order = np.argsort(h, kind="stable")
    h, c, p = h[order], c[order], p[order]
    # dedupe to first occurrence per unique hash; mask heavy repeats
    if len(h):
        uniq_first = np.empty(len(h), dtype=bool)
        uniq_first[0] = True
        uniq_first[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(uniq_first)
        counts_per = np.diff(np.append(starts, len(h)))
        keep = starts[counts_per <= repeat_cap]
        h, c, p = h[keep], c[keep], p[keep]
    # hash-range sharding: shard s owns [s * 2^32 / E, (s+1) * 2^32 / E)
    log2e = int(n_shards).bit_length() - 1
    shard_id = (h >> np.uint32(32 - log2e)) if log2e else \
        np.zeros(len(h), dtype=np.uint32)
    cut = np.searchsorted(shard_id, np.arange(1, n_shards), side="left")
    cut = np.concatenate([[0], cut, [len(h)]])
    counts = np.diff(cut).astype(np.int32)
    n_pad = max(int(counts.max()) if len(counts) else 1, 1)
    # round up so the padded table tiles the VPU lanes
    n_pad = -(-n_pad // 128) * 128
    H = np.full((n_shards, n_pad), 0xFFFFFFFF, dtype=np.uint32)
    C = np.full((n_shards, n_pad), -1, dtype=np.int32)
    P = np.zeros((n_shards, n_pad), dtype=np.int32)
    for s in range(n_shards):
        a, b = cut[s], cut[s + 1]
        H[s, :b - a] = h[a:b]
        C[s, :b - a] = c[a:b]
        P[s, :b - a] = p[a:b]
    bkeys, bvals, bshift, bslots, dropped = _build_buckets(
        H, C, P, counts, log2e, dir_slots)
    return MinimizerIndex(H, C, P, counts, names, lens, k, w,
                          bkeys=bkeys, bvals=bvals, bucket_shift=bshift,
                          bucket_slots=bslots, dropped_frac=dropped)


def _build_buckets(H: np.ndarray, C: np.ndarray, P: np.ndarray,
                   counts: np.ndarray, log2e: int, K: int,
                   max_overflow: float = 0.002):
    """Pack each shard's (sorted, unique) hash table into a (2^B, K)
    bucketed layout.  B grows until bucket overflow (entries beyond K,
    dropped — extra repeat masking) is below `max_overflow`."""
    n_shards = H.shape[0]
    max_n = max(int(counts.max()) if len(counts) else 1, 1)
    B = max(int(np.ceil(np.log2(max(max_n // max(K // 2, 1), 2)))), 3)
    B = min(B, 32 - log2e)
    while True:
        shift = 32 - log2e - B
        n_buckets = 1 << B
        bkeys = np.full((n_shards, n_buckets, K), 0xFFFFFFFF,
                        dtype=np.uint32)
        bvals = np.zeros((n_shards, n_buckets, K, 2), dtype=np.int32)
        dropped = 0
        total = 0
        for s in range(n_shards):
            n = int(counts[s])
            if n == 0:
                continue
            h = H[s, :n]
            buckets = ((h >> np.uint32(shift))
                       & np.uint32(n_buckets - 1)).astype(np.int64)
            start = np.searchsorted(buckets, np.arange(n_buckets))
            rank = np.arange(n) - start[buckets]
            keep = rank < K
            slot_b = buckets[keep]
            slot_k = rank[keep]
            bkeys[s, slot_b, slot_k] = h[keep]
            bvals[s, slot_b, slot_k, 0] = C[s, :n][keep]
            bvals[s, slot_b, slot_k, 1] = P[s, :n][keep]
            dropped += int(n - keep.sum())
            total += n
        frac = dropped / total if total else 0.0
        if frac <= max_overflow or shift <= 0 or B >= 28:
            return bkeys, bvals, shift, K, frac
        B += 1


def build_panel_mask(index: MinimizerIndex, panel_rows,
                     bin_size: int = 1000) -> np.ndarray:
    """(C, BINS) bool — True where a position bin falls in the reject panel
    (the bigenough boring-bits BED, i.e. readfish unblock targets)."""
    name_to_id = {n: i for i, n in enumerate(index.contig_names)}
    n_bins = int(-(-index.contig_lens.max() // bin_size)) if \
        len(index.contig_lens) else 1
    n_bins = max(-(-n_bins // 128) * 128, 128)
    mask = np.zeros((len(index.contig_names), n_bins), dtype=bool)
    for c, s, e in panel_rows:
        ci = name_to_id.get(c)
        if ci is None:
            continue
        mask[ci, s // bin_size:-(-e // bin_size)] = True
    return mask
