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

    @property
    def n_shards(self) -> int:
        return self.hashes.shape[0]


def build_index(contigs: Dict[str, str], n_shards: int = 1,
                k: int = DEFAULT_K, w: int = DEFAULT_W) -> MinimizerIndex:
    """contigs: name -> sequence."""
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
    # hash-range sharding: shard s owns [s * 2^32 / E, (s+1) * 2^32 / E)
    bounds = (np.arange(1, n_shards, dtype=np.uint64)
              * (np.uint64(1) << np.uint64(32)) // np.uint64(n_shards))
    cut = np.searchsorted(h, bounds.astype(np.uint32), side="left")
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
    return MinimizerIndex(H, C, P, counts, names, lens, k, w)


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
