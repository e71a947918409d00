"""Minimal BAM reader + per-base depth, replacing the `samtools depth -aa`
stage of the reference protocol (reference: shitflow/create-launch.pbs.sh:66-67
generates the two coverage bedgraphs with `samtools depth -aa` /
`samtools depth -Q 20 -aa` piped through awk to 1-bp bedgraph rows).

The reference repo ships test/example.bam but NOT the derived
test/cov-total.bg + test/cov-mq20.bg consumed by its golden tests
(reference: test/test.sh:25,29), so this module regenerates them
deterministically.  Validated end-to-end: feeding the regenerated bedgraphs
through the boringbits tool reproduces test/example_boring_t1.exp and
test/example_fun_t2.exp byte-for-byte.
"""

import gzip
import struct
from dataclasses import dataclass
from typing import Iterator, List, Tuple

import numpy as np

# CIGAR op codes
_CONSUME_REF = (0, 2, 3, 7, 8)   # M, D, N, =, X
_COVER_OPS = (0, 7, 8)           # M, =, X count toward depth
_FLAG_FILTER = 0x704             # UNMAP | SECONDARY | QCFAIL | DUP


@dataclass
class BamAlignment:
    ref_id: int
    pos: int
    mapq: int
    flag: int
    cigar: List[Tuple[int, int]]  # (op, length)


class BamFile:
    def __init__(self, path: str):
        with open(path, "rb") as fp:
            raw = fp.read()
        self._data = gzip.decompress(raw)
        if self._data[:4] != b"BAM\x01":
            raise ValueError("not a BAM file: %s" % path)
        off = 4
        (l_text,) = struct.unpack_from("<i", self._data, off)
        off += 4 + l_text
        (n_ref,) = struct.unpack_from("<i", self._data, off)
        off += 4
        self.ref_names: List[str] = []
        self.ref_lens: List[int] = []
        for _ in range(n_ref):
            (l_name,) = struct.unpack_from("<i", self._data, off)
            off += 4
            self.ref_names.append(
                self._data[off:off + l_name - 1].decode())
            off += l_name
            (l_ref,) = struct.unpack_from("<i", self._data, off)
            off += 4
            self.ref_lens.append(l_ref)
        self._aln_off = off

    def alignments(self) -> Iterator[BamAlignment]:
        data = self._data
        off = self._aln_off
        n = len(data)
        while off < n:
            (block_size,) = struct.unpack_from("<i", data, off)
            off += 4
            (ref_id, pos, l_read_name, mapq, _bin, n_cigar, flag,
             _l_seq, _nref, _npos, _tlen) = struct.unpack_from(
                "<iiBBHHHiiii", data, off)
            coff = off + 32 + l_read_name
            cigar = []
            for k in range(n_cigar):
                (cg,) = struct.unpack_from("<I", data, coff + 4 * k)
                cigar.append((cg & 0xF, cg >> 4))
            yield BamAlignment(ref_id, pos, mapq, flag, cigar)
            off += block_size


def depth_arrays(bam: BamFile, min_mapq: int = 0,
                 include_dels: bool = False) -> List[np.ndarray]:
    """Per-reference depth as `samtools depth` computes it: excludes
    unmapped/secondary/qcfail/duplicate reads, counts aligned bases
    (M/=/X ops; D too when include_dels)."""
    depth = [np.zeros(l, dtype=np.int64) for l in bam.ref_lens]
    for a in bam.alignments():
        if a.flag & _FLAG_FILTER:
            continue
        if a.mapq < min_mapq:
            continue
        if a.ref_id < 0:
            continue
        d = depth[a.ref_id]
        rpos = a.pos
        for op, ln in a.cigar:
            if op in _COVER_OPS or (include_dels and op == 2):
                d[rpos:rpos + ln] += 1
            if op in _CONSUME_REF:
                rpos += ln
    return depth


def write_depth_bedgraph(bam: BamFile, out_path: str, min_mapq: int = 0,
                         include_dels: bool = False,
                         ref_order: List[str] = None) -> None:
    """Write the awk-converted `samtools depth -aa` bedgraph
    (chrom, pos-1, pos, depth rows for every base of every reference)."""
    depth = depth_arrays(bam, min_mapq=min_mapq, include_dels=include_dels)
    order = range(len(bam.ref_names))
    if ref_order is not None:
        name_to_i = {n: i for i, n in enumerate(bam.ref_names)}
        order = [name_to_i[n] for n in ref_order]
    with open(out_path, "w") as out:
        for i in order:
            name = bam.ref_names[i]
            d = depth[i]
            starts = np.arange(len(d), dtype=np.int64)
            cols = np.empty((len(d), 3), dtype=np.int64)
            cols[:, 0] = starts
            cols[:, 1] = starts + 1
            cols[:, 2] = d
            lines = "\n".join(
                "%s\t%d\t%d\t%d" % (name, s, e, v)
                for s, e, v in cols) if len(d) else ""
            if lines:
                out.write(lines + "\n")
