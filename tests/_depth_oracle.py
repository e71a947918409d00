"""Independent samtools-depth oracle, written from the SAM/BAM spec using
ONLY the Python standard library (gzip's multi-member reader decompresses
BGZF; struct parses records).  It shares no code with cornetto_tpu.io.bam —
that independence is the point: samtools itself is unreachable here (no
network egress), so cross-validating the framework's BAM reader/depth and
BamWriter against a second from-spec implementation is the strongest
available check (VERDICT.md round-1 items #7 and weak #5).

Semantics implemented = `samtools depth -aa [-Q N]`
(reference: shitflow/create-launch.pbs.sh:66-67):
- skip reads with flag & 0x704 (UNMAP|SECONDARY|QCFAIL|DUP) or unmapped ref
- -Q N keeps reads with MAPQ >= N
- depth counts reference positions consumed by CIGAR M/=/X; D and N
  consume reference without adding depth; I/S consume query only
"""

import gzip
import struct

FLAG_FILTER = 0x704
CONSUME_REF = {0, 2, 3, 7, 8}       # M D N = X
COVER = {0, 7, 8}                   # M = X


def read_bam(path: str):
    """Returns (ref_names, ref_lens, records) where each record is
    (ref_id, pos, mapq, flag, cigar[(op, ln)])."""
    with open(path, "rb") as f:
        raw = gzip.decompress(f.read())
    assert raw[:4] == b"BAM\x01", "not a BAM file"
    off = 4
    (l_text,) = struct.unpack_from("<i", raw, off)
    off += 4 + l_text
    (n_ref,) = struct.unpack_from("<i", raw, off)
    off += 4
    names, lens = [], []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", raw, off)
        off += 4
        names.append(raw[off:off + l_name - 1].decode())
        off += l_name
        (l_ref,) = struct.unpack_from("<i", raw, off)
        off += 4
        lens.append(l_ref)
    records = []
    n = len(raw)
    while off < n:
        (block_size,) = struct.unpack_from("<i", raw, off)
        off += 4
        rec_end = off + block_size
        (ref_id, pos, l_read_name, mapq, _bin, n_cigar, flag, l_seq,
         _nref, _npos, _tlen) = struct.unpack_from("<iiBBHHHiiii", raw, off)
        coff = off + 32 + l_read_name
        cigar = []
        for i in range(n_cigar):
            (cg,) = struct.unpack_from("<I", raw, coff + 4 * i)
            cigar.append((cg & 0xF, cg >> 4))
        records.append((ref_id, pos, mapq, flag, cigar))
        off = rec_end
    return names, lens, records


def covered_envelopes(path: str, pad: int = 1000):
    """Per-reference [min_pos - pad, max_end + pad) envelope of alignments
    (clamped to the reference), as BED rows — so -aa cross-checks stay
    region-scoped instead of materialising 3 Gbp of human chromosomes."""
    names, lens, records = read_bam(path)
    env = {}
    for ref_id, pos, mapq, flag, cigar in records:
        if ref_id < 0:
            continue
        end = pos + sum(ln for op, ln in cigar if op in CONSUME_REF)
        lo, hi = env.get(ref_id, (pos, end))
        env[ref_id] = (min(lo, pos), max(hi, end))
    return [(names[r], max(lo - pad, 0), min(hi + pad, lens[r]))
            for r, (lo, hi) in sorted(env.items())]


def depth_in_regions(path: str, regions, min_mapq: int = 0):
    """samtools depth -aa -b regions equivalent: {(name, beg, end): list of
    per-position depths over [beg, end)}."""
    names, lens, records = read_bam(path)
    rid = {n: i for i, n in enumerate(names)}
    out = {}
    per_ref = {}
    for name, beg, end in regions:
        d = [0] * (end - beg)
        out[(name, beg, end)] = d
        per_ref.setdefault(rid[name], []).append((beg, end, d))
    for ref_id, pos, mapq, flag, cigar in records:
        if ref_id < 0 or (flag & FLAG_FILTER) or mapq < min_mapq \
                or ref_id not in per_ref:
            continue
        for beg, end, d in per_ref[ref_id]:
            p = pos
            for op, ln in cigar:
                if op in COVER:
                    for i in range(max(p, beg), min(p + ln, end)):
                        d[i - beg] += 1
                if op in CONSUME_REF:
                    p += ln
    return out


def depth_rows(path: str, regions, min_mapq: int = 0):
    """`samtools depth -aa -b regions` text rows (1-based positions)."""
    d = depth_in_regions(path, regions, min_mapq)
    out = []
    for name, beg, end in regions:
        for i, v in enumerate(d[(name, beg, end)]):
            out.append("%s\t%d\t%d\n" % (name, beg + i + 1, v))
    return "".join(out)
