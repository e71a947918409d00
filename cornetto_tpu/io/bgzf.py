"""BGZF block layer + BAI index for ranged, parallel BAM access.

The reference's depth subcommand is a dead skeleton awaiting htslib
(reference: src/depth_main.c:162-194, src/cornetto.c:64-118); this supplies
the part of htslib the protocol actually needs:

- **block-parallel inflate** — BGZF files are concatenated <=64 KiB gzip
  members; each inflates independently, so a thread pool (zlib releases
  the GIL) gives near-linear speedup over `gzip.decompress` of the whole
  file, the host-side analog of the reference's work-stealing batch pool
  (src/thread.c:48-156);
- **virtual offsets** — voffset = (compressed block offset << 16) |
  within-block offset, the unit the BAI speaks;
- **BAI parsing + reg2bins** — ranged `fetch(ref, beg, end)` touches only
  the blocks the index names instead of the whole file.
"""

import struct
import zlib
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Tuple

import numpy as np

_EOF_MARKER = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


class BgzfFile:
    """Random-access BGZF reader over an in-memory (or mmap'd) buffer."""

    def __init__(self, path: str, nthreads: int = None):
        import mmap
        import os
        self.path = path
        size = os.path.getsize(path)
        if size == 0:
            raise ValueError("empty BGZF file: %s" % path)
        with open(path, "rb") as f:
            self._raw = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        self._nthreads = nthreads or min(os.cpu_count() or 1, 8)
        # block table: compressed offset, compressed size, uncompressed size
        coffs: List[int] = []
        csizes: List[int] = []
        isizes: List[int] = []
        raw = self._raw
        off = 0
        n = size
        while off < n:
            if raw[off:off + 2] != b"\x1f\x8b":
                raise ValueError("bad gzip magic at offset %d in %s"
                                 % (off, path))
            flg = raw[off + 3]
            if not flg & 4:
                raise ValueError("not BGZF (no FEXTRA) at offset %d" % off)
            (xlen,) = struct.unpack_from("<H", raw, off + 10)
            xoff = off + 12
            xend = xoff + xlen
            bsize = None
            while xoff + 4 <= xend:
                si1, si2, slen = raw[xoff], raw[xoff + 1], \
                    struct.unpack_from("<H", raw, xoff + 2)[0]
                if si1 == 66 and si2 == 67 and slen == 2:
                    bsize = struct.unpack_from("<H", raw, xoff + 4)[0] + 1
                    break
                xoff += 4 + slen
            if bsize is None:
                raise ValueError("no BSIZE subfield at offset %d" % off)
            (isize,) = struct.unpack_from("<I", raw, off + bsize - 4)
            coffs.append(off)
            csizes.append(bsize)
            isizes.append(isize)
            off += bsize
        self.coffs = np.asarray(coffs, dtype=np.int64)
        self.csizes = np.asarray(csizes, dtype=np.int64)
        self.isizes = np.asarray(isizes, dtype=np.int64)
        # cumulative uncompressed offsets: block i covers
        # [ucum[i], ucum[i+1]) of the decompressed stream
        self.ucum = np.concatenate([[0], np.cumsum(self.isizes)])

    @property
    def n_blocks(self) -> int:
        return len(self.coffs)

    def _inflate_one(self, i: int) -> bytes:
        a = int(self.coffs[i])
        b = a + int(self.csizes[i])
        return zlib.decompress(self._raw[a:b], wbits=31)

    def decompress_blocks(self, i0: int, i1: int) -> bytes:
        """Inflate blocks [i0, i1) in parallel, return the concatenation."""
        if i1 <= i0:
            return b""
        if i1 - i0 == 1:
            return self._inflate_one(i0)
        with ThreadPoolExecutor(max_workers=self._nthreads) as ex:
            parts = list(ex.map(self._inflate_one, range(i0, i1)))
        return b"".join(parts)

    def decompress_all(self) -> bytes:
        return self.decompress_blocks(0, self.n_blocks)

    def block_of_coffset(self, coff: int) -> int:
        i = int(np.searchsorted(self.coffs, coff))
        if i >= self.n_blocks or self.coffs[i] != coff:
            raise ValueError("virtual offset names no block: %d" % coff)
        return i

    def read_voffset_range(self, vbeg: int, vend: int) -> bytes:
        """Decompressed bytes spanning two virtual offsets (the BAI chunk
        unit): from (vbeg>>16, vbeg&0xFFFF) up to (vend>>16, vend&0xFFFF)."""
        cb, ub = vbeg >> 16, vbeg & 0xFFFF
        ce, ue = vend >> 16, vend & 0xFFFF
        i0 = self.block_of_coffset(cb)
        if ue == 0:
            # end sits exactly at a block boundary: previous block suffices
            i1 = self.block_of_coffset(ce) if ce > cb else i0
            data = self.decompress_blocks(i0, max(i1, i0 + 1))
            stop = int(self.ucum[i1] - self.ucum[i0]) if i1 > i0 else \
                len(data)
        else:
            i1 = self.block_of_coffset(ce)
            data = self.decompress_blocks(i0, i1 + 1)
            stop = int(self.ucum[i1] - self.ucum[i0]) + ue
        return data[ub:stop]


def is_bgzf(path: str) -> bool:
    """True when `path` starts with a BGZF member (gzip magic + FEXTRA
    carrying the BC/BSIZE subfield).  Plain gzip lacks FEXTRA, so this
    cleanly splits the two single-file cases."""
    with open(path, "rb") as f:
        head = f.read(18)
    if len(head) < 18 or head[:2] != b"\x1f\x8b" or not head[3] & 4:
        return False
    (xlen,) = struct.unpack_from("<H", head, 10)
    xoff, xend = 12, min(12 + xlen, len(head))
    while xoff + 4 <= xend:
        si1, si2, slen = head[xoff], head[xoff + 1], \
            struct.unpack_from("<H", head, xoff + 2)[0]
        if si1 == 66 and si2 == 67 and slen == 2:
            return True
        xoff += 4 + slen
    return False


class BgzfStreamReader:
    """Sequential file-like reader over a BGZF file with BLOCK-PARALLEL
    inflate: a sliding window of blocks decompresses on a thread pool
    (zlib releases the GIL) ahead of the consumer.  This is what lets a
    bgzip'd coverage track beat single-stream gzip on multi-core hosts —
    the gzip FORMAT serializes inflate per stream; BGZF's independent
    <=64 KiB members don't (the same property the BAM reader exploits;
    reference analog: the bigwig/compressed tracks of
    shitflow/create-launch.pbs.sh).

    Streams through a plain buffered file handle — deliberately NOT the
    mmap-backed BgzfFile: resident pages of a whole-genome-sized mapping
    count toward peak RSS (a 16 GB track measured 42 GB peak through the
    mmap; the same lesson as the round-3 plain-text loader).  Peak here
    is the prefetch window only.

    Supports readinto(memoryview) + close + context manager — the shape
    cornetto_tpu.io.bed's windowed loaders consume.  raw_tell() reports
    COMPRESSED bytes consumed, mirroring a raw file handle's tell() under
    gzip.GzipFile so size projections keep working."""

    def __init__(self, path: str, nthreads: int = None, prefetch: int = None):
        import os
        self._f = open(path, "rb")
        n = nthreads or min(os.cpu_count() or 1, 8)
        self._ex = ThreadPoolExecutor(max_workers=n)
        self._depth = prefetch or 4 * n
        self._futs: List = []     # (future, csize) in-flight, in order
        self._eof = False
        self._cur = memoryview(b"")
        self._consumed_coff = 0
        self._closed = False

    def _next_block(self):
        """Read one compressed member off the file; None at EOF."""
        hdr = self._f.read(12)
        if len(hdr) < 12:
            self._eof = True
            if hdr:
                raise ValueError("truncated BGZF header")
            return None
        if hdr[:2] != b"\x1f\x8b" or not hdr[3] & 4:
            raise ValueError("bad BGZF member header")
        (xlen,) = struct.unpack_from("<H", hdr, 10)
        extra = self._f.read(xlen)
        bsize = None
        xoff = 0
        while xoff + 4 <= xlen:
            si1, si2, slen = extra[xoff], extra[xoff + 1], \
                struct.unpack_from("<H", extra, xoff + 2)[0]
            if si1 == 66 and si2 == 67 and slen == 2:
                bsize = struct.unpack_from("<H", extra, xoff + 4)[0] + 1
                break
            xoff += 4 + slen
        if bsize is None:
            raise ValueError("no BSIZE subfield in BGZF member")
        rest = self._f.read(bsize - 12 - xlen)
        if len(rest) != bsize - 12 - xlen:
            raise ValueError("truncated BGZF member")
        return hdr + extra + rest

    def _pump(self) -> None:
        while len(self._futs) < self._depth and not self._eof:
            blk = self._next_block()
            if blk is None:
                break
            self._futs.append(
                (self._ex.submit(zlib.decompress, blk, 31), len(blk)))

    def readinto(self, mv) -> int:
        mv = memoryview(mv)
        want = len(mv)
        got = 0
        while got < want:
            if not len(self._cur):
                self._pump()
                if not self._futs:
                    break
                fut, csize = self._futs.pop(0)
                self._cur = memoryview(fut.result())
                self._consumed_coff += csize
            n = min(want - got, len(self._cur))
            mv[got:got + n] = self._cur[:n]
            self._cur = self._cur[n:]
            got += n
        return got

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            parts = []
            buf = bytearray(1 << 22)
            while True:
                k = self.readinto(memoryview(buf))
                if k == 0:
                    return b"".join(parts)
                parts.append(bytes(buf[:k]))
        buf = bytearray(n)
        got = self.readinto(memoryview(buf))
        return bytes(buf[:got])

    def raw_tell(self) -> int:
        return self._consumed_coff

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._futs.clear()
            self._ex.shutdown(wait=False, cancel_futures=True)
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# BGZF writer
# ---------------------------------------------------------------------------

# htslib's block payload cap: 65280 uncompressed bytes always deflate to
# under the 65536-byte BSIZE limit even for incompressible data
_MAX_BLOCK = 65280


def _deflate_block(payload: bytes, level: int) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    body = co.compress(payload) + co.flush()
    bsize = 18 + len(body) + 8
    if bsize > 65536:
        raise ValueError("BGZF block overflow (%d bytes)" % bsize)
    return b"".join((
        b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff",      # gzip hdr, FEXTRA
        struct.pack("<H", 6),                              # XLEN
        b"BC", struct.pack("<H", 2),                       # BC subfield
        struct.pack("<H", bsize - 1),                      # BSIZE-1
        body,
        struct.pack("<II", zlib.crc32(payload), len(payload))))


class BgzfWriter:
    """Streaming BGZF writer with pipelined parallel deflate.

    Payloads are cut into <=65280-byte blocks; each block compresses
    independently (zlib releases the GIL), so a thread pool overlaps
    compression of queued blocks with the caller producing more — the
    write-side twin of BgzfFile's block-parallel inflate.  Tracks virtual
    offsets (`tell()`) so callers (the BAI builder) can index what they
    write without re-reading it.
    """

    def __init__(self, path: str, nthreads: int = None, level: int = 6):
        import os
        self.path = path
        self._f = open(path, "wb")
        self._level = level
        self._nthreads = nthreads or min(os.cpu_count() or 1, 8)
        self._ex = ThreadPoolExecutor(max_workers=self._nthreads)
        self._pending: List = []          # futures in write order
        self._max_pending = 4 * self._nthreads
        self._buf = bytearray()
        self._coff = 0                    # compressed bytes written+queued?
        self._closed = False

    def tell(self) -> int:
        """Virtual offset of the NEXT byte written: requires draining the
        compression pipeline to know the compressed offset."""
        self._drain()
        return (self._coff << 16) | len(self._buf)

    def _drain(self) -> None:
        for fut in self._pending:
            blk = fut.result()
            self._f.write(blk)
            self._coff += len(blk)
        self._pending = []

    def _submit(self, payload: bytes) -> None:
        self._pending.append(
            self._ex.submit(_deflate_block, payload, self._level))
        if len(self._pending) >= self._max_pending:
            self._drain()

    def write(self, data) -> None:
        self._buf += data
        while len(self._buf) >= _MAX_BLOCK:
            self._submit(bytes(self._buf[:_MAX_BLOCK]))
            del self._buf[:_MAX_BLOCK]

    def flush(self) -> None:
        """Force out a (possibly short) block at the current boundary."""
        if self._buf:
            self._submit(bytes(self._buf))
            self._buf.clear()
        self._drain()
        self._f.flush()

    def close(self) -> None:
        if self._closed:
            return
        self.flush()
        self._f.write(_EOF_MARKER)
        self._f.close()
        self._ex.shutdown()
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# BAI index
# ---------------------------------------------------------------------------

_PSEUDO_BIN = 37450


class BaiIndex:
    """Parsed .bai: per reference a bin->chunks map + 16-kb linear index."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            data = f.read()
        if data[:4] != b"BAI\x01":
            raise ValueError("not a BAI file: %s" % path)
        off = 4
        (n_ref,) = struct.unpack_from("<i", data, off)
        off += 4
        self.bins: List[Dict[int, List[Tuple[int, int]]]] = []
        self.linear: List[np.ndarray] = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", data, off)
            off += 4
            bmap: Dict[int, List[Tuple[int, int]]] = {}
            for _b in range(n_bin):
                bin_id, n_chunk = struct.unpack_from("<Ii", data, off)
                off += 8
                chunks = []
                for _c in range(n_chunk):
                    beg, end = struct.unpack_from("<QQ", data, off)
                    off += 16
                    chunks.append((beg, end))
                if bin_id != _PSEUDO_BIN:
                    bmap[bin_id] = chunks
            (n_intv,) = struct.unpack_from("<i", data, off)
            off += 4
            lin = np.frombuffer(data, dtype="<u8", count=n_intv,
                                offset=off).copy()
            off += 8 * n_intv
            self.bins.append(bmap)
            self.linear.append(lin)


def reg2bins(beg: int, end: int) -> List[int]:
    """All BAI bins overlapping [beg, end) (6-level binning, min shift 14)."""
    end -= 1
    out = [0]
    for shift, first in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        out.extend(range(first + (beg >> shift), first + (end >> shift) + 1))
    return out


def region_chunks(index: BaiIndex, ref_id: int, beg: int, end: int
                  ) -> List[Tuple[int, int]]:
    """Sorted, merged virtual-offset chunks possibly containing alignments
    overlapping [beg, end) on ref_id."""
    if ref_id < 0 or ref_id >= len(index.bins):
        return []
    bmap = index.bins[ref_id]
    lin = index.linear[ref_id]
    min_off = int(lin[beg >> 14]) if (beg >> 14) < len(lin) else 0
    chunks = []
    for b in reg2bins(beg, end):
        for cbeg, cend in bmap.get(b, ()):
            if cend > min_off:
                chunks.append((max(cbeg, min_off), cend))
    chunks.sort()
    merged: List[Tuple[int, int]] = []
    for cbeg, cend in chunks:
        if merged and cbeg <= merged[-1][1]:
            if cend > merged[-1][1]:
                merged[-1] = (merged[-1][0], cend)
        else:
            merged.append((cbeg, cend))
    return merged
