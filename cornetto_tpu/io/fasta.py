"""FASTA/FASTQ streaming reader with kseq-equivalent record semantics
(reference: src/kseq.h — name is up to the first whitespace, the rest of the
header line is the comment, sequence lines are concatenated; works on plain
or gzip-compressed files)."""

import gzip
import io
from dataclasses import dataclass
from typing import Iterator, Optional


def open_maybe_gzip(path: str, mode: str = "rt"):
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, mode)
    return open(path, mode)


@dataclass
class FastxRecord:
    name: str
    comment: Optional[str]
    seq: str
    qual: Optional[str] = None

    def __len__(self) -> int:
        return len(self.seq)


def read_fastx(path: str) -> Iterator[FastxRecord]:
    """Stream records from a FASTA or FASTQ file (auto-detected per record
    by its '>' / '@' header, like kseq).  Plain FASTA takes a whole-file
    split fast path; FASTQ streams line-by-line."""
    with open_maybe_gzip(path) as fp:
        first = fp.read(1)
        if not first:
            return
        if first == ">":
            yield from _parse_fasta_fast(fp)
        else:
            import itertools
            yield from parse_fastx(itertools.chain([first + fp.readline()],
                                                   fp))


def _parse_fasta_fast(fp) -> Iterator[FastxRecord]:
    """Whole-file FASTA parse: the leading '>' has been consumed."""
    data = fp.read()
    for chunk in data.split("\n>"):
        nl = chunk.find("\n")
        if nl < 0:
            header, body = chunk, ""
        else:
            header, body = chunk[:nl], chunk[nl + 1:]
        header = header.rstrip("\r")
        name, comment = _split_ws(header)
        seq = body.replace("\n", "")
        if "\r" in seq:
            seq = seq.replace("\r", "")
        yield FastxRecord(name, comment, seq, None)


def parse_fastx(fp) -> Iterator[FastxRecord]:
    header = None
    for line in fp:
        line = line.rstrip("\r\n")
        if line.startswith(">") or line.startswith("@"):
            header = line
            break
    if header is None:
        return
    while header is not None:
        is_fastq = header.startswith("@")
        hdr = header[1:]
        sp = _split_ws(hdr)
        name, comment = sp
        seq_parts = []
        qual = None
        header = None
        if is_fastq:
            for line in fp:
                line = line.rstrip("\r\n")
                if line.startswith("+"):
                    break
                seq_parts.append(line)
            seq = "".join(seq_parts)
            qual_parts = []
            qlen = 0
            for line in fp:
                line = line.rstrip("\r\n")
                qual_parts.append(line)
                qlen += len(line)
                if qlen >= len(seq):
                    break
            qual = "".join(qual_parts)
            for line in fp:
                line = line.rstrip("\r\n")
                if line.startswith("@") or line.startswith(">"):
                    header = line
                    break
        else:
            for line in fp:
                line = line.rstrip("\r\n")
                if line.startswith(">") or line.startswith("@"):
                    header = line
                    break
                seq_parts.append(line)
            seq = "".join(seq_parts)
        yield FastxRecord(name, comment, seq, qual)


def _split_ws(hdr: str):
    for i, ch in enumerate(hdr):
        if ch in " \t":
            return hdr[:i], hdr[i + 1:]
    return hdr, None


def write_fasta_record(out, name: str, seq: str) -> None:
    """Single-line sequence output, as the reference's fixasm writes
    (reference: src/fixasm.c:395)."""
    out.write(">%s\n%s\n" % (name, seq))
