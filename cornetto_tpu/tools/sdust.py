"""sdust CLI (reference: src/sdust/sdust.c:179-207)."""

import sys

from cornetto_tpu.io.fasta import read_fastx
from cornetto_tpu.native.sdust import sdust


def run(fasta_path: str, T: int = 20, W: int = 64, out=None) -> None:
    out = out or sys.stdout
    for rec in read_fastx(fasta_path):
        for a, b in sdust(rec.seq.encode("latin-1"), T=T, W=W):
            out.write("%s\t%d\t%d\n" % (rec.name, a, b))


def main(argv) -> int:
    from cornetto_tpu.utils.parsing import c_atoi
    W, T = 64, 20
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-w":
            W = c_atoi(argv[i + 1]); i += 2
        elif a.startswith("-w"):
            W = c_atoi(a[2:]); i += 1
        elif a == "-t":
            T = c_atoi(argv[i + 1]); i += 2
        elif a.startswith("-t"):
            T = c_atoi(a[2:]); i += 1
        else:
            args.append(a); i += 1
    if not args:
        sys.stderr.write("Usage: sdust [-w %d] [-t %d] <in.fa>\n" % (W, T))
        return 1
    run(args[0], T=T, W=W)
    return 0
