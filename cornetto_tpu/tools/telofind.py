"""telofind: report tandem telomere-motif runs per contig.

Reference behavior: src/find_telomere.c (find :44-74 — forward hits then
reverse-complement hits per contig; the intended scan-to-end semantics are
implemented rather than the reference's UB-reliant strstr loop, verified
equivalent on its outputs).
"""

import sys

import numpy as np

from cornetto_tpu.io.fasta import read_fastx
from cornetto_tpu.kernels.motif import (match_positions, revcomp_motif,
                                        tandem_runs)


def run(fasta_path: str, motif: str = "TTAGGG", out=None) -> None:
    out = out or sys.stdout
    rmotif = revcomp_motif(motif)
    k = len(motif)
    for rec in read_fastx(fasta_path):
        # disambiguate: uppercase (reference :76-81)
        seq = np.frombuffer(rec.seq.upper().encode("latin-1"), dtype=np.uint8)
        L = len(seq)
        for strand, m in ((0, motif), (1, rmotif)):
            for st, end, ln in tandem_runs(match_positions(seq, m), k):
                out.write("%s\t%d\t%d\t%d\t%d\t%d\n"
                          % (rec.name, L, strand, st, end, ln))


def main(argv) -> int:
    args = argv[1:] if argv and argv[0] == "telofind" else argv
    if len(args) < 1:
        sys.stderr.write("Error: invalid number of parameters\n")
        sys.stderr.write("Usage: find <input fasta> [optional sequence to "
                         "search for, default is vertebrate TTAGGG]\n")
        return 1
    motif = args[1] if len(args) >= 2 else "TTAGGG"
    run(args[0], motif)
    return 0
