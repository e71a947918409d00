"""sdust CLI (reference: src/sdust/sdust.c:179-207).

Contigs are masked on a thread pool (the native DP is a ctypes call and
releases the GIL), with a bounded in-flight window so memory stays at
O(workers) contigs; rows are written in FASTA order, byte-identical to the
serial run.  The reference's sdust is single-threaded — its pthread pool
(src/thread.c:48-156) is never wired to any subcommand."""

import os
import sys
from collections import deque
from concurrent.futures import ThreadPoolExecutor

from cornetto_tpu.io.fasta import read_fastx
from cornetto_tpu.native.sdust import sdust


def run(fasta_path: str, T: int = 20, W: int = 64, out=None,
        workers: int = None, backend: str = "host") -> None:
    """backend "device" runs the lane-parallel Pallas DP per contig
    (kernels.pallas_sdust — bit-identical; 10x the host DP on dense
    satellite input, where DUST actually fires); "host" is the native
    thread-pool path."""
    out = out or sys.stdout
    nw = workers or os.cpu_count() or 1
    if backend == "device":
        from cornetto_tpu.kernels.pallas_sdust import sdust_pallas

        def _mask(item):
            name, seq = item
            return name, sdust_pallas(seq.encode("latin-1"), T=T, W=W)
        # serial over contigs: the device is the parallel axis
        for rec in read_fastx(fasta_path):
            name, ivals = _mask((rec.name, rec.seq))
            if ivals:
                out.write("".join("%s\t%d\t%d\n" % (name, a, b)
                                  for a, b in ivals))
        return

    def _mask(item):
        name, seq = item
        return name, sdust(seq.encode("latin-1"), T=T, W=W)

    def _emit(fut_name_ivals):
        name, ivals = fut_name_ivals.result()
        if ivals:
            out.write("".join("%s\t%d\t%d\n" % (name, a, b)
                              for a, b in ivals))

    with ThreadPoolExecutor(max_workers=nw) as ex:
        inflight = deque()
        for rec in read_fastx(fasta_path):
            inflight.append(ex.submit(_mask, (rec.name, rec.seq)))
            while len(inflight) > 2 * nw:
                _emit(inflight.popleft())
        while inflight:
            _emit(inflight.popleft())


def main(argv) -> int:
    from cornetto_tpu.utils.parsing import c_atoi
    W, T = 64, 20
    backend = "host"
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
        elif a.startswith("--backend"):
            backend = a.split("=", 1)[1] if "=" in a else argv[i + 1]
            i += 1 if "=" in a else 2
        else:
            args.append(a); i += 1
    if not args:
        sys.stderr.write("Usage: sdust [-w %d] [-t %d] "
                         "[--backend host|device] <in.fa>\n" % (W, T))
        return 1
    run(args[0], T=T, W=W, backend=backend)
    return 0
