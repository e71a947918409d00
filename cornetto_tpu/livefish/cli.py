"""`cornetto livefish` subcommands: index build, streaming decisions,
readfish-config generation."""

import sys

import numpy as np

from cornetto_tpu.utils import logging as log


def _cmd_index(argv) -> int:
    import getopt as _getopt
    from cornetto_tpu.dist.checkpoint import save_index
    from cornetto_tpu.io.bed import read_bed3
    from cornetto_tpu.io.fasta import read_fastx
    from cornetto_tpu.livefish.index import build_index, build_panel_mask
    opts, args = _getopt.gnu_getopt(argv, "o:s:p:k:w:",
                                    ["output=", "shards=", "panel=",
                                     "kmer=", "window="])
    out_path = "livefish_index"
    shards = 1
    panel_path = None
    k, w = 15, 10
    for flag, val in opts:
        if flag in ("-o", "--output"):
            out_path = val
        elif flag in ("-s", "--shards"):
            shards = int(val)
        elif flag in ("-p", "--panel"):
            panel_path = val
        elif flag in ("-k", "--kmer"):
            k = int(val)
        elif flag in ("-w", "--window"):
            w = int(val)
    if len(args) != 1:
        sys.stderr.write("Usage: cornetto livefish index <draft.fasta> "
                         "[-o out] [-s shards] [-p panel.bed]\n")
        return 1
    contigs = {rec.name: rec.seq for rec in read_fastx(args[0])}
    idx = build_index(contigs, n_shards=shards, k=k, w=w)
    panel = None
    if panel_path:
        panel = build_panel_mask(idx, read_bed3(panel_path))
    save_index(out_path, idx, panel_mask=panel)
    log.info("index: %d shards x %d slots, %d contigs -> %s.npz"
             % (idx.n_shards, idx.hashes.shape[1],
                len(idx.contig_names), out_path))
    return 0


def _cmd_run(argv) -> int:
    import getopt as _getopt
    from cornetto_tpu.dist.checkpoint import load_index
    from cornetto_tpu.io.bed import read_bed3
    from cornetto_tpu.livefish.decide import SingleChipEngine
    from cornetto_tpu.livefish.index import build_panel_mask
    from cornetto_tpu.livefish.stream import stream_decisions
    opts, args = _getopt.gnu_getopt(argv, "b:l:p:",
                                    ["batch=", "read-len=", "panel="])
    batch, read_len = 4096, 450
    panel_path = None
    for flag, val in opts:
        if flag in ("-b", "--batch"):
            batch = int(val)
        elif flag in ("-l", "--read-len"):
            read_len = int(val)
        elif flag in ("-p", "--panel"):
            panel_path = val
    if len(args) != 2:
        sys.stderr.write("Usage: cornetto livefish run <index> <reads.fastq> "
                         "[-b batch] [-l read_len] [-p panel.bed]\n")
        return 1
    idx, panel, _ = load_index(args[0])
    if panel_path:
        panel = build_panel_mask(idx, read_bed3(panel_path))
    if panel is None:
        log.die("no panel: build the index with -p or pass -p here")
    eng = SingleChipEngine(idx, panel)
    eng.contig_names = idx.contig_names
    total, accepted = stream_decisions(eng, args[1], batch=batch,
                                       read_len=read_len)
    sys.stderr.write("reads: %d\taccepted: %d\trejected: %d\n"
                     % (total, accepted, total - accepted))
    return 0


def _cmd_toml(argv) -> int:
    from cornetto_tpu.io.readfish import write_readfish_toml
    if len(argv) != 2:
        sys.stderr.write("Usage: cornetto livefish toml <ref.mmi> "
                         "<targets.csv>\n")
        return 1
    write_readfish_toml(sys.stdout, reference_mmi=argv[0],
                        targets_csv=argv[1])
    return 0


def main(argv) -> int:
    if not argv:
        sys.stderr.write("Usage: cornetto livefish <index|run|toml> ...\n")
        return 1
    cmd, rest = argv[0], argv[1:]
    if cmd == "index":
        return _cmd_index(rest)
    if cmd == "run":
        return _cmd_run(rest)
    if cmd == "toml":
        return _cmd_toml(rest)
    sys.stderr.write("Unknown livefish command %s\n" % cmd)
    return 1
