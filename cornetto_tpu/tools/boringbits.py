"""boringbits / noboringbits: coverage-window classification.

Reference behavior: src/boringbits_main.c (the_boring_bits :483-536,
print_fun_bits :425-445, print_boring_bits :463-481).  Outputs are
byte-identical to the C tool; the window scan runs on device via the
kernels.window_sum sliding-sum kernel instead of the C scalar loop.
"""

import sys
from dataclasses import dataclass

import numpy as np

from cornetto_tpu.io.bed import read_bedgraph_pair
from cornetto_tpu.kernels import window_sum
from cornetto_tpu.utils import logging as log
from cornetto_tpu.utils.cformat import c_round


@dataclass
class BoringbitsOptions:
    window_size: int = 2500
    window_inc: int = 50
    low_cov_thresh: float = 0.4
    high_cov_thresh: float = 2.5
    low_mq_cov_thresh: float = 0.4
    min_ctg_len: int = 1000000
    edge_len: int = 100000
    boring: bool = True
    backend: str = "auto"  # "auto" | "jax" | "numpy"
    # accept run-length bedgraph rows (aligner-free approx-panel tracks
    # from livefish.coverage); the strict default is reference parity
    ranged_bedgraph: bool = False


def run(cov_total_path: str, cov_mq_path: str, opt: BoringbitsOptions,
        out=None) -> None:
    out = out or sys.stdout
    depths = read_bedgraph_pair(cov_total_path, cov_mq_path,
                                ranged=opt.ranged_bedgraph)

    sys.stderr.write("Number of contigs: %d\n" % len(depths.names))
    sys.stderr.write("Average depth: %d\n" % depths.mean_depth)
    sys.stderr.write("Average mq depth: %d\n" % depths.mean_mq_depth)
    sys.stderr.write("Window size: %d\n" % opt.window_size)
    sys.stderr.write("Window increment: %d\n" % opt.window_inc)
    sys.stderr.write("Low coverage threshold: %.1fx%d\n"
                     % (opt.low_cov_thresh, depths.mean_depth))
    sys.stderr.write("High coverage threshold: %.1fx%d\n"
                     % (opt.high_cov_thresh, depths.mean_depth))
    sys.stderr.write("Low mapq coverage threshold: %.1f\n"
                     % opt.low_mq_cov_thresh)
    sys.stderr.write("Min contig length: %d\n" % opt.min_ctg_len)
    sys.stderr.write("Edge length: %d\n" % opt.edge_len)

    stats_fn = (window_sum.window_stats_jax
                if window_sum.resolve_backend(opt.backend) == "jax"
                else window_sum.window_stats_numpy)

    # The C thresholds are computed in *float* arithmetic (the option fields
    # are C floats — src/boringbits_main.c:71-73), then round()ed as double:
    thresh_low = c_round(float(np.float32(opt.low_cov_thresh)
                               * np.float32(depths.mean_depth)))
    thresh_high = c_round(float(np.float32(opt.high_cov_thresh)
                                * np.float32(depths.mean_depth)))

    for name, depth, mq_depth in zip(depths.names, depths.depth,
                                     depths.mq_depth):
        length = len(depth)
        st, end, d, mq = stats_fn(depth.astype(np.int32),
                                  mq_depth.astype(np.int32),
                                  opt.window_size, opt.window_inc)
        if opt.boring:
            _print_boring(out, name, length, st, end, d, mq,
                          thresh_low, thresh_high, opt)
        else:
            _print_fun(out, name, length, st, end, d, mq,
                       thresh_low, thresh_high, opt)


def _violations(st, end, d, mq, thresh_low, thresh_high, low_mq_factor):
    # mq/depth < factor with C double division against a C *float* threshold
    # (promoted to double — src/boringbits_main.c:439); depth==0 gives
    # inf/nan: 0/0.0 is NaN (comparison false), x/0.0 is +inf (false).
    factor = float(np.float32(low_mq_factor))
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = mq.astype(np.float64) / d.astype(np.float64)
        low_mq = ratio < factor
        low_mq = np.where(np.isnan(ratio), False, low_mq)
    return (d < thresh_low) | (d > thresh_high) | low_mq


def _print_fun(out, name, ctg_len, st, end, d, mq, thresh_low, thresh_high,
               opt: BoringbitsOptions):
    # reference: print_fun_bits (src/boringbits_main.c:425-445).  NB quirk:
    # small contigs print 0..min_ctg_len even when shorter than that.
    if ctg_len < opt.min_ctg_len:
        out.write("%s\t%d\t%d\t.\t.\n" % (name, 0, opt.min_ctg_len))
        return
    out.write("%s\t%d\t%d\t.\t.\n" % (name, 0, opt.edge_len))
    out.write("%s\t%d\t%d\t.\t.\n" % (name, ctg_len - opt.edge_len, ctg_len))
    viol = _violations(st, end, d, mq, thresh_low, thresh_high,
                       opt.low_mq_cov_thresh)
    idx = np.flatnonzero(viol)
    if len(idx):
        out.write("".join("%s\t%d\t%d\t%d\t%d\n"
                          % (name, st[j], end[j], d[j], mq[j])
                          for j in idx))


def _print_boring(out, name, ctg_len, st, end, d, mq, thresh_low, thresh_high,
                  opt: BoringbitsOptions):
    # reference: print_boring_bits (src/boringbits_main.c:463-481)
    if ctg_len <= opt.min_ctg_len:
        return
    viol = _violations(st, end, d, mq, thresh_low, thresh_high,
                       opt.low_mq_cov_thresh)
    inner = (st > opt.edge_len) & (end < ctg_len - opt.edge_len)
    keep = inner & ~viol
    idx = np.flatnonzero(keep)
    if len(idx):
        out.write("".join("%s\t%d\t%d\t%d\t%d\n"
                          % (name, st[j], end[j], d[j], mq[j])
                          for j in idx))


def iter_fun_windows(cov_total_path: str, cov_mq_path: str,
                     opt: BoringbitsOptions):
    """Yield (name, st, end) for threshold-violating windows of contigs
    >= min_ctg_len — i.e. the noboringbits rows whose 4th column is numeric,
    as selected by the create-cornetto pipeline's awk filter
    (reference: scripts/create-cornetto.sh:41)."""
    depths = read_bedgraph_pair(cov_total_path, cov_mq_path,
                                ranged=opt.ranged_bedgraph)
    stats_fn = (window_sum.window_stats_jax
                if window_sum.resolve_backend(opt.backend) == "jax"
                else window_sum.window_stats_numpy)
    thresh_low = c_round(float(np.float32(opt.low_cov_thresh)
                               * np.float32(depths.mean_depth)))
    thresh_high = c_round(float(np.float32(opt.high_cov_thresh)
                                * np.float32(depths.mean_depth)))
    for name, depth, mq_depth in zip(depths.names, depths.depth,
                                     depths.mq_depth):
        if len(depth) < opt.min_ctg_len:
            continue
        st, end, d, mq = stats_fn(depth.astype(np.int32),
                                  mq_depth.astype(np.int32),
                                  opt.window_size, opt.window_inc)
        viol = _violations(st, end, d, mq, thresh_low, thresh_high,
                           opt.low_mq_cov_thresh)
        for j in np.flatnonzero(viol):
            yield (name, int(st[j]), int(end[j]))


def main(argv, boring: bool) -> int:
    """CLI entry matching `cornetto boringbits|noboringbits`
    (reference: src/boringbits_main.c:558-660)."""
    import getopt as _getopt
    from cornetto_tpu.utils.parsing import parse_num_suffix, c_atoi, c_atof
    opt = BoringbitsOptions(boring=boring)
    covmq = None
    fp_help = sys.stderr
    try:
        opts, args = _getopt.gnu_getopt(
            argv, "t:B:K:v:o:q:Q:H:L:w:i:e:m:hV",
            ["threads=", "batchsize=", "max-bytes=", "verbose=", "help",
             "version", "output=", "debug-break=", "profile-cpu=", "accel=",
             "qual=", "window-size=", "window-inc=", "low-thresh=",
             "high-thresh=", "low-mq-thresh=", "min-ctg-len=", "edge-len=",
             "backend="])
    except _getopt.GetoptError as e:
        log.error(str(e))
        return 1
    for flag, val in opts:
        if flag in ("-q", "--qual"):
            covmq = val
        elif flag in ("-w", "--window-size"):
            opt.window_size = c_atoi(val)
        elif flag in ("-i", "--window-inc"):
            opt.window_inc = c_atoi(val)
        elif flag in ("-L", "--low-thresh"):
            opt.low_cov_thresh = c_atof(val)
        elif flag in ("-H", "--high-thresh"):
            opt.high_cov_thresh = c_atof(val)
        elif flag in ("-Q", "--low-mq-thresh"):
            opt.low_mq_cov_thresh = c_atof(val)
        elif flag in ("-m", "--min-ctg-len"):
            opt.min_ctg_len = c_atoi(val)
        elif flag in ("-e", "--edge-len"):
            opt.edge_len = c_atoi(val)
        elif flag in ("-v", "--verbose"):
            log.set_log_level(c_atoi(val))
        elif flag == "--backend":
            opt.backend = val
        elif flag in ("-V", "--version"):
            from cornetto_tpu.version import __version__
            sys.stdout.write("cornetto-tpu %s\n" % __version__)
            return 0
        elif flag in ("-h", "--help"):
            fp_help = sys.stdout
        elif flag == "-B":
            parse_num_suffix(val)
    if len(args) != 1 or fp_help is sys.stdout or covmq is None:
        _help(fp_help, opt)
        return 0 if fp_help is sys.stdout else 1
    run(args[0], covmq, opt)
    return 0


def _help(fp, opt: BoringbitsOptions):
    fp.write("Usage: cornetto boringbits cov-total.bg -q cov-mq20.bg\n")
    fp.write("\nbasic options:\n")
    fp.write("   -q FILE                    depth file with high mapq read coverage\n")
    fp.write("   -w INT                     window size [%d]\n" % opt.window_size)
    fp.write("   -i INT                     window increment [%d]\n" % opt.window_inc)
    fp.write("   -L FLOAT                   low coverage threshold factor [%.1f]\n" % opt.low_cov_thresh)
    fp.write("   -H FLOAT                   high coverage threshold factor [%.1f]\n" % opt.high_cov_thresh)
    fp.write("   -Q FLOAT                   mapq low coverage threshold factor [%.1f]\n" % opt.low_mq_cov_thresh)
    fp.write("   -m INT                     minimum contig length [%d]\n" % opt.min_ctg_len)
    fp.write("   -e INT                     edge length to ignore [%d]\n" % opt.edge_len)
    fp.write("   -h                         help\n")
    fp.write("   --verbose INT              verbosity level [%d]\n" % log.get_log_level())
