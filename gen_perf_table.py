#!/usr/bin/env python3
"""Generate the README/ROADMAP performance prose FROM the checked-in
bench artifacts (round-4 verdict item 2: three consecutive rounds of
hand-synced numbers drifted; prose is now derived, not written).

Rewrites the delimited blocks
    <!-- perf:begin --> ... <!-- perf:end -->        (README.md)
    <!-- numbers:begin --> ... <!-- numbers:end -->  (ROADMAP.md)
from BENCH_KERNELS.json, BENCH_HEADLINE.json, SCALE_500MBP.json,
SCALE_3GBP.json and EVAL_ALIGNERFREE.json.

    python gen_perf_table.py            # rewrite in place
    python gen_perf_table.py --check    # exit 1 if anything would change

tests/test_perf_prose.py runs --check, so any number drift fails CI.
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _load(name):
    with open(os.path.join(HERE, name)) as f:
        return json.load(f)


def _fmt_gb(x):
    return "%.2f" % x if x is not None else "?"


def readme_block() -> str:
    K = _load("BENCH_KERNELS.json")
    H = _load("BENCH_HEADLINE.json")
    S5 = _load("SCALE_500MBP.json")
    S3 = _load("SCALE_3GBP.json")
    s5 = S5["stages"]
    s3 = S3["stages"]
    rows = []

    def row(w, ours, ref):
        rows.append("| %s | %s | %s |" % (w, ours, ref))

    nb5 = s5["noboringbits_ours"]
    ref5 = s5.get("noboringbits_reference_C")
    row("noboringbits end-to-end, 500 Mbp x 2 plain-text tracks "
        "(%.1f GB on disk, 2 cores; `SCALE_500MBP.json`, byte-identical "
        "output %s; auto two-pass streaming holds only the largest contig)"
        % (S5["track_bytes_on_disk"] / 1e9,
           S5.get("noboringbits_byte_identical_vs_reference")),
        "**%.1f s / %s GB peak RSS**" % (nb5["wall_s"],
                                         _fmt_gb(nb5["peak_rss_gb"])),
        "%.1f s / %s GB" % (ref5["wall_s"], _fmt_gb(ref5["peak_rss_gb"]))
        if ref5 else "n/a")

    nb3 = s3["noboringbits_ours"]
    lm3 = s3.get("noboringbits_ours_lowmem")
    cp3 = s3["create_panel"]
    cpl = s3.get("create_panel_lowmem")
    bgz = s3.get("noboringbits_bgzf")
    li3 = s3["livefish_index"]
    ours3 = ("noboringbits **%.0f s / %s GB**" %
             (nb3["wall_s"], _fmt_gb(nb3["peak_rss_gb"])))
    if lm3:
        ours3 += (" or **%.0f s / %s GB** with `--low-mem` two-pass "
                  "streaming (byte-identical=%s — a whole human genome's "
                  "coverage analysis in under 1 GB)"
                  % (lm3["wall_s"], _fmt_gb(lm3["peak_rss_gb"]),
                     lm3["identical_to_default_mode"]))
    if bgz:
        ours3 += ("; **%.0f s** on bgzip'd (BGZF) tracks — "
                  "block-parallel inflate, byte-identical=%s (%d-core "
                  "host: both cores already busy, the win scales with "
                  "cores on real nodes)"
                  % (bgz["wall_s"], bgz["identical_to_plain_mode"],
                     bgz["host_cores"]))
    ours3 += ("; create-panel **%.0f s / %s GB** (fun-windows is "
              "%.0f s of it)" % (cp3["wall_s"],
                                 _fmt_gb(cp3["peak_rss_gb"]),
                                 cp3["breakdown"]["fun-windows"]["wall_s"]))
    if cpl:
        ours3 += (" or **%.0f s / %s GB** with `--low-mem` "
                  "(panel byte-identical=%s)"
                  % (cpl["wall_s"], _fmt_gb(cpl["peak_rss_gb"]),
                     cpl["identical_to_default_mode"]))
    ours3 += ("; telostats **%.0f s / %s GB**; livefish index "
              "**%.0f s / %.1f GB**"
              % (s3["telostats"]["wall_s"],
                 _fmt_gb(s3["telostats"]["peak_rss_gb"]),
                 li3["wall_s"], li3["peak_rss_gb"]))
    if "device_table_gb" in li3:
        ours3 += (" (%.1f GB of that IS the on-device lookup table)"
                  % li3["device_table_gb"])
    row("3 Gbp (human-scale) whole-genome chain (`SCALE_3GBP.json`, "
        "2-core host, gz 1-bp tracks — %.0f GB on disk vs ~126 GB plain)"
        % (S3["track_bytes_on_disk"] / 1e9),
        ours3,
        "\"tens of gigabytes\" of RAM on a large-memory node "
        "(`docs/command.md:16`); panel jobs sized 16 cores / 64 GB on "
        "Gadi (`shitflow/recreate.pbs.sh:2-9`)")

    sd = K["sdust_pallas_dense"]
    row("sdust dense worst case (60%% satellite — where DUST actually "
        "fires): the DP itself as a lane-parallel Pallas kernel, "
        "bit-identical=%s" % sd.get("bit_identical_vs_DP"),
        "**%.2f Mbases/s on one chip = %.1fx the native DP, %.1fx the "
        "reference C** (`BENCH_KERNELS.json` sdust_pallas_dense; "
        "kernels/pallas_sdust.py)"
        % (sd["Mbases_per_s"], sd["speedup_vs_exact_DP"],
           sd["speedup_vs_reference_C"]),
        "%.2f Mbases/s" %
        K["sdust_dense_worst_case"]["reference_C_Mbases_per_s_same_box"])

    ds = K["decision_step_device"]
    # 113 B/read of 2-bit packed codes at the 450-bp chunk length: the
    # e2e rate implies the sustained upload bandwidth it demonstrated
    implied_MBps = H["value"] * 113 / 1e6
    row("adaptive-sampling decisions (new)",
        "**%.1f ms / 16k batch device-resident = %.1fM reads/s/chip** "
        "(`BENCH_KERNELS.json` decision_step_device); end-to-end through "
        "the dev-host tunnel the value IS the tunnel's upload bandwidth: "
        "**%s reads/s** this artifact — a sustained %.1f MB/s of 2-bit "
        "packed uploads, %.0f%% of the same run's transfer ceiling "
        "(`BENCH_HEADLINE.json`, regenerated by every bench.py run)"
        % (ds["ms_per_16k_batch"], ds["Mreads_per_s"],
           "{:,}".format(int(H["value"])), implied_MBps,
           100 * H["value"] / H["transfer_bound_value"]),
        "n/a (delegated to readfish)")

    e2 = K["e2e_stream_decisions"]
    row("livefish FASTQ->TSV streaming (parse, decide, format)",
        "**%s reads/s** this artifact (`BENCH_KERNELS.json` "
        "e2e_stream_decisions; native parser %.1f GB/s; rate tracks "
        "tunnel weather run-to-run)"
        % ("{:,}".format(int(e2["reads_per_s"])),
           K["fastq_pack_native_host"]["MB_per_s"] / 1e3),
        "n/a")

    cr = K["chunk_replay"]
    row("read-until replay, %d channels (`livefish replay --state "
        "device`: per-channel prefixes live on device, only new chunk "
        "bytes upload — %d B/channel/tick vs %d)"
        % (cr["channels"], cr["upload_B_per_chan_tick"]["device_state"],
           cr["upload_B_per_chan_tick"]["host_state"]),
        "**%.2fx** the host-state engine through the tunnel (3 reps "
        "each, device %s vs host %s reads/s, `BENCH_KERNELS.json` "
        "chunk_replay)"
        % (cr["speedup_device_vs_host"],
           "/".join("%.0f" % r for r in cr["device_state"]["reps"]),
           "/".join("%.0f" % r for r in cr["host_state"]["reps"])),
        "n/a (readfish)")

    mp = K["minimizer_extraction_pallas"]
    row("minimizer extraction (fused Pallas kernel)",
        "**%.1f Mreads/s/chip** = %.1f Gbases/s (%.1fx the XLA doubling "
        "form; `BENCH_KERNELS.json` minimizer_extraction_pallas)"
        % (mp["Mreads_per_s"], mp["Gbases_per_s"], mp["speedup_vs_xla"]),
        "n/a")

    li5 = s5["livefish_index"]
    row("whole-genome minimizer INDEX BUILD (native, `livefish index`)",
        "500 Mbp in **%.1f s / %.1f GB** (`SCALE_500MBP.json`)"
        % (li5["wall_s"], li5["peak_rss_gb"]),
        "n/a (readfish loads a minimap2 index)")

    lv = K["index_lookup_votes"]
    row("sharded-index lookup + vote (TWO independent 32-B gathers/query "
        "— the two-choice table holds ~2x the occupancy of single-choice "
        "at the same 0.5% overflow bound, halving table bytes; incl. "
        "ambiguity/2nd-occurrence stats + overflow-free split position "
        "sums)",
        "**%.0f Mqueries/s/chip** (`BENCH_KERNELS.json` "
        "index_lookup_votes)" % lv["Mqueries_per_s"],
        "n/a")

    ts = K["telo_scan_xla"]
    row("telomere motif scan (XLA)",
        "**%.1f Gbases/s/chip** = %.0f%% of the measured %.0f GB/s "
        "memcpy roofline on its 1 B/base minimum-IO model "
        "(`BENCH_KERNELS.json` telo_scan_xla)"
        % (ts["Gbases_per_s"], ts["pct_of_roofline"],
           K["elementwise_roofline_GBps"]),
        "n/a")

    head = ("| workload | this framework | reference C |\n"
            "|---|---|---|\n")
    tail = ("\nEvery number above is interpolated from a checked-in "
            "artifact by `gen_perf_table.py` (regenerate the artifacts: "
            "`python bench_kernels.py` and `python bench.py` on the TPU "
            "host, `python scale_test.py` for the scale rows; then "
            "`python gen_perf_table.py`).  `tests/test_perf_prose.py` "
            "fails if this block drifts from the artifacts.  The "
            "BASELINE north-star target is 1M reads/s on a 16-chip "
            "v5e-16 (62.5k/chip); one chip delivers %.1fx its share "
            "even through the dev tunnel (vs_baseline in "
            "`BENCH_HEADLINE.json`) and ~%.0fx device-resident.  "
            "`bench_breakdown.py`/`bench_probe*.py` decompose the "
            "decision step; `bench_scaling.py` reports SPMD overhead on "
            "the CPU simulator (NOT a scaling-efficiency measurement — "
            "that needs a real pod slice).\n"
            % (H["vs_baseline"],
               H["device_resident_reads_per_s"] / 62500.0))
    return head + "\n".join(rows) + "\n" + tail


def roadmap_block() -> str:
    K = _load("BENCH_KERNELS.json")
    H = _load("BENCH_HEADLINE.json")
    S5 = _load("SCALE_500MBP.json")
    S3 = _load("SCALE_3GBP.json")
    E = _load("EVAL_ALIGNERFREE.json")
    s3 = S3["stages"]
    s5 = S5["stages"]
    li3 = s3["livefish_index"]
    out = [
        "Current artifact numbers (generated by gen_perf_table.py — do "
        "not hand-edit):",
        "",
        "- headline decisions: %s reads/s/chip (a sustained %.1f MB/s "
        "of packed uploads), %.0f%% of the same run's transfer ceiling; "
        "device-resident %.1fM reads/s (`BENCH_HEADLINE.json`, "
        "`BENCH_KERNELS.json` decision_step_device)"
        % (
            "{:,}".format(int(H["value"])),
            H["value"] * 113 / 1e6,
            100 * H["value"] / H["transfer_bound_value"],
            K["decision_step_device"]["Mreads_per_s"]),
        "- e2e FASTQ->TSV stream: %s reads/s (`BENCH_KERNELS.json` "
        "e2e_stream_decisions)"
        % "{:,}".format(int(K["e2e_stream_decisions"]["reads_per_s"])),
        "- 500 Mbp noboringbits: %.1f s / %.2f GB vs reference C "
        "%.1f s / %.2f GB, byte-identical (`SCALE_500MBP.json`)"
        % (s5["noboringbits_ours"]["wall_s"],
           s5["noboringbits_ours"]["peak_rss_gb"],
           s5["noboringbits_reference_C"]["wall_s"],
           s5["noboringbits_reference_C"]["peak_rss_gb"]),
        "- 3 Gbp: noboringbits %.0f s / %.1f GB (low-mem %.0f s / "
        "%.2f GB); create-panel %.0f s / %.1f GB (fun-windows %.0f s)%s; "
        "telostats %.0f s; livefish index %.0f s / %.1f GB "
        "(`SCALE_3GBP.json`)"
        % (s3["noboringbits_ours"]["wall_s"],
           s3["noboringbits_ours"]["peak_rss_gb"],
           s3["noboringbits_ours_lowmem"]["wall_s"],
           s3["noboringbits_ours_lowmem"]["peak_rss_gb"],
           s3["create_panel"]["wall_s"],
           s3["create_panel"]["peak_rss_gb"],
           s3["create_panel"]["breakdown"]["fun-windows"]["wall_s"],
           ("; create-panel --low-mem %.0f s / %.2f GB"
            % (s3["create_panel_lowmem"]["wall_s"],
               s3["create_panel_lowmem"]["peak_rss_gb"])
            if "create_panel_lowmem" in s3 else ""),
           s3["telostats"]["wall_s"],
           li3["wall_s"], li3["peak_rss_gb"]),
        "- 500 Mbp livefish index build: %.1f s / %.1f GB "
        "(`SCALE_500MBP.json`)"
        % (s5["livefish_index"]["wall_s"],
           s5["livefish_index"]["peak_rss_gb"]),
        "- sdust Pallas dense: %.2f Mb/s, %.1fx reference C, "
        "bit-identical (`BENCH_KERNELS.json` sdust_pallas_dense)"
        % (K["sdust_pallas_dense"]["Mbases_per_s"],
           K["sdust_pallas_dense"]["speedup_vs_reference_C"]),
        "- chunk replay device vs host: %.2fx (3 reps each, "
        "`BENCH_KERNELS.json` chunk_replay)"
        % K["chunk_replay"]["speedup_device_vs_host"],
        "- index lookup+votes: %.0f Mq/s, table %.1f MB at bench scale "
        "(`BENCH_KERNELS.json` index_lookup_votes)"
        % (K["index_lookup_votes"]["Mqueries_per_s"],
           K["index_lookup_votes"]["table_MB"]),
        "- aligner-free eval: panel Jaccard %.4f, binned-depth p95 rel "
        "err %.3f, repeat source kept fun (`EVAL_ALIGNERFREE.json`)"
        % (E["panel_jaccard"], E["total_track_bin_rel_err_p95"]),
    ]
    if "noboringbits_bgzf" in s3:
        b = s3["noboringbits_bgzf"]
        out.append(
            "- 3 Gbp BGZF tracks: noboringbits %.0f s (plain-gz mode "
            "%.0f s on %d cores — both cores already busy with two "
            "concurrent tracks; the block-parallel win scales with "
            "cores), byte-identical (`SCALE_3GBP.json` "
            "noboringbits_bgzf)"
            % (b["wall_s"], s3["noboringbits_ours"]["wall_s"],
               b["host_cores"]))
    return "\n".join(out) + "\n"


def _splice(path: str, begin: str, end: str, body: str) -> str:
    with open(path) as f:
        text = f.read()
    i = text.index(begin) + len(begin)
    j = text.index(end)
    return text[:i] + "\n" + body + text[j:]


def main() -> int:
    check = "--check" in sys.argv
    changed = []
    for path, begin, end, body in (
            (os.path.join(HERE, "README.md"),
             "<!-- perf:begin -->", "<!-- perf:end -->", readme_block()),
            (os.path.join(HERE, "ROADMAP.md"),
             "<!-- numbers:begin -->", "<!-- numbers:end -->",
             roadmap_block())):
        new = _splice(path, begin, end, body)
        with open(path) as f:
            old = f.read()
        if new != old:
            changed.append(os.path.basename(path))
            if not check:
                with open(path, "w") as f:
                    f.write(new)
    if check and changed:
        sys.stderr.write("perf prose drifted from artifacts in: %s\n"
                         "run: python gen_perf_table.py\n"
                         % ", ".join(changed))
        return 1
    if changed:
        sys.stderr.write("rewrote: %s\n" % ", ".join(changed))
    return 0


if __name__ == "__main__":
    sys.exit(main())
