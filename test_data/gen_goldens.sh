#!/bin/bash
# Generate golden outputs for the byte-parity test suite by running the
# *reference C binary* (built from the read-only mount at /root/reference)
# on the deterministic synthetic inputs from gen_synth.py.
#
# The goldens are checked in; tests diff against them without needing the
# reference or a C toolchain at test time.  Regenerate with:
#   python3 test_data/gen_synth.py && bash test_data/gen_goldens.sh
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
SYNTH=$HERE/synth
GOLD=$HERE/golden
REF=${REF:-/root/reference}
BUILD=/tmp/refbuild_golden

if [ ! -x $BUILD/cornetto ]; then
    rm -rf $BUILD && mkdir -p $BUILD/build
    cp -r $REF/src $REF/Makefile $BUILD/
    (cd $BUILD && make -j8 >/dev/null)
fi
C=$BUILD/cornetto
mkdir -p $GOLD
cd $GOLD

# --- boringbits / noboringbits ---------------------------------------------
$C boringbits $SYNTH/cov-total.bg -q $SYNTH/cov-mq20.bg \
    -m 10000 -e 1000 -L 0.6 -Q 0.6 -H 1.6 > boring_t1.txt 2>/dev/null
$C noboringbits -H 2.5 -L 0.5 -Q 0.5 $SYNTH/cov-total.bg -q $SYNTH/cov-mq20.bg \
    -m 10000 -e 1000 > fun_t2.txt 2>/dev/null
$C noboringbits $SYNTH/cov-total.bg -q $SYNTH/cov-mq20.bg > fun_default.txt 2>/dev/null
$C boringbits $SYNTH/cov-total.bg -q $SYNTH/cov-mq20.bg -w 999 -i 37 -m 20000 -e 3000 \
    > boring_odd.txt 2>/dev/null

# --- telomere group ---------------------------------------------------------
$C telofind $SYNTH/asm.fasta > telofind.txt 2>/dev/null
$C telofind $SYNTH/asm.fasta CCCTAA > telofind_ccctaa.txt 2>/dev/null
awk '{print $1"\t"$(NF-4)"\t"$(NF-3)"\t"$(NF-2)"\t"$(NF-1)"\t"$NF}' telofind.txt > telomere.txt
$C fa2bed $SYNTH/asm.fasta > fa2bed.txt 2>/dev/null
awk '{print $1"\t"$3}' fa2bed.txt > lens.txt
$C telowin telomere.txt 99.9 0.4 > telowin.txt 2>/dev/null
$C telowin telomere.txt 95 0.3 > telowin2.txt 2>/dev/null
$C sdust $SYNTH/asm.fasta > sdust.txt 2>/dev/null
$C sdust -w 32 -t 14 $SYNTH/asm.fasta > sdust_w32t14.txt 2>/dev/null
$C telobreaks lens.txt sdust.txt telomere.txt > telobreaks.txt 2>/dev/null

# --- misc -------------------------------------------------------------------
$C seq $SYNTH/reads.fastq > seq_30k.txt 2> seq_30k.stderr
$C seq -m 1000 $SYNTH/reads.fastq > seq_1k.txt 2> seq_1k.stderr
grep -v '^\[' seq_30k.stderr > seq_30k.stderr.tmp && mv seq_30k.stderr.tmp seq_30k.stderr
grep -v '^\[' seq_1k.stderr > seq_1k.stderr.tmp && mv seq_1k.stderr.tmp seq_1k.stderr

# --- eval group -------------------------------------------------------------
$C nx $SYNTH/asm.fasta > nx.txt 2>/dev/null
$C nx -g 200K $SYNTH/asm.fasta > ngx.txt 2>/dev/null
$C report $SYNTH/asm.fasta $SYNTH/asm.fasta > report.txt 2>/dev/null

# telomere-ends bed for asmstats/telocontigs (deterministic, hand-rolled)
printf 'ctg1\t0\t723\nctg1\t42000\t42597\nctg2\t20000\t20540\n' > telo.bed
$C telocontigs $SYNTH/asm.fasta telo.bed > telocontigs.txt 2>/dev/null

# --- dotplot group ----------------------------------------------------------
$C fixasm $SYNTH/asm.fasta $SYNTH/asm_to_ref.paf -r fixasm_report.tsv \
    -m fixasm_missing.txt -w fixasm_fixed.paf > fixasm_fixed.fasta 2> fixasm.stderr
grep -v '^\[' fixasm.stderr > fixasm.stderr.tmp && mv fixasm.stderr.tmp fixasm.stderr
$C minidot fixasm_fixed.paf -f 2 > minidot.eps 2>/dev/null
$C minidot $SYNTH/asm_to_ref.paf > minidot_raw.eps 2>/dev/null
$C minidot -m 50 -i 0.05 -s 500 -w 800 -d $SYNTH/asm_to_ref.paf > minidot_opts.eps 2>/dev/null

# --- asmstats ---------------------------------------------------------------
$C asmstats fixasm_fixed.paf telo_fixed.bed -r fixasm_report.tsv > /dev/null 2>&1 || true
# build a telo bed in fixed-name space from the report (ctg1/ctg2 renamed)
awk -F'\t' 'NR==1{print $4"\t0\t723\n"$4"\t42000\t42597"} NR==2{print $4"\t20000\t20540"}' \
    fixasm_report.tsv > telo_fixed.bed
$C asmstats fixasm_fixed.paf telo_fixed.bed -r <(awk -F'\t' '{print $4"\t"$2}' fixasm_report.tsv) \
    > /dev/null 2>&1 || true
awk -F'\t' '{print $4"\t"$2}' fixasm_report.tsv > report_fixed.tsv
$C asmstats fixasm_fixed.paf telo_fixed.bed -r report_fixed.tsv > asmstats.txt 2>/dev/null
$C asmstats -s human1 fixasm_fixed.paf telo_fixed.bed -r report_fixed.tsv > asmstats_human1.txt 2>/dev/null

echo "goldens written to $GOLD"
