#!/bin/bash
# Composed pipeline goldens: run the REFERENCE'S OWN SHELL SCRIPTS
# (reference: scripts/create-cornetto.sh, recreate-cornetto.sh,
# create-hapnetto.sh, recreate-hapnetto.sh, telostats.sh) end-to-end on the
# pipeline-scale synthetic inputs, and check in every tmp-dir intermediate
# plus the final panel files.  This matches the reference's own test bar
# (reference: test/realtest.sh:53-83 diffs composed telostats outputs and
# the whole recreate tmp dir).
#
# Tool substitutions, via the scripts' documented env overrides:
#   CORNETTO  -> the reference C binary, compiled from /root/reference/src
#   BEDTOOLS  -> test_data/bedtools_lite.c (real bedtools + its source are
#                unavailable here: no network egress).  bedtools_lite is an
#                independently written clone of the 4 ops the scripts use,
#                cross-validated against cornetto_tpu.intervals.algebra on
#                randomized interval sets (tests/test_bedtools_lite_xval.py).
#   MINIMAP2  -> a shim that emits the ground-truth hap->primary PAF from
#                gen_synth_pipe.py (hap assemblies are constructed as exact
#                segment copies of the primary, so the PAF is the true
#                alignment by construction; minimap2 itself is external to
#                both the reference and this framework).
#
# Everything else (awk, GNU sort, cut, uniq, wc) is the genuine article.
#
# Regenerate: python3 test_data/gen_synth_pipe.py && bash test_data/gen_pipeline_goldens.sh
set -e
export LC_ALL=C
HERE=$(cd "$(dirname "$0")" && pwd)
SYNTH=$HERE/synth_pipe
GOLD=$HERE/golden/pipelines
REF=${REF:-/root/reference}
BUILD=/tmp/refbuild_golden
SCRATCH=$(mktemp -d /tmp/pipegold.XXXXXX)
trap "rm -rf $SCRATCH" EXIT

test -f $SYNTH/pasm.fasta || { echo "run gen_synth_pipe.py first"; exit 1; }

# --- reference binary --------------------------------------------------
if [ ! -x $BUILD/cornetto ]; then
    rm -rf $BUILD && mkdir -p $BUILD/build
    cp -r $REF/src $REF/Makefile $BUILD/
    (cd $BUILD && make -j8 >/dev/null)
fi
export CORNETTO=$BUILD/cornetto

# --- bedtools_lite ------------------------------------------------------
cc -O2 -o $BUILD/bedtools_lite $HERE/bedtools_lite.c
export BEDTOOLS=$BUILD/bedtools_lite

# --- minimap2 shim ------------------------------------------------------
cat > $BUILD/minimap2_shim <<EOF
#!/bin/bash
# emits the precomputed ground-truth PAF for the synthetic hap assemblies
[ "\$1" = "--version" ] && { echo "2.28-r1209"; exit 0; }
for last; do :; done
case "\$(basename \$last)" in
    pasm.hap1.fasta) cat $SYNTH/pasm_hap1_to_asm.paf;;
    pasm.hap2.fasta) cat $SYNTH/pasm_hap2_to_asm.paf;;
    *) echo "minimap2 shim: unexpected query \$last" >&2; exit 1;;
esac
EOF
chmod +x $BUILD/minimap2_shim
export MINIMAP2=$BUILD/minimap2_shim

rm -rf $GOLD
mkdir -p $GOLD

link_inputs () {
    ln -s $SYNTH/pasm.fasta $SYNTH/pasm.cov-total.bg $SYNTH/pasm.cov-mq20.bg \
          $SYNTH/pasm.bp.p_ctg.lowQ.bed $SYNTH/pasm.hap1.fasta \
          $SYNTH/pasm.hap2.fasta "$1"/
}

collect () { # collect <scratch-subdir> <golden-subdir> <paths...>
    local src=$1 dst=$GOLD/$2; shift 2
    mkdir -p $dst
    for p in "$@"; do cp -r $src/$p $dst/; done
}

# --- create-cornetto + create-hapnetto ---------------------------------
mkdir $SCRATCH/create && link_inputs $SCRATCH/create
(cd $SCRATCH/create && bash $REF/scripts/create-cornetto.sh pasm.fasta \
    > create.stdout 2> create.stderr)
(cd $SCRATCH/create && bash $REF/scripts/create-hapnetto.sh pasm \
    > hap.stdout 2> hap.stderr)
collect $SCRATCH/create create \
    tmp_create_cornetto tmp_create_hapnetto \
    pasm.boringbits.bed pasm.boringbits.txt \
    pasm_dip.boringbits.bed pasm_dip.boringbits.txt

# --- recreate-cornetto + recreate-hapnetto ------------------------------
mkdir $SCRATCH/recreate && link_inputs $SCRATCH/recreate
(cd $SCRATCH/recreate && bash $REF/scripts/recreate-cornetto.sh pasm.fasta \
    > recreate.stdout 2> recreate.stderr)
(cd $SCRATCH/recreate && bash $REF/scripts/recreate-hapnetto.sh pasm \
    > hap.stdout 2> hap.stderr)
collect $SCRATCH/recreate recreate \
    tmp_recreate_cornetto tmp_recreate_hapnetto \
    pasm.boringbits.bed pasm.boringbits.txt \
    pasm_dip.boringbits.bed pasm_dip.boringbits.txt

# --- telostats: pipeline-scale asm + the small synth asm ----------------
mkdir $SCRATCH/telo && ln -s $SYNTH/pasm.fasta $SCRATCH/telo/
(cd $SCRATCH/telo && bash $REF/scripts/telostats.sh pasm.fasta \
    > telostats.stdout.raw 2> telostats.stderr)
# drop the leading `cornetto --version` line; keep the protocol stdout
tail -n +2 $SCRATCH/telo/telostats.stdout.raw > $SCRATCH/telo/telostats.stdout
collect $SCRATCH/telo telo \
    tmp_pasm_telostats pasm.windows.0.4.50kb.ends.bed telostats.stdout

mkdir $SCRATCH/telosmall && ln -s $HERE/synth/asm.fasta $SCRATCH/telosmall/
(cd $SCRATCH/telosmall && bash $REF/scripts/telostats.sh asm.fasta \
    > telostats.stdout.raw 2> telostats.stderr)
tail -n +2 $SCRATCH/telosmall/telostats.stdout.raw \
    > $SCRATCH/telosmall/telostats.stdout
collect $SCRATCH/telosmall telosmall \
    tmp_asm_telostats asm.windows.0.4.50kb.ends.bed telostats.stdout

echo "composed pipeline goldens written to $GOLD"
find $GOLD -type f | sort | xargs wc -c | tail -1
