#!/usr/bin/env bash
# Sanitizer lane for every builder-written native C file — the equivalent
# of the reference's `make asan=1` + valgrind legs
# (/root/reference/Makefile:32-35, /root/reference/test/test.sh:16-22).
#
#   bash tests/run_sanitized.sh
#
# 1. builds the two standalone test_data binaries (bedtools_lite,
#    gen_track) with -fsanitize=address,undefined and runs them on real
#    workloads;
# 2. re-runs every native-kernel-touching pytest file with the ctypes
#    kernels rebuilt under ASan+UBSan (CORNETTO_NATIVE_SANITIZE=1) and
#    the sanitizer runtimes LD_PRELOADed into the non-ASan python.
#
# Any sanitizer report aborts (halt_on_error); leak checking is disabled
# for the pytest leg only (CPython itself "leaks" interned objects at
# exit) but ON for the standalone binaries.
set -euo pipefail
cd "$(dirname "$0")/.."

CC=${CC:-cc}
SAN="-fsanitize=address,undefined -fno-sanitize-recover=all -g"

echo "== standalone binaries (ASan+UBSan, leaks ON) =="
mkdir -p tmp_san
$CC -O1 $SAN test_data/bedtools_lite.c -o tmp_san/bedtools_lite
$CC -O1 $SAN test_data/gen_track.c -o tmp_san/gen_track -lz
# every ctypes kernel, leak-checked directly (the pytest leg below must
# disable leak detection for CPython's own exit-time "leaks"; this
# driver is the valgrind-every-binary analog of the reference)
$CC -O1 $SAN test_data/native_leak_driver.c cornetto_tpu/native/*.c \
    -o tmp_san/native_leak_driver -lpthread
./tmp_san/native_leak_driver

# gen_track: 3 contigs x a few Mbp, plain + gzipped outputs
printf 'ctgA\t2000000\nctgB\t1500000\nctgC\t500000\n' > tmp_san/lens.tsv
./tmp_san/gen_track tmp_san/lens.tsv tmp_san/gt.bg 1234 8
./tmp_san/gen_track tmp_san/lens.tsv tmp_san/gt.bg.gz 1234 8
test -s tmp_san/gt.bg && test -s tmp_san/gt.bg.gz

# bedtools_lite: drive every subcommand on generated + crafted inputs
python3 - <<'EOF'
import random
random.seed(7)
rows_a, rows_b = [], []
for i in range(5000):
    c = "ctg%d" % random.randrange(5)
    s = random.randrange(0, 1000000)
    e = s + random.randrange(1, 60000)
    (rows_a if i % 2 else rows_b).append((c, s, e))
with open("tmp_san/a.bed", "w") as f:
    f.write("".join("%s\t%d\t%d\n" % r for r in rows_a))
with open("tmp_san/b.bed", "w") as f:
    f.write("".join("%s\t%d\t%d\n" % r for r in rows_b))
EOF
./tmp_san/bedtools_lite sort -i tmp_san/a.bed > tmp_san/a.sorted.bed
./tmp_san/bedtools_lite sort -i tmp_san/b.bed > tmp_san/b.sorted.bed
./tmp_san/bedtools_lite merge -d 1000 -i tmp_san/a.sorted.bed > tmp_san/m.bed
./tmp_san/bedtools_lite subtract -a tmp_san/a.sorted.bed -b tmp_san/b.sorted.bed > /dev/null
./tmp_san/bedtools_lite intersect -a tmp_san/a.sorted.bed -b tmp_san/b.sorted.bed -wa > /dev/null
echo "standalone: OK"

echo "== ctypes kernels under ASan+UBSan (pytest leg) =="
LIBASAN=$($CC -print-file-name=libasan.so)
LIBUBSAN=$($CC -print-file-name=libubsan.so)
rm -f cornetto_tpu/native/_*.asan.so

CORNETTO_NATIVE_SANITIZE=1 \
LD_PRELOAD="$LIBASAN $LIBUBSAN" \
ASAN_OPTIONS="detect_leaks=0:halt_on_error=1:abort_on_error=1" \
UBSAN_OPTIONS="halt_on_error=1:abort_on_error=1" \
python3 -m pytest -x -q --runslow \
    tests/test_livefish_stream.py \
    tests/test_livefish_index_native.py \
    tests/test_sdust_device.py \
    tests/test_bam_write.py \
    tests/test_bam_depth.py \
    tests/test_depth_oracle_xval.py \
    tests/test_bedgraph_streaming.py \
    tests/test_bedgraph_gz.py \
    tests/test_boringbits.py \
    tests/test_telomere_group.py

rm -rf tmp_san
echo "sanitized lane: ALL GREEN"
