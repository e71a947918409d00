/* Standalone leak-check driver for every ctypes native kernel.
 *
 * The pytest sanitizer leg must run with detect_leaks=0 (CPython interns
 * "leak" at exit), so this binary drives each exported kernel entry
 * point directly with leaks ON — the analog of the reference's
 * `valgrind --leak-check=full --error-exitcode=1` over every binary
 * (/root/reference/test/test.sh:16-22).  Built and run by
 * tests/run_sanitized.sh:
 *
 *   cc -O1 -fsanitize=address,undefined -fno-sanitize-recover=all -g \
 *      test_data/native_leak_driver.c cornetto_tpu/native/*.c -o drv
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

/* exported kernel entry points (see the .c files for contracts) */
int64_t bg_parse(const char *, int64_t, int, int64_t *, int64_t *,
                 int64_t *, int64_t *, int64_t *, int64_t *, int64_t *);
int64_t bg_fill(const char *, int64_t, int, uint16_t *, int64_t *,
                int64_t *, int64_t *, int64_t *, int64_t *, int64_t *,
                int64_t *, int64_t *, int64_t, int64_t *, int64_t *);
int64_t bg_count_nl(const char *, int64_t, int);
long depth_write(const char *, int, const char *, const int64_t *, long,
                 long, int);
long fq_pack_batch(const char *, long, int, int, unsigned char *, int,
                   unsigned char *, int, int *, long *, int *, int *,
                   int *, int);
long tsv_format(const char *, const int64_t *, const int32_t *,
                const int32_t *, const int32_t *, const int32_t *,
                const int32_t *, const char *, const int64_t *,
                const int32_t *, int32_t, int32_t, char *, long,
                int64_t *);
long compact_ids(const char *, const int64_t *, const int32_t *, int32_t,
                 char *, long, int64_t *);
int64_t sdust_mask(const unsigned char *, int64_t, int, int, int64_t *,
                   int64_t);
void mz_extract(const uint8_t *, int64_t, int, int, int, uint32_t *,
                int32_t *);
int64_t mz_dedup(const uint32_t *, const int32_t *, const int32_t *,
                 int64_t, int64_t, uint32_t *, int32_t *, int32_t *);
void mz_bucket_hist(const uint32_t *, int64_t, int, int, int32_t *);
void mz_radix_sort(uint32_t *, int32_t *, int32_t *, int64_t,
                   uint32_t *, int32_t *, int32_t *, int);
int64_t mz_bucket_count2(const uint32_t *, int64_t, int, int, int,
                         uint8_t *);
int64_t mz_bucket_fill2(const uint32_t *, const int32_t *, const int32_t *,
                        int64_t, int, int, int, int32_t *);
int64_t mz_bucket_fill(const uint32_t *, const int32_t *, const int32_t *,
                       int64_t, int, int, int, int32_t *);
void mz_btable_init(int32_t *, int64_t, int, int);

#define CHECK(cond) do { if (!(cond)) { \
    fprintf(stderr, "FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
    return 1; } } while (0)

static int u64cmp(const void *a, const void *b)
{
    uint64_t x = *(const uint64_t *)a, y = *(const uint64_t *)b;
    return x < y ? -1 : x > y ? 1 : 0;
}

static uint32_t rstate = 12345;
static uint32_t rnd(void)
{
    /* return the HIGH bits: an LCG's low bits have tiny periods (rnd()%4
     * on raw state cycles with period 4 — a perfect repeat that DUST
     * masks wall-to-wall) */
    rstate = rstate * 1664525u + 1013904223u;
    return rstate >> 16;
}

static int drive_bedgraph(void)
{
    /* a few contigs of 1-bp rows, incl. a >65535 truncation */
    enum { NROW = 50000 };
    char *text = (char *)malloc(NROW * 32);
    int64_t len = 0, i;
    for (i = 0; i < NROW; ++i) {
        int ctg = (int)(i / 20000);
        int64_t pos = i % 20000;
        len += sprintf(text + len, "ctg%d\t%lld\t%lld\t%d\n", ctg,
                       (long long)pos, (long long)pos + 1,
                       i == 777 ? 70000 : (int)(rnd() % 120));
    }
    CHECK(bg_count_nl(text, len, 2) == NROW);
    int64_t *s = malloc(NROW * sizeof(int64_t));
    int64_t *e = malloc(NROW * sizeof(int64_t));
    int64_t *d = malloc(NROW * sizeof(int64_t));
    /* bg_parse/bg_fill slice the contig buffers by row offset per worker
     * chunk: the caller (io/bed.py) sizes them by ROW count */
    int64_t *cr = malloc(NROW * sizeof(int64_t));
    int64_t *co = malloc(NROW * sizeof(int64_t));
    int64_t *cl = malloc(NROW * sizeof(int64_t));
    int64_t n_ctg = NROW;
    CHECK(bg_parse(text, len, 2, s, e, d, cr, co, cl, &n_ctg) == NROW);
    CHECK(n_ctg == 3);
    uint16_t *dep = malloc(NROW * sizeof(uint16_t));
    int64_t *cf = malloc(NROW * sizeof(int64_t));
    int64_t n2[1] = {NROW}, ssum[1] = {0}, ntr[2] = {0, 0}, err[4] = {0};
    int64_t tr_row[16], tr_val[16];
    CHECK(bg_fill(text, len, 2, dep, cr, co, cl, cf, n2, ssum, tr_row,
                  tr_val, 16, ntr, err) == NROW);
    CHECK(n2[0] == 3 && ntr[1] == 1 && dep[777] == 65535);
    free(text); free(s); free(e); free(d); free(cr); free(co); free(cl);
    free(dep); free(cf);
    return 0;
}

static int drive_depth_write(void)
{
    enum { N = 10000 };
    int64_t *depth = malloc(N * sizeof(int64_t));
    long i;
    for (i = 0; i < N; ++i)
        depth[i] = rnd() % 7;
    char path[] = "/tmp/leakdrv_depth_XXXXXX";
    int fd = mkstemp(path);
    CHECK(fd >= 0);
    close(fd);
    CHECK(depth_write(path, 0, "ctgZ", depth, N, 0, 0) > 0);
    CHECK(depth_write(path, 1, "ctgZ", depth, N, 0, 1) > 0);
    CHECK(depth_write(path, 1, "ctgZ", depth, N, 0, 2) > 0);
    unlink(path);
    free(depth);
    return 0;
}

static int drive_fastq_and_tsv(void)
{
    enum { B = 64, L = 100 };
    char *fq = malloc((size_t)B * (2 * L + 64));
    long len = 0;
    int i, j;
    for (i = 0; i < B; ++i) {
        len += sprintf(fq + len, "@read_%d some comment\n", i);
        for (j = 0; j < L; ++j)
            fq[len++] = "ACGTN"[rnd() % (i % 3 ? 4 : 5)];
        len += sprintf(fq + len, "\n+\n");
        for (j = 0; j < L; ++j)
            fq[len++] = 'I';
        fq[len++] = '\n';
    }
    int stride = (L + 3) / 4, nstride = (L + 7) / 8;
    unsigned char *packed = malloc((size_t)B * stride);
    unsigned char *nmask = malloc((size_t)B * nstride);
    int lengths[B], name_len[B], count = 0, has_n = 0;
    long name_off[B];
    long used = fq_pack_batch(fq, len, L, B, packed, stride, nmask,
                              nstride, lengths, name_off, name_len,
                              &count, &has_n, 1);
    CHECK(used == len && count == B && has_n == 1);

    char *blob = malloc(B * 32);
    int64_t blob_off[B];
    int32_t nlen32[B];
    for (i = 0; i < B; ++i)
        nlen32[i] = name_len[i];
    int64_t off64[B];
    for (i = 0; i < B; ++i)
        off64[i] = name_off[i];
    CHECK(compact_ids(fq, off64, nlen32, B, blob, B * 32, blob_off) > 0);

    int32_t dec[B], best[B], est[B], nhits[B];
    for (i = 0; i < B; ++i) {
        dec[i] = i & 1; best[i] = i % 3; est[i] = (int32_t)(rnd() % 100000);
        nhits[i] = i % 7;
    }
    const char names[] = "ctgActgBctgC";
    int64_t noff[3] = {0, 4, 8};
    int32_t nln[3] = {4, 4, 4};
    char *out = malloc(B * 96);
    int64_t acc = 0;
    CHECK(tsv_format(blob, blob_off, nlen32, dec, best, est, nhits, names,
                     noff, nln, 3, B, out, B * 96, &acc) > 0);
    CHECK(acc == B / 2);
    free(fq); free(packed); free(nmask); free(blob); free(out);
    return 0;
}

static int drive_sdust(void)
{
    enum { N = 200000 };
    unsigned char *seq = malloc(N + 1);
    int64_t i;
    for (i = 0; i < N; ++i) {
        if ((i / 3000) % 2)
            seq[i] = "ATTCC"[i % 5];          /* satellite: DUST fires */
        else
            seq[i] = "ACGT"[rnd() % 4];
    }
    seq[N] = 0;
    int64_t out_small[4];
    CHECK(sdust_mask(seq, N, 20, 64, out_small, 2) < 0);   /* grow path */
    int64_t *out = malloc(2 * sizeof(int64_t) * 4096);
    int64_t n = sdust_mask(seq, N, 20, 64, out, 4096);
    CHECK(n > 0);
    free(seq); free(out);
    return 0;
}

static int drive_minimizer(void)
{
    enum { N = 1000000, K = 15, W = 10 };
    uint8_t *codes = malloc(N);
    int64_t i;
    for (i = 0; i < N; ++i)
        codes[i] = (uint8_t)(rnd() % 64 == 0 ? 4 : rnd() % 4);
    memcpy(codes + 600000, codes + 100000, 50000);   /* exact repeat */
    int64_t nwin = (N - K + 1) / W;
    uint32_t *h = malloc(nwin * sizeof(uint32_t));
    int32_t *pos = malloc(nwin * sizeof(int32_t));
    mz_extract(codes, N, K, W, 2, h, pos);
    /* densify + synthesize contig ids, sort by hash (qsort on pairs) */
    int64_t n = 0;
    int32_t *c = malloc(nwin * sizeof(int32_t));
    for (i = 0; i < nwin; ++i)
        if (h[i] != 0xFFFFFFFFu) {
            h[n] = h[i]; pos[n] = pos[i]; c[n] = 0; ++n;
        }
    /* stable sort by hash twice over: the oracle packs (hash, index)
     * into uint64 keys for qsort; the production path is the threaded
     * radix sort, which must agree element-for-element */
    uint64_t *key = malloc(n * sizeof(uint64_t));
    for (i = 0; i < n; ++i)
        key[i] = ((uint64_t)h[i] << 32) | (uint64_t)i;
    qsort(key, n, sizeof(uint64_t), u64cmp);
    uint32_t *h2 = malloc(n * sizeof(uint32_t));
    int32_t *c2 = malloc(n * sizeof(int32_t));
    int32_t *p2 = malloc(n * sizeof(int32_t));
    for (i = 0; i < n; ++i) {
        int64_t src = (int64_t)(key[i] & 0xFFFFFFFFu);
        h2[i] = h[src]; c2[i] = c[src]; p2[i] = pos[src];
    }
    free(key);
    {
        uint32_t *hr = malloc(n * sizeof(uint32_t));
        int32_t *cr = malloc(n * sizeof(int32_t));
        int32_t *pr = malloc(n * sizeof(int32_t));
        uint32_t *ht = malloc(n * sizeof(uint32_t));
        int32_t *ct = malloc(n * sizeof(int32_t));
        int32_t *pt = malloc(n * sizeof(int32_t));
        memcpy(hr, h, n * sizeof(uint32_t));
        memcpy(cr, c, n * sizeof(int32_t));
        memcpy(pr, pos, n * sizeof(int32_t));
        mz_radix_sort(hr, cr, pr, n, ht, ct, pt, 2);
        for (i = 0; i < n; ++i)
            CHECK(hr[i] == h2[i] && cr[i] == c2[i] && pr[i] == p2[i]);
        free(hr); free(cr); free(pr); free(ht); free(ct); free(pt);
    }
    int64_t m = mz_dedup(h2, c2, p2, n, 256, h2, c2, p2);
    CHECK(m > 0 && m <= n);
    int B = 18;
    int32_t *hist = calloc((size_t)1 << B, sizeof(int32_t));
    mz_bucket_hist(h2, m, 0, B, hist);
    int64_t tot = 0;
    for (i = 0; i < (1 << B); ++i) tot += hist[i];
    CHECK(tot == m);
    int32_t *bt = malloc(((size_t)1 << B) * 8 * sizeof(int32_t));
    mz_btable_init(bt, (int64_t)1 << B, 4, 2);
    int64_t dropped = mz_bucket_fill(h2, c2, p2, m, 0, B, 4, bt);
    CHECK(dropped >= 0);
    /* two-choice placement pair (round 5): count pass + tagged fill must
     * agree on the drop total */
    uint8_t *cnt = calloc((size_t)1 << B, 1);
    int64_t d2c = mz_bucket_count2(h2, m, 0, B, 4, cnt);
    mz_btable_init(bt, (int64_t)1 << B, 4, 2);
    int64_t d2f = mz_bucket_fill2(h2, c2, p2, m, 0, B, 4, bt);
    CHECK(d2c == d2f && d2f <= dropped);
    free(codes); free(h); free(pos); free(c);
    free(h2); free(c2); free(p2); free(hist); free(bt); free(cnt);
    return 0;
}

int main(void)
{
    CHECK(drive_bedgraph() == 0);
    CHECK(drive_depth_write() == 0);
    CHECK(drive_fastq_and_tsv() == 0);
    CHECK(drive_sdust() == 0);
    CHECK(drive_minimizer() == 0);
    fprintf(stderr, "native leak driver: OK\n");
    return 0;
}
