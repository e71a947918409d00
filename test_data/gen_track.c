/* Synthetic 1-bp-resolution coverage-track generator for the human-scale
 * dry run (scale_test.py).  Writes a bedgraph — gzipped when the output
 * name ends in .gz — at a few hundred MB/s of text: a 3 Gbp track is
 * ~60 GB of rows, which pandas-side generation cannot produce in
 * reasonable time and this box cannot hold uncompressed twice.
 *
 * usage: gen_track <lens.tsv> <out.bg[.gz]> <seed> <jitter>
 *   lens.tsv rows: name \t length
 *   depth model (same family as scale_test.gen): d[i] = max(0,
 *   30 + walk[i]/3 - U(0..jitter)), walk = cumsum of U{-1,0,1}.
 *
 * build: cc -O2 gen_track.c -lz -o gen_track
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

static uint64_t rng_state;

static inline uint64_t xorshift64(void)
{
    uint64_t x = rng_state;
    x ^= x << 13;
    x ^= x >> 7;
    x ^= x << 17;
    return rng_state = x;
}

static inline char *put_u64(char *p, uint64_t v)
{
    char tmp[24];
    int n = 0;
    do { tmp[n++] = (char)('0' + v % 10); v /= 10; } while (v);
    while (n) *p++ = tmp[--n];
    return p;
}

#define BUF (1 << 20)

typedef struct {
    gzFile gz;
    FILE *fp;
    char buf[BUF + 256];
    size_t n;
} out_t;

static void flush_out(out_t *o)
{
    if (!o->n) return;
    if (o->gz) gzwrite(o->gz, o->buf, (unsigned)o->n);
    else fwrite(o->buf, 1, o->n, o->fp);
    o->n = 0;
}

int main(int argc, char **argv)
{
    if (argc != 5) {
        fprintf(stderr,
                "usage: gen_track <lens.tsv> <out.bg[.gz]> <seed> "
                "<jitter>\n");
        return 1;
    }
    FILE *lf = fopen(argv[1], "r");
    if (!lf) { perror(argv[1]); return 1; }
    out_t o;
    memset(&o, 0, sizeof(o));
    size_t olen = strlen(argv[2]);
    if (olen > 3 && strcmp(argv[2] + olen - 3, ".gz") == 0) {
        o.gz = gzopen(argv[2], "wb1");   /* level 1: speed over ratio */
        if (!o.gz) { perror(argv[2]); return 1; }
        gzbuffer(o.gz, BUF);
    } else {
        o.fp = fopen(argv[2], "wb");
        if (!o.fp) { perror(argv[2]); return 1; }
    }
    rng_state = strtoull(argv[3], 0, 10) * 0x9E3779B97F4A7C15ull + 1;
    long jitter = strtol(argv[4], 0, 10);

    char name[256];
    long len;
    while (fscanf(lf, "%255s\t%ld", name, &len) == 2) {
        size_t nlen = strlen(name);
        long walk = 0;
        for (long i = 0; i < len; ++i) {
            uint64_t r = xorshift64();
            walk += (long)(r % 3) - 1;
            long d = 30 + walk / 3;
            if (jitter) d -= (long)((r >> 32) % (uint64_t)(jitter + 1));
            if (d < 0) d = 0;
            char *p = o.buf + o.n;
            memcpy(p, name, nlen); p += nlen;
            *p++ = '\t';
            p = put_u64(p, (uint64_t)i);
            *p++ = '\t';
            p = put_u64(p, (uint64_t)(i + 1));
            *p++ = '\t';
            p = put_u64(p, (uint64_t)d);
            *p++ = '\n';
            o.n = (size_t)(p - o.buf);
            if (o.n >= BUF) flush_out(&o);
        }
    }
    flush_out(&o);
    if (o.gz) gzclose(o.gz);
    else fclose(o.fp);
    fclose(lf);
    return 0;
}
