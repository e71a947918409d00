/* Fast 4-column bedgraph parser (chrom\tstart\tend\tdepth rows) for the
 * whole-genome depth load path — replaces the reference's fscanf loop
 * (reference: src/boringbits_main.c:204-287).  Multi-threaded: the byte
 * range is split at newline boundaries, chunks are counted and parsed in
 * parallel (the moral successor of the reference's batch work pool,
 * src/thread.c), and per-chunk contig tables are stitched serially.
 *
 * Build: cc -O3 -shared -fPIC -pthread bedgraph_native.c -o _bedgraph_native.so
 */

#include <pthread.h>
#include <stdint.h>
#include <string.h>

typedef struct {
    const char *data;
    int64_t begin, end;        /* byte range, begin at a row start */
    int64_t row0;              /* global row index of first row    */
    int64_t nrows;             /* rows in this chunk (phase 1 out) */
    int64_t *starts, *ends, *depths;
    int64_t *ctg_row, *ctg_off, *ctg_len;  /* thread-local slices  */
    int64_t n_ctg;
    int64_t err;               /* 0 ok, else -(local_row+1)        */
} chunk_t;

static void *count_worker(void *arg)
{
    chunk_t *c = (chunk_t *)arg;
    const char *p = c->data + c->begin, *endp = c->data + c->end;
    int64_t n = 0;
    while (p < endp) {
        const char *nl = (const char *)memchr(p, '\n', endp - p);
        ++n;
        if (!nl) break;
        p = nl + 1;
    }
    c->nrows = n;
    return 0;
}

static void *parse_worker(void *arg)
{
    chunk_t *c = (chunk_t *)arg;
    const char *data = c->data;
    int64_t i = c->begin, len = c->end;
    int64_t row = c->row0, n_ctg = 0;
    const char *prev_name = 0;
    int64_t prev_len = -1;
    while (i < len) {
        const char *name = data + i;
        int64_t nlen;
        int64_t j = i;
        /* fast path: same chrom as previous row */
        if (prev_len > 0 && i + prev_len < len
            && data[i + prev_len] == '\t'
            && memcmp(name, prev_name, prev_len) == 0) {
            nlen = prev_len;
            j = i + prev_len;
        } else {
            while (j < len && data[j] != '\t' && data[j] != '\n') ++j;
            if (j >= len || data[j] != '\t') { c->err = -(row + 1); return 0; }
            nlen = j - i;
        }
        ++j;
        int64_t v, k, field_start;
        for (k = 0; k < 3; ++k) {
            field_start = j;
            v = 0;
            while (j < len && (unsigned)(data[j] - '0') < 10u)
                v = v * 10 + (data[j++] - '0');
            if (j == field_start) { c->err = -(row + 1); return 0; }
            if (k < 2) {
                if (j >= len || data[j] != '\t') {
                    c->err = -(row + 1); return 0;
                }
                ++j;
            }
            if (k == 0) c->starts[row - c->row0] = v;
            else if (k == 1) c->ends[row - c->row0] = v;
            else c->depths[row - c->row0] = v;
        }
        if (j < len && data[j] == '\r') ++j;
        if (j < len) {
            if (data[j] != '\n') { c->err = -(row + 1); return 0; }
            ++j;
        }
        if (prev_len != nlen || memcmp(prev_name, name, nlen) != 0) {
            c->ctg_row[n_ctg] = row;
            c->ctg_off[n_ctg] = name - data;
            c->ctg_len[n_ctg] = nlen;
            ++n_ctg;
            prev_name = name;
            prev_len = nlen;
        }
        ++row;
        i = j;
    }
    c->n_ctg = n_ctg;
    return 0;
}

int64_t bg_parse(const char *data, int64_t len, int nthreads,
                 int64_t *starts, int64_t *ends, int64_t *depths,
                 int64_t *ctg_row, int64_t *ctg_off, int64_t *ctg_len,
                 int64_t *n_ctg_out)
{
    enum { MAXT = 32 };
    chunk_t ch[MAXT];
    pthread_t th[MAXT];
    int T = nthreads < 1 ? 1 : (nthreads > MAXT ? MAXT : nthreads);
    int t;
    if (len == 0) { *n_ctg_out = 0; return 0; }

    /* chunk boundaries aligned to row starts */
    int64_t pos = 0;
    for (t = 0; t < T; ++t) {
        ch[t].data = data;
        ch[t].begin = pos;
        int64_t want = len * (t + 1) / T;
        if (want < pos) want = pos;
        if (t == T - 1 || want >= len) {
            pos = len;
        } else {
            const char *nl = (const char *)memchr(data + want, '\n',
                                                  len - want);
            pos = nl ? (nl - data) + 1 : len;
        }
        ch[t].end = pos;
        ch[t].err = 0;
    }

    /* phase 1: count rows per chunk */
    for (t = 0; t < T; ++t)
        pthread_create(&th[t], 0, count_worker, &ch[t]);
    for (t = 0; t < T; ++t)
        pthread_join(th[t], 0);

    int64_t total = 0;
    for (t = 0; t < T; ++t) {
        ch[t].row0 = total;
        total += ch[t].nrows;
        ch[t].starts = starts + ch[t].row0;
        ch[t].ends = ends + ch[t].row0;
        ch[t].depths = depths + ch[t].row0;
        ch[t].ctg_row = ctg_row + ch[t].row0;
        ch[t].ctg_off = ctg_off + ch[t].row0;
        ch[t].ctg_len = ctg_len + ch[t].row0;
    }

    /* phase 2: parse chunks in parallel */
    for (t = 0; t < T; ++t)
        pthread_create(&th[t], 0, parse_worker, &ch[t]);
    for (t = 0; t < T; ++t)
        pthread_join(th[t], 0);
    for (t = 0; t < T; ++t)
        if (ch[t].err) return ch[t].err;

    /* stitch contig tables: drop a chunk's first entry when its name
     * continues the previous chunk's last contig */
    int64_t n_ctg = 0;
    const char *last_name = 0;
    int64_t last_len = -1;
    for (t = 0; t < T; ++t) {
        int64_t k0 = 0;
        if (ch[t].n_ctg > 0 && last_len >= 0
            && ch[t].ctg_len[0] == last_len
            && memcmp(data + ch[t].ctg_off[0], last_name, last_len) == 0)
            k0 = 1;
        int64_t k;
        for (k = k0; k < ch[t].n_ctg; ++k) {
            ctg_row[n_ctg] = ch[t].ctg_row[k];
            ctg_off[n_ctg] = ch[t].ctg_off[k];
            ctg_len[n_ctg] = ch[t].ctg_len[k];
            ++n_ctg;
        }
        if (ch[t].n_ctg > 0) {
            last_name = data + ch[t].ctg_off[ch[t].n_ctg - 1];
            last_len = ch[t].ctg_len[ch[t].n_ctg - 1];
        }
    }
    *n_ctg_out = n_ctg;
    return total;
}
