/* Threaded MSM baseline: reproduces the reference's multi-threaded Rust path
 * (p1_affines::mult, /root/reference/bindings/rust/src/lib.rs:1804-1949) in
 * C + pthreads against the unmodified libblst.a, so BASELINE.md can record
 * what the reference achieves with ALL host cores (VERDICT r3 item 6; Rust
 * toolchain is not available in this image, so the same tile decomposition
 * is re-expressed here: window-row tiles pulled from an atomic counter,
 * blst_p1s_tile_pippenger per tile, row combine with window doublings).
 *
 * Usage: bench_threaded <n_exp> [nthreads] [loops]
 * Prints mean microseconds per MSM.
 */
#include <pthread.h>
#include <stdatomic.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/time.h>
#include "blst.h"

static void *xmalloc(size_t n) {
    void *p = malloc(n);
    if (!p) { fprintf(stderr, "oom\n"); exit(1); }
    return p;
}

/* blst's window heuristic (src/multi_scalar.c:268-275) */
static size_t pippenger_window_size(size_t npoints) {
    size_t wbits;
    for (wbits = 0; npoints >>= 1; wbits++) ;
    return wbits > 12 ? wbits - 3 : (wbits > 4 ? wbits - 2 : (wbits ? 2 : 1));
}

/* splitmix64: deterministic scalar fill (timing only needs fixed widths) */
static unsigned long long sm64(unsigned long long *s) {
    unsigned long long z = (*s += 0x9e3779b97f4a7c15ull);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ull;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebull;
    return z ^ (z >> 31);
}

typedef struct {
    const blst_p1_affine *points;
    const byte *scalars;
    size_t npoints, nbits, window, ny;
    blst_p1 *rows;              /* one partial result per window row */
    limb_t **scratch;           /* per-thread scratch */
    atomic_size_t *counter;
} job_t;

static void *worker(void *argp) {
    job_t *job = (job_t *)argp;
    size_t tid = atomic_fetch_add(job->counter, 0); /* unused; scratch below */
    (void)tid;
    for (;;) {
        size_t y = atomic_fetch_add(job->counter, 1);
        if (y >= job->ny) break;
        const blst_p1_affine *pts_arg[2] = { job->points, NULL };
        const byte *sc_arg[2] = { job->scalars, NULL };
        /* per-tile private scratch, as each Rust worker allocates its own
         * (lib.rs:1882) */
        limb_t *scratch = xmalloc(
            blst_p1s_mult_pippenger_scratch_sizeof(job->npoints));
        blst_p1s_tile_pippenger(&job->rows[y], pts_arg, job->npoints, sc_arg,
                                job->nbits, scratch, y * job->window,
                                job->window);
        free(scratch);
    }
    return NULL;
}

int main(int argc, char **argv) {
    if (argc < 2) { fprintf(stderr, "usage: %s <n_exp> [nthreads] [loops]\n", argv[0]); return 2; }
    size_t n = (size_t)1 << atoi(argv[1]);
    int nthreads = argc > 2 ? atoi(argv[2]) : 2;
    int loops = argc > 3 ? atoi(argv[3]) : 3;
    size_t nbits = 255;
    size_t window = pippenger_window_size(n);
    size_t ny = (nbits + window - 1) / window;

    /* fixed points P_i = 2^(i+1) G, as main_p1.cpp:52-66 */
    blst_p1 acc = *blst_p1_generator();
    blst_p1_affine *pts = xmalloc(n * sizeof(blst_p1_affine));
    for (size_t i = 0; i < n; i++) {
        blst_p1_double(&acc, &acc);
        blst_p1_to_affine(&pts[i], &acc);
    }
    byte *scalars = xmalloc(n * 32);
    unsigned long long seed = 42;
    for (size_t i = 0; i < n * 32; i += 8) {
        unsigned long long v = sm64(&seed);
        memcpy(scalars + i, &v, 8);
    }
    for (size_t i = 0; i < n; i++) scalars[i * 32 + 31] &= 0x3f; /* < 2^254 */

    blst_p1 *rows = xmalloc(ny * sizeof(blst_p1));
    double total_us = 0;
    blst_p1 ret;
    for (int l = 0; l < loops; l++) {
        struct timeval t0, t1;
        gettimeofday(&t0, NULL);
        atomic_size_t counter = 0;
        job_t job = { pts, scalars, n, nbits, window, ny, rows, NULL, &counter };
        pthread_t th[64];
        for (int t = 0; t < nthreads; t++)
            pthread_create(&th[t], NULL, worker, &job);
        for (int t = 0; t < nthreads; t++)
            pthread_join(th[t], NULL);
        /* row combine: top row first, double window times between rows
         * (lib.rs:1919-1948) */
        ret = rows[ny - 1];
        for (size_t y = ny - 1; y-- > 0;) {
            for (size_t d = 0; d < window; d++) blst_p1_double(&ret, &ret);
            blst_p1_add_or_double(&ret, &ret, &rows[y]);
        }
        blst_p1_affine out;
        blst_p1_to_affine(&out, &ret);
        gettimeofday(&t1, NULL);
        total_us += (t1.tv_sec - t0.tv_sec) * 1e6 + (t1.tv_usec - t0.tv_usec);
    }
    byte ser[96];
    blst_p1_serialize(ser, &ret);
    printf("n=2^%s threads=%d window=%zu rows=%zu mean_us=%.1f result=%02x%02x…\n",
           argv[1], nthreads, window, ny, total_us / loops, ser[0], ser[1]);
    return 0;
}
