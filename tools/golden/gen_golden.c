/* Golden-vector generator: runs the REFERENCE's own MSM
 * (blst_p1s_mult_pippenger / blst_p2s_mult_pippenger, built unmodified from
 * /root/reference/src via tools/golden/build.sh) on the framework's seeded
 * scalar fixtures over the canonical fixed points P_i = 2^(i+1)*G, and emits
 * the ZCash-serialized result (blst_p1_serialize, 96 B / blst_p2_serialize,
 * 192 B).  The output bytes are committed as tests/fixtures/golden_msm.json
 * and asserted byte-exact by tests/test_golden.py — the blst-derived
 * known-good vectors SURVEY.md §4(b) calls for.
 *
 * Usage: gen_golden <group 1|2> <n> <scalars.bin> [nbits]
 *   scalars.bin: n * 32 bytes, little-endian 255-bit scalars.
 *   Result hex on stdout.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "blst.h"

static void *xmalloc(size_t n) {
    void *p = malloc(n);
    if (!p) { fprintf(stderr, "oom\n"); exit(1); }
    return p;
}

int main(int argc, char **argv) {
    if (argc < 4) { fprintf(stderr, "usage: %s <1|2> <n> <scalars.bin> [nbits]\n", argv[0]); return 2; }
    int group = atoi(argv[1]);
    size_t n = (size_t)atoll(argv[2]);
    size_t nbits = argc > 4 ? (size_t)atoll(argv[4]) : 255;

    FILE *f = fopen(argv[3], "rb");
    if (!f) { perror("scalars"); return 1; }
    unsigned char *scalars = xmalloc(n * 32);
    if (fread(scalars, 32, n, f) != n) { fprintf(stderr, "short read\n"); return 1; }
    fclose(f);
    const byte *scalars_arg[2] = { scalars, NULL };

    if (group == 1) {
        /* P_i = 2^(i+1) * G: doubling chain from G (main_p1.cpp:52-66) */
        blst_p1 acc = *blst_p1_generator();
        blst_p1_affine *pts = xmalloc(n * sizeof(blst_p1_affine));
        for (size_t i = 0; i < n; i++) {
            blst_p1_double(&acc, &acc);
            blst_p1_to_affine(&pts[i], &acc);
        }
        const blst_p1_affine *pts_arg[2] = { pts, NULL };
        limb_t *scratch = xmalloc(blst_p1s_mult_pippenger_scratch_sizeof(n));
        blst_p1 ret;
        blst_p1s_mult_pippenger(&ret, pts_arg, n, scalars_arg, nbits, scratch);
        byte out[96];
        blst_p1_serialize(out, &ret);
        for (int i = 0; i < 96; i++) printf("%02x", out[i]);
        printf("\n");
    } else {
        blst_p2 acc = *blst_p2_generator();
        blst_p2_affine *pts = xmalloc(n * sizeof(blst_p2_affine));
        for (size_t i = 0; i < n; i++) {
            blst_p2_double(&acc, &acc);
            blst_p2_to_affine(&pts[i], &acc);
        }
        const blst_p2_affine *pts_arg[2] = { pts, NULL };
        limb_t *scratch = xmalloc(blst_p2s_mult_pippenger_scratch_sizeof(n));
        blst_p2 ret;
        blst_p2s_mult_pippenger(&ret, pts_arg, n, scalars_arg, nbits, scratch);
        byte out[192];
        blst_p2_serialize(out, &ret);
        for (int i = 0; i < 192; i++) printf("%02x", out[i]);
        printf("\n");
    }
    return 0;
}
