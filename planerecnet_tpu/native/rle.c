/* Fast COCO RLE mask codec for the data-loading hot path.
 *
 * Native counterpart of planerecnet_tpu/data/coco.py: decodes the COCO
 * 6-bit-varint compressed counts string and expands runs into a column-major
 * binary mask. The pure-python decoder walks the string char-by-char and
 * fills runs with numpy slicing; for large training sets (100k ScanNet
 * frames, ~10 masks each — reference README.md:64) this inner loop is worth
 * native code, mirroring how the reference leans on pycocotools' C extension
 * (reference data/datasets.py:87-89).
 *
 * Built by planerecnet_tpu/native/build.py into librle.so, loaded via
 * ctypes with a python fallback.
 */

#include <stddef.h>
#include <stdint.h>

/* Decode a compressed counts string into int64 runs.
 * Returns the number of runs written, or -1 if out_cap is too small. */
long long rle_decode_counts(const char *s, long long n, long long *out,
                            long long out_cap) {
    long long m = 0;
    long long i = 0;
    while (i < n) {
        long long x = 0;
        int k = 0;
        int more = 1;
        while (more) {
            if (i >= n) return -2; /* truncated varint */
            long long c = (long long)(s[i]) - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (int)(c & 0x20);
            i++;
            k++;
            if (!more && (c & 0x10)) {
                x |= -1LL << (5 * k);
            }
        }
        if (m > 2) x += out[m - 2];
        if (m >= out_cap) return -1;
        out[m++] = x;
    }
    return m;
}

/* Expand runs into a flat column-major uint8 mask of size total.
 * Returns 0 on success, -1 if the runs overflow the buffer. */
int rle_fill(const long long *counts, long long n_counts, uint8_t *flat,
             long long total) {
    long long pos = 0;
    int val = 0;
    for (long long r = 0; r < n_counts; r++) {
        long long run = counts[r];
        if (run < 0 || pos + run > total) return -1;
        if (val) {
            for (long long j = 0; j < run; j++) flat[pos + j] = 1;
        }
        pos += run;
        val ^= 1;
    }
    return 0;
}

/* One-shot: decode string + fill mask. Returns 0 ok, negative on error. */
int rle_decode_mask(const char *s, long long n, uint8_t *flat,
                    long long total, long long *scratch,
                    long long scratch_cap) {
    long long m = rle_decode_counts(s, n, scratch, scratch_cap);
    if (m < 0) return (int)m;
    return rle_fill(scratch, m, flat, total);
}

/* Encode a flat column-major uint8 mask into runs. Returns run count or -1
 * if out_cap too small. */
long long rle_encode_mask(const uint8_t *flat, long long total,
                          long long *out, long long out_cap) {
    long long m = 0;
    long long pos = 0;
    int val = 0;
    while (pos < total) {
        long long start = pos;
        while (pos < total && (flat[pos] != 0) == val) pos++;
        if (m >= out_cap) return -1;
        out[m++] = pos - start;
        val ^= 1;
    }
    /* trailing empty run if mask ends mid-value handled by loop; if the
     * mask starts with 1s the first 0-run has length 0 (emitted above). */
    return m;
}
