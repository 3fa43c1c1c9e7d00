/* Native build kernels for filterz_spark.
 *
 * Compiled at import time by filterz_spark/native/__init__.py with the
 * system C compiler (gcc -O3 -shared) and loaded via ctypes; every kernel
 * has a pure-numpy fallback in the corresponding filters/ module, so the
 * library works (slower) on hosts without a compiler. The hot loops here
 * are the per-partition construction kernels — the only place where the
 * algorithms are inherently sequential per key (xor peel, ribbon banded
 * elimination) or scatter-bound (sbbf insert) and numpy vectorization
 * cannot reach the reference's per-core rates. Probes stay in numpy: they
 * are gather+compare, already vectorized and map-only at the Spark layer.
 *
 * Semantics notes (reference = steelcake/filterz, Zig):
 *  - sbbf_insert mirrors src/sbbf.zig:64-80 exactly (same mask/block math
 *    as filters/sbbf.py; OR is order-insensitive, so the C and numpy
 *    backends produce byte-identical filters).
 *  - xorf_attempt runs the reference's own sequential queue peel
 *    (src/xorf.zig:167-216) over the repo's documented binary-fuse
 *    position derivation (filters/xorf.py make_subhashes — see the
 *    DELIBERATE DEVIATION note there). Peel success depends only on the
 *    (seed, positions) hypergraph, so the C queue peel and the numpy
 *    round-layered peel succeed on exactly the same seeds; only the
 *    fingerprint-slot assignment order (hence payload bytes) differs.
 *  - ribbon_attempt mirrors src/ribbon.zig:9-49 (per-key params) and
 *    :77-134 (incremental banded Gaussian elimination + bit-plane
 *    back-substitution). Rows are inserted in ascending bucket order
 *    (stable counting sort on the top 16 bits of start position) — the
 *    identical permutation to the numpy fallback's bucketed
 *    argsort(kind="stable") — so the C and numpy backends produce
 *    byte-identical solutions.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#if defined(__GLIBC__) || defined(__linux__)
#include <malloc.h>
/* Construction kernels allocate and free tens of MB per attempt; glibc
 * mmap()s blocks over 128KB and munmap()s them on free, so every attempt
 * re-faults its whole working set — at 32 concurrent workers the page-fault
 * and TLB-shootdown storm inflates kernel time ~10x (measured). Keep big
 * blocks on the heap for reuse instead; workers are long-lived so the
 * retained peak (~100MB) is irrelevant. */
__attribute__((constructor)) static void filterz_tune_malloc(void) {
    mallopt(M_MMAP_THRESHOLD, 1 << 30);
    mallopt(M_TRIM_THRESHOLD, 1 << 30);
}
#endif

/* ---------------- shared hash primitives ---------------- */

static inline uint64_t mulhi64(uint64_t a, uint64_t b) {
    return (uint64_t)(((unsigned __int128)a * b) >> 64);
}

/* Murmur2-64 of one u64 with seed — bit-exact to Zig
 * std.hash.Murmur2_64.hashUint64WithSeed (ref src/xorf.zig:7-9) and to
 * filterz_spark.hashing.murmur64_mix. */
static inline uint64_t murmur_mix(uint64_t k, uint64_t seed) {
    const uint64_t m = 0xc6a4a7935bd1e995ULL;
    uint64_t h = seed ^ (8ULL * m);
    k *= m;
    k ^= k >> 47;
    k *= m;
    h ^= k;
    h *= m;
    h ^= h >> 47;
    h *= m;
    h ^= h >> 47;
    return h;
}

/* ---------------- SBBF (ref src/sbbf.zig) ---------------- */

static const uint64_t SBBF_SALT[8] = {
    0x47b6137bULL, 0x44974d91ULL, 0x8824ad5bULL, 0xa2b7289dULL,
    0x705495c7ULL, 0x2df1424bULL, 0x9efc4947ULL, 0x5c6bfb31ULL,
};

void sbbf_insert(uint64_t *blocks, int64_t num_blocks,
                 const uint64_t *hashes, int64_t n) {
    for (int64_t i = 0; i < n; i++) {
        uint64_t h = hashes[i];
        uint64_t block = ((h & 0xffffffffULL) * (uint64_t)num_blocks) >> 32;
        uint64_t *b = blocks + block * 8;
        for (int j = 0; j < 8; j++) {
            uint64_t x = (h * SBBF_SALT[j]) >> 27;
            b[j] |= 1ULL << (x & 63);
        }
    }
}

/* Sequential insert-and-check (ref src/sbbf.zig:45-52, filter_insert_check
 * :68-70): out[i] = 1 iff key i's bits were ALL already set at its turn —
 * i.e. maybe-present given everything inserted before it, duplicates
 * within the batch included. */
void sbbf_insert_check(uint64_t *blocks, int64_t num_blocks,
                       const uint64_t *hashes, int64_t n, uint8_t *out) {
    for (int64_t i = 0; i < n; i++) {
        uint64_t h = hashes[i];
        uint64_t block = ((h & 0xffffffffULL) * (uint64_t)num_blocks) >> 32;
        uint64_t *b = blocks + block * 8;
        int present = 1;
        for (int j = 0; j < 8; j++) {
            uint64_t x = (h * SBBF_SALT[j]) >> 27;
            uint64_t m = 1ULL << (x & 63);
            present &= (b[j] & m) != 0;
            b[j] |= m;
        }
        out[i] = (uint8_t)present;
    }
}

/* Probe: out[i] = 1 iff all 8 lane bits set (ref src/sbbf.zig:32-37). */
void sbbf_contains(const uint64_t *blocks, int64_t num_blocks,
                   const uint64_t *hashes, int64_t n, uint8_t *out) {
    for (int64_t i = 0; i < n; i++) {
        uint64_t h = hashes[i];
        uint64_t block = ((h & 0xffffffffULL) * (uint64_t)num_blocks) >> 32;
        const uint64_t *b = blocks + block * 8;
        int ok = 1;
        for (int j = 0; j < 8; j++) {
            uint64_t x = (h * SBBF_SALT[j]) >> 27;
            uint64_t m = 1ULL << (x & 63);
            ok &= (b[j] & m) != 0;
        }
        out[i] = (uint8_t)ok;
    }
}

/* ---------------- xor / binary-fuse (ref src/xorf.zig) ---------------- */

/* Position j of seeded hash h — identical math to filters/xorf.py
 * make_subhashes (binary-fuse derivation, arXiv:2201.01174). */
static inline uint64_t xorf_pos(uint64_t h, uint64_t hl, uint64_t hh_mask,
                                int span, int arity, int j,
                                uint64_t seg_len, uint64_t seg_mask) {
    uint64_t hh = h & hh_mask;
    return (hl + (uint64_t)j * seg_len) ^
           ((hh >> (span * (arity - 1 - j))) & seg_mask);
}

/* One Las-Vegas construction attempt for a given seed.
 * Returns the number of peeled keys; fingerprints are written to fp_out
 * (u64 slots, already masked to fp_bits) ONLY when peeled == n.
 * Returns -1 on allocation failure.  The peel itself is the reference's
 * queue algorithm (src/xorf.zig:167-193); assignment runs in reverse peel
 * order (src/xorf.zig:199-216). */
int64_t xorf_attempt(const uint64_t *hashes, int64_t n, uint64_t seed,
                     int32_t arity, int64_t seg_len_i, int64_t scl_i,
                     int64_t alen, int32_t fp_bits, uint64_t *fp_out) {
    uint64_t seg_len = (uint64_t)seg_len_i;
    uint64_t seg_mask = seg_len - 1;
    uint64_t scl = (uint64_t)scl_i;
    int span = (arity == 3) ? 18 : 12;
    int bits = span * arity;
    uint64_t hh_mask = bits >= 64 ? ~0ULL : ((1ULL << bits) - 1);

    /* u16 counts: distinct uniform hashes over alen >= 1.1n slots have a
     * max per-slot load of O(log n) (~15 in practice) — the narrower array
     * keeps the peel's random-access working set cache-resident (~20%
     * faster than u32 at 625k keys) */
    uint16_t *count = (uint16_t *)calloc((size_t)alen, sizeof(uint16_t));
    uint64_t *xormask = (uint64_t *)calloc((size_t)alen, sizeof(uint64_t));
    /* each slot's count passes through the value 1 at most once (counts
     * only decrement), so <= alen pushes total */
    int64_t *stack = (int64_t *)malloc((size_t)alen * sizeof(int64_t));
    uint64_t *peel_keys = (uint64_t *)malloc((size_t)(n > 0 ? n : 1) * sizeof(uint64_t));
    int64_t *peel_pos = (int64_t *)malloc((size_t)(n > 0 ? n : 1) * sizeof(int64_t));
    if (!count || !xormask || !stack || !peel_keys || !peel_pos) {
        free(count); free(xormask); free(stack); free(peel_keys); free(peel_pos);
        return -1;
    }

    for (int64_t i = 0; i < n; i++) {
        uint64_t h = murmur_mix(hashes[i], seed);
        uint64_t hl = mulhi64(h, scl);
        for (int j = 0; j < arity; j++) {
            uint64_t p = xorf_pos(h, hl, hh_mask, span, arity, j, seg_len, seg_mask);
            count[p]++;
            xormask[p] ^= h;
        }
    }

    int64_t sp = 0;
    for (int64_t i = 0; i < alen; i++)
        if (count[i] == 1) stack[sp++] = i;

    int64_t peeled = 0;
    while (sp > 0) {
        int64_t slot = stack[--sp];
        if (count[slot] != 1) continue;
        uint64_t h = xormask[slot]; /* sole remaining key in this slot */
        uint64_t hl = mulhi64(h, scl);
        for (int j = 0; j < arity; j++) {
            uint64_t p = xorf_pos(h, hl, hh_mask, span, arity, j, seg_len, seg_mask);
            xormask[p] ^= h;
            count[p]--;
            if ((int64_t)p != slot && count[p] == 1) stack[sp++] = (int64_t)p;
        }
        peel_keys[peeled] = h;
        peel_pos[peeled] = slot;
        peeled++;
    }

    if (peeled == n) {
        uint64_t fp_mask = fp_bits >= 64 ? ~0ULL : ((1ULL << fp_bits) - 1);
        memset(fp_out, 0, (size_t)alen * sizeof(uint64_t));
        for (int64_t t = peeled - 1; t >= 0; t--) {
            uint64_t h = peel_keys[t];
            uint64_t hl = mulhi64(h, scl);
            uint64_t f = (h ^ (h >> 32)) & fp_mask;
            for (int j = 0; j < arity; j++) {
                uint64_t p = xorf_pos(h, hl, hh_mask, span, arity, j, seg_len, seg_mask);
                f ^= fp_out[p]; /* chosen slot holds 0 pre-assignment */
            }
            fp_out[peel_pos[t]] = f & fp_mask;
        }
    }

    free(count); free(xormask); free(stack); free(peel_keys); free(peel_pos);
    return peeled;
}

/* Probe: out[i] = 1 iff fp(h) ^ fps[p0] ^ .. ^ fps[p_arity-1] == 0
 * (ref src/xorf.zig:42-50). Fingerprints supplied as u64 (widened). */
void xorf_contains(const uint64_t *fps, uint64_t seed, int32_t arity,
                   int64_t seg_len_i, int64_t scl_i, int32_t fp_bits,
                   const uint64_t *hashes, int64_t n, uint8_t *out) {
    uint64_t seg_len = (uint64_t)seg_len_i;
    uint64_t seg_mask = seg_len - 1;
    uint64_t scl = (uint64_t)scl_i;
    int span = (arity == 3) ? 18 : 12;
    int bits = span * arity;
    uint64_t hh_mask = bits >= 64 ? ~0ULL : ((1ULL << bits) - 1);
    uint64_t fp_mask = fp_bits >= 64 ? ~0ULL : ((1ULL << fp_bits) - 1);
    for (int64_t i = 0; i < n; i++) {
        uint64_t h = murmur_mix(hashes[i], seed);
        uint64_t hl = mulhi64(h, scl);
        uint64_t acc = (h ^ (h >> 32)) & fp_mask;
        for (int j = 0; j < arity; j++) {
            uint64_t p = xorf_pos(h, hl, hh_mask, span, arity, j, seg_len, seg_mask);
            acc ^= fps[p] & fp_mask;
        }
        out[i] = acc == 0;
    }
}

/* ---------------- ribbon (ref src/ribbon.zig) ---------------- */

/* Vectorized-batch ribbon probe (ref src/ribbon.zig:141-192): recompute
 * the key's start/coeff/result, XOR the solution rows selected by the
 * coefficient bits, compare. Solution rows arrive widened to u64. */
void ribbon_contains(const uint64_t *solution, int64_t size, uint64_t seed,
                     int32_t coeff_bits, int32_t result_bits,
                     const uint64_t *hashes, int64_t n, uint8_t *out) {
    int64_t start_range = size + 1 - coeff_bits;
    uint64_t w = (uint64_t)(coeff_bits / 8);
    uint64_t rmask = result_bits >= 64 ? ~0ULL : ((1ULL << result_bits) - 1);
    uint64_t sa = seed * 0x876f170be4f1fcb9ULL;
    uint64_t sb = seed * 0xf0433a4aecda4c5fULL;
    for (int64_t i = 0; i < n; i++) {
        uint64_t h = hashes[i];
        uint64_t hash0 = seed ^ h;
        uint64_t h32 = (hash0 ^ (hash0 >> 32)) & 0xffffffffULL;
        uint64_t smash = (((uint64_t)start_range + w * 2) * h32) >> 32;
        uint64_t pos = smash > w ? smash - w : 0;
        uint64_t lim = (uint64_t)(start_range - 1);
        int64_t start = (int64_t)(pos < lim ? pos : lim);
        uint64_t expected = ((hash0 >> 32) ^ hash0) & rmask;
        uint64_t acc = 0;
        /* iterate set coefficient bits only (~half the window; measured
         * 105 -> 65 ns/q for u128 vs the dense masked loop) */
        if (coeff_bits == 128) {
            uint64_t chi = sa ^ h;
            uint64_t clo = (sb ^ __builtin_bswap64(h)) | 1ULL;
            while (clo) {
                acc ^= solution[start + __builtin_ctzll(clo)];
                clo &= clo - 1;
            }
            while (chi) {
                acc ^= solution[start + 64 + __builtin_ctzll(chi)];
                chi &= chi - 1;
            }
        } else {
            uint64_t cr = coeff_bits == 32 ? ((hash0 & 0xffffffffULL) | 1ULL)
                                           : (hash0 | 1ULL);
            while (cr) {
                acc ^= solution[start + __builtin_ctzll(cr)];
                cr &= cr - 1;
            }
        }
        out[i] = acc == expected;
    }
}

/* Full construction attempt: per-key params (ref src/ribbon.zig:9-49),
 * single-pass stable bucket sort by the top 16 bits of start position
 * (ascending-ish insertion keeps elimination cascades cache-local;
 * solvability is order-independent, and the numpy fallback uses the same
 * bucket key so solutions stay byte-identical across backends), then
 * incremental banded elimination (ref :77-104) + bit-plane
 * back-substitution (ref :108-134) over an interleaved slot array.
 * Returns 0 ok, 1 inconsistent (retry next seed), -1 alloc fail. */
int32_t ribbon_attempt(const uint64_t *hashes, int64_t n, uint64_t seed,
                       int64_t size, int32_t coeff_bits, int32_t result_bits,
                       uint64_t *solution_out) {
    int64_t start_range = size + 1 - coeff_bits;
    uint64_t w = (uint64_t)(coeff_bits / 8);
    uint64_t rmask = result_bits >= 64 ? ~0ULL : ((1ULL << result_bits) - 1);
    int use128 = coeff_bits == 128;
    int64_t cap = n > 0 ? n : 1;

    uint32_t *start = (uint32_t *)malloc((size_t)cap * 4);
    uint64_t *clo = (uint64_t *)malloc((size_t)cap * 8);
    uint64_t *chi = use128 ? (uint64_t *)malloc((size_t)cap * 8) : NULL;
    uint64_t *rrow = (uint64_t *)malloc((size_t)cap * 8);
    uint32_t *start_s = (uint32_t *)malloc((size_t)cap * 4);
    uint64_t *clo_s = (uint64_t *)malloc((size_t)cap * 8);
    uint64_t *chi_s = use128 ? (uint64_t *)malloc((size_t)cap * 8) : NULL;
    uint64_t *rrow_s = (uint64_t *)malloc((size_t)cap * 8);
    int64_t *off = (int64_t *)calloc(65537, sizeof(int64_t));
    if (!start || !clo || (use128 && (!chi || !chi_s)) || !rrow || !start_s ||
        !clo_s || !rrow_s || !off) {
        free(start); free(clo); free(chi); free(rrow);
        free(start_s); free(clo_s); free(chi_s); free(rrow_s); free(off);
        return -1;
    }

    /* bucket shift: top 16 bits of the start-position range */
    int sbits = 0;
    {
        uint64_t v = start_range > 1 ? (uint64_t)(start_range - 1) : 0;
        while (v) { sbits++; v >>= 1; }
    }
    int shift = sbits > 16 ? sbits - 16 : 0;

    uint64_t sa = seed * 0x876f170be4f1fcb9ULL; /* COEFF_FACTOR0, ref :19 */
    uint64_t sb = seed * 0xf0433a4aecda4c5fULL; /* COEFF_FACTOR1, ref :20 */
    for (int64_t i = 0; i < n; i++) {
        uint64_t h = hashes[i];
        uint64_t hash0 = seed ^ h;
        uint64_t h32 = (hash0 ^ (hash0 >> 32)) & 0xffffffffULL;
        uint64_t smash = (((uint64_t)start_range + w * 2) * h32) >> 32;
        uint64_t pos = smash > w ? smash - w : 0;
        uint64_t lim = (uint64_t)(start_range - 1);
        uint32_t st = (uint32_t)(pos < lim ? pos : lim);
        start[i] = st;
        off[(st >> shift) + 1]++;
        if (use128) {
            chi[i] = sa ^ h;
            clo[i] = (sb ^ __builtin_bswap64(h)) | 1ULL;
        } else if (coeff_bits == 32) {
            clo[i] = (hash0 & 0xffffffffULL) | 1ULL;
        } else {
            clo[i] = hash0 | 1ULL;
        }
        rrow[i] = ((hash0 >> 32) ^ hash0) & rmask;
    }
    for (int d = 0; d < 65536; d++) off[d + 1] += off[d];
    for (int64_t i = 0; i < n; i++) {
        int64_t o = off[start[i] >> shift]++;
        start_s[o] = start[i];
        clo_s[o] = clo[i];
        if (use128) chi_s[o] = chi[i];
        rrow_s[o] = rrow[i];
    }

    int32_t status;
    if (!use128) {
        typedef struct { uint64_t coeff; uint64_t result; } slot64_t;
        slot64_t *slots = (slot64_t *)calloc((size_t)size, sizeof(slot64_t));
        if (!slots) { status = -1; goto done; }
        status = 0;
        for (int64_t t = 0; t < n; t++) {
            int64_t pos = (int64_t)start_s[t];
            uint64_t cr = clo_s[t];
            uint64_t rr = rrow_s[t];
            for (;;) {
                uint64_t ex = slots[pos].coeff;
                if (ex == 0) { slots[pos].coeff = cr; slots[pos].result = rr; break; }
                cr ^= ex;
                rr ^= slots[pos].result;
                if (cr == 0) {
                    if (rr != 0) status = 1;
                    break;
                }
                int tz = __builtin_ctzll(cr);
                pos += tz;
                cr >>= tz;
            }
            if (status) break;
        }
        if (status == 0) {
            uint64_t cmask =
                coeff_bits >= 64 ? ~0ULL : ((1ULL << coeff_bits) - 1);
            uint64_t planes[32] = {0};
            for (int64_t i = size - 1; i >= 0; i--) {
                uint64_t cr = slots[i].coeff, rr = slots[i].result, srow = 0;
                for (int j = 0; j < result_bits; j++) {
                    uint64_t tmp = (planes[j] << 1) & cmask;
                    uint64_t bit = (uint64_t)(__builtin_popcountll(tmp & cr) & 1) ^
                                   ((rr >> j) & 1);
                    planes[j] = tmp | bit;
                    srow |= bit << j;
                }
                solution_out[i] = srow;
            }
        }
        free(slots);
    } else {
        typedef unsigned __int128 u128;
        typedef struct { u128 coeff; uint64_t result; } slot128_t;
        slot128_t *slots = (slot128_t *)calloc((size_t)size, sizeof(slot128_t));
        if (!slots) { status = -1; goto done; }
        status = 0;
        for (int64_t t = 0; t < n; t++) {
            int64_t pos = (int64_t)start_s[t];
            u128 cr = ((u128)chi_s[t] << 64) | clo_s[t];
            uint64_t rr = rrow_s[t];
            for (;;) {
                u128 ex = slots[pos].coeff;
                if (ex == 0) { slots[pos].coeff = cr; slots[pos].result = rr; break; }
                cr ^= ex;
                rr ^= slots[pos].result;
                if (cr == 0) {
                    if (rr != 0) status = 1;
                    break;
                }
                uint64_t lo = (uint64_t)cr;
                int tz = lo ? __builtin_ctzll(lo)
                            : 64 + __builtin_ctzll((uint64_t)(cr >> 64));
                pos += tz;
                cr >>= tz;
            }
            if (status) break;
        }
        if (status == 0) {
            u128 planes[32] = {0};
            for (int64_t i = size - 1; i >= 0; i--) {
                u128 cr = slots[i].coeff;
                uint64_t rr = slots[i].result, srow = 0;
                for (int j = 0; j < result_bits; j++) {
                    u128 tmp = planes[j] << 1;
                    u128 x = tmp & cr;
                    uint64_t par =
                        (uint64_t)(__builtin_popcountll((uint64_t)x) +
                                   __builtin_popcountll((uint64_t)(x >> 64))) & 1;
                    uint64_t bit = par ^ ((rr >> j) & 1);
                    planes[j] = tmp | bit;
                    srow |= bit << j;
                }
                solution_out[i] = srow;
            }
        }
        free(slots);
    }

done:
    free(start); free(clo); free(chi); free(rrow);
    free(start_s); free(clo_s); free(chi_s); free(rrow_s); free(off);
    return status;
}
