"""Hash-primitive exactness gates.

SplitMix64 is checked against the published test vectors (Vigna's reference
implementation, seed 0) — the same stream Zig's std.Random.SplitMix64
produces, which the reference's construction-seed sequences depend on
(src/xorf.zig:134, src/ribbon.zig:61,208). Murmur2-64 and mulhi are checked
for vectorized/scalar agreement and algebraic properties.
"""

import numpy as np

from filterz_spark.hashing import (
    SplitMix64, mulhi64, murmur64_mix, reduce32, splitmix64_array,
)

# first outputs of SplitMix64(seed=0), Vigna reference implementation
SPLITMIX64_SEED0 = [
    0xE220A8397B1DCDAF, 0x6E789E6AA1B965F4, 0x06C45D188009454F,
]


def test_splitmix64_published_vectors():
    sm = SplitMix64(0)
    assert [sm.next() for _ in range(3)] == SPLITMIX64_SEED0


def test_splitmix64_scalar_vector_agree():
    for seed in (0, 12, 0x726B2B9D438B9D4D):
        sm = SplitMix64(seed)
        scalars = [sm.next() for _ in range(100)]
        assert scalars == [int(x) for x in splitmix64_array(seed, 100)]


def test_murmur64_mix_properties():
    h = splitmix64_array(5, 10_000)
    a = murmur64_mix(h, 42)
    b = murmur64_mix(h, 43)
    # distinct seeds decorrelate; same seed is a pure function
    assert (a != b).mean() > 0.999
    assert (murmur64_mix(h, 42) == a).all()
    # uniform-ish: high bit set ~half the time
    assert 0.45 < (a >> np.uint64(63)).mean() < 0.55


def test_murmur64_mix_scalar_reference():
    """Cross-check the vectorized Murmur2-64 against a direct scalar
    transliteration of Zig std.hash.Murmur2_64.hashUint64WithSeed."""
    M = 0xC6A4A7935BD1E995
    MASK = (1 << 64) - 1

    def scalar(v, seed):
        h = (seed ^ ((8 * M) & MASK)) & MASK
        k = (v * M) & MASK
        k ^= k >> 47
        k = (k * M) & MASK
        h ^= k
        h = (h * M) & MASK
        h ^= h >> 47
        h = (h * M) & MASK
        h ^= h >> 47
        return h

    vals = splitmix64_array(9, 200)
    got = murmur64_mix(vals, 0xDEADBEEF)
    for v, g in zip(vals, got):
        assert scalar(int(v), 0xDEADBEEF) == int(g)


def test_mulhi64_exact():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 1 << 63, 1000, dtype=np.int64).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    for b in (1, 12345, 0xFFFFFFFF, 0x123456789ABCDEF0):
        hi = mulhi64(a, b)
        for x, h in zip(a[:50], hi[:50]):
            assert (int(x) * b) >> 64 == int(h)


def test_reduce32_range():
    x = splitmix64_array(7, 10_000) & np.uint64(0xFFFFFFFF)
    for length in (1, 7, 1000, 1 << 20):
        r = reduce32(length, x)
        assert r.max() < length and r.min() >= 0
