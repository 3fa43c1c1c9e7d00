"""Property-based fuzz tests mirroring the reference's fuzz harness
(/root/reference/src/fuzz.zig: arbitrary byte-string key sets -> dedup ->
build -> assert zero false negatives; src/tests.zig:128-132 runs the whole
filter matrix under fuzz).

Keys here are arbitrary byte strings hashed with xxhash64 semantics stand-in
(blake2b-derived u64 — the kernels are hash-agnostic); hypothesis drives the
key-set shapes (sizes, duplicates, adversarial patterns like shared prefixes
and tiny alphabets).
"""

import hashlib

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from filterz_spark.filters import RibbonFilter, SbbfFilter, XorFilter


def _hash_keys(keys: list[bytes]) -> np.ndarray:
    out = np.empty(len(keys), dtype=np.uint64)
    for i, k in enumerate(keys):
        out[i] = int.from_bytes(hashlib.blake2b(k, digest_size=8).digest(), "little")
    return np.unique(out)


key_sets = st.lists(
    st.binary(min_size=0, max_size=40), min_size=1, max_size=300,
)

structured_key_sets = st.lists(
    st.tuples(st.sampled_from([b"http://", b"https://", b""]),
              st.text(alphabet="ab", min_size=0, max_size=20)),
    min_size=1, max_size=200,
).map(lambda ps: [p + s.encode() for p, s in ps])


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(keys=key_sets)
def test_fuzz_zero_fn_all_kinds(keys):
    hashes = _hash_keys(keys)
    for build in (
        lambda h: SbbfFilter.build(h, 16),
        lambda h: XorFilter.build(h, 3, 16),
        lambda h: XorFilter.build(h, 4, 8),
        lambda h: RibbonFilter.build(h, 64, 16),
    ):
        f = build(hashes)
        assert f.check(hashes).all(), "false negative under fuzz"


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(keys=structured_key_sets)
def test_fuzz_adversarial_key_shapes(keys):
    """Shared prefixes + 2-letter alphabet: worst-case key structure must not
    break construction (hashing decorrelates; mirrors the url key domain)."""
    hashes = _hash_keys(keys)
    f = XorFilter.build(hashes, 3, 16)
    assert f.check(hashes).all()
    r = RibbonFilter.build(hashes, 128, 16)
    assert r.check(hashes).all()


@settings(max_examples=25, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**32 - 1),
       n=st.integers(min_value=1, max_value=5000))
def test_fuzz_random_sizes_roundtrip(seed, n):
    """Construction succeeds and serialization round-trips at arbitrary n
    (the reference's own scheme failed at specific sizes — guard ours)."""
    from filterz_spark.hashing import splitmix64_array

    hashes = np.unique(splitmix64_array(seed, n))
    f = XorFilter.build(hashes, 3, 16)
    g = XorFilter.deserialize(f.serialize(), f.params())
    assert g.check(hashes).all()
