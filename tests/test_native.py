"""Native (C) kernel backend — equivalence with the numpy fallbacks.

Contracts:
- sbbf: insert is an order-insensitive OR, so the C and numpy backends must
  produce BYTE-IDENTICAL filters (and identical probe answers).
- ribbon: the C kernel inserts rows in the same stable bucket order as the
  numpy fallback, so solutions must be BYTE-IDENTICAL.
- xorf: the C backend runs the reference's sequential queue peel
  (src/xorf.zig:167-216) while the numpy fallback peels in rounds; a seed
  succeeds iff the hypergraph 2-core is empty — a property of (seed,
  positions) only — so both backends must pick the SAME seed and satisfy
  the same membership equation (zero FN, FPR bound), but payload bytes may
  differ (different slot-assignment order). Determinism within a backend is
  what the Spark layer relies on (checkpoint/resume), and the backend is an
  import-time property of the whole session, so cross-backend divergence is
  never observed inside one build.
"""

from __future__ import annotations

import numpy as np
import pytest

from filterz_spark import native
from filterz_spark.filters import ribbon, sbbf, xorf
from filterz_spark.hashing import splitmix64_array

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C compiler available"
)


@pytest.fixture
def no_native(monkeypatch):
    monkeypatch.setenv("FILTERZ_NATIVE", "0")
    yield
    monkeypatch.setenv("FILTERZ_NATIVE", "1")


def _keys(n: int, seed: int = 7) -> np.ndarray:
    return np.unique(splitmix64_array(seed, n))


class TestSbbfBackends:
    def test_insert_byte_identical(self, monkeypatch):
        h = _keys(50_000)
        b_c = sbbf.empty_blocks(h.size, 24)
        sbbf.insert(b_c, h)
        monkeypatch.setenv("FILTERZ_NATIVE", "0")
        b_np = sbbf.empty_blocks(h.size, 24)
        sbbf.insert(b_np, h)
        assert np.array_equal(b_c, b_np)

    def test_contains_matches_numpy(self, monkeypatch):
        h = _keys(20_000)
        b = sbbf.empty_blocks(h.size, 16)
        sbbf.insert(b, h)
        probes = splitmix64_array(123, 30_000)
        got_c = sbbf.contains(b, probes)
        monkeypatch.setenv("FILTERZ_NATIVE", "0")
        got_np = sbbf.contains(b, probes)
        assert np.array_equal(got_c, got_np)
        assert sbbf.contains(b, h).all()  # zero FN through either path


class TestRibbonBackends:
    @pytest.mark.parametrize("cb,rb", [(32, 8), (64, 16), (64, 7), (128, 16)])
    def test_solution_byte_identical(self, monkeypatch, cb, rb):
        h = _keys(30_000)
        seed_c, sol_c = ribbon.construct(h, cb, rb)
        monkeypatch.setenv("FILTERZ_NATIVE", "0")
        seed_np, sol_np = ribbon.construct(h, cb, rb)
        assert seed_c == seed_np
        assert np.array_equal(sol_c, sol_np)
        assert ribbon.contains(sol_c, seed_c, cb, rb, h.size, h).all()

    def test_tiny_and_empty(self):
        for n in (0, 1, 2, 5):
            h = _keys(n) if n else np.zeros(0, dtype=np.uint64)
            seed, sol = ribbon.construct(h, 64, 8)
            if n:
                assert ribbon.contains(sol, seed, 64, 8, n, h).all()


class TestXorfBackends:
    @pytest.mark.parametrize("arity,fp_bits", [(3, 16), (4, 16), (3, 8), (4, 7)])
    def test_same_seed_same_semantics(self, monkeypatch, arity, fp_bits):
        h = _keys(40_000)
        hdr_c, fp_c = xorf.construct(h, arity, fp_bits)
        monkeypatch.setenv("FILTERZ_NATIVE", "0")
        hdr_np, fp_np = xorf.construct(h, arity, fp_bits)
        # identical geometry and (crucially) the same succeeding seed
        assert hdr_c.seed == hdr_np.seed
        assert hdr_c.array_length == hdr_np.array_length
        # zero FN through both probe paths, for both constructions
        assert xorf.contains(hdr_c, fp_c, arity, fp_bits, h).all()
        assert xorf.contains(hdr_np, fp_np, arity, fp_bits, h).all()
        monkeypatch.setenv("FILTERZ_NATIVE", "1")
        assert xorf.contains(hdr_np, fp_np, arity, fp_bits, h).all()

    def test_probe_matches_numpy_probe(self, monkeypatch):
        h = _keys(25_000)
        hdr, fp = xorf.construct(h, 3, 16)
        probes = splitmix64_array(55, 50_000)
        got_c = xorf.contains(hdr, fp, 3, 16, probes)
        monkeypatch.setenv("FILTERZ_NATIVE", "0")
        got_np = xorf.contains(hdr, fp, 3, 16, probes)
        assert np.array_equal(got_c, got_np)

    def test_fpr_within_bound(self):
        h = _keys(100_000)
        hdr, fp = xorf.construct(h, 3, 16)
        probes = splitmix64_array(999, 400_000)
        hits = int(xorf.contains(hdr, fp, 3, 16, probes).sum())
        # bound 2^-16; Poisson tolerance at 400k probes (expect ~6, allow 3x)
        assert hits <= 20

    def test_deterministic_within_backend(self):
        h = _keys(30_000)
        hdr1, fp1 = xorf.construct(h, 3, 16)
        hdr2, fp2 = xorf.construct(h, 3, 16)
        assert hdr1.seed == hdr2.seed
        assert np.array_equal(fp1, fp2)

    def test_empty_and_tiny(self):
        for n in (0, 1, 2):
            h = _keys(n) if n else np.zeros(0, dtype=np.uint64)
            hdr, fp = xorf.construct(h, 3, 16)
            if n:
                assert xorf.contains(hdr, fp, 3, 16, h).all()


def test_fallback_env_gate(no_native):
    assert not native.available()
    assert native.sbbf_insert(np.zeros((4, 8), np.uint64),
                              np.arange(4, dtype=np.uint64)) is False
    assert native.ribbon_attempt(np.arange(4, dtype=np.uint64), 1, 100, 64, 8) is None


class TestSbbfInsertCheck:
    """block_insert_check parity (ref src/sbbf.zig:45-52): sequential
    insert-and-report-presence, duplicates report present."""

    def test_semantics_and_backend_equivalence(self, monkeypatch):
        h = _keys(5_000)
        batch = np.concatenate([h, h[:100]])  # trailing duplicates
        b_c = sbbf.empty_blocks(h.size, 16)
        got_c = sbbf.insert_check(b_c, batch)
        monkeypatch.setenv("FILTERZ_NATIVE", "0")
        b_np = sbbf.empty_blocks(h.size, 16)
        got_np = sbbf.insert_check(b_np, batch)
        assert np.array_equal(b_c, b_np)
        assert np.array_equal(got_c, got_np)
        # every trailing duplicate reports present; filter state equals
        # a plain insert of the same batch
        assert got_c[-100:].all()
        b_plain = sbbf.empty_blocks(h.size, 16)
        sbbf.insert(b_plain, batch)
        assert np.array_equal(b_c, b_plain)
        # fresh-key presence reports are rare (FPR-level) on first insert
        assert got_c[:100].sum() <= 5


def test_broken_compiler_falls_back_to_numpy(monkeypatch, tmp_path):
    """With no working C compiler and no cached .so, the library must fall
    back to the numpy kernels transparently (available() False, filters
    still correct)."""
    import tempfile
    monkeypatch.setenv("CC", "/bin/false")
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    monkeypatch.setattr(native, "_lib", None)  # force a fresh load attempt
    try:
        assert native.available() is False
        h = _keys(5_000)
        hdr, fp = xorf.construct(h, 3, 16)
        assert xorf.contains(hdr, fp, 3, 16, h).all()
        seed, sol = ribbon.construct(h, 64, 8)
        assert ribbon.contains(sol, seed, 64, 8, h.size, h).all()
    finally:
        monkeypatch.setattr(native, "_lib", None)  # re-probe real gcc later


def test_native_sbbf_insert_rejects_read_only_blocks():
    """ndpointer does not check WRITEABLE: without the guard, inserting
    into a deserialized (bytes-backed, read-only) filter would silently
    corrupt the immutable payload every other holder shares."""
    import numpy as np
    import pytest

    from filterz_spark import native
    from filterz_spark.filters import SbbfFilter
    from filterz_spark.hashing import splitmix64_array

    if not native.available():
        pytest.skip("native kernels unavailable")
    f = SbbfFilter.build(splitmix64_array(1, 2000), bits_per_key=16)
    payload = f.serialize()
    g = SbbfFilter.deserialize(payload, f.params())
    snapshot = bytes(payload)
    with pytest.raises(ValueError, match="read-only"):
        native.sbbf_insert(g.blocks, splitmix64_array(2, 10))
    with pytest.raises(ValueError, match="read-only"):
        native.sbbf_insert_check(g.blocks, splitmix64_array(2, 10))
    assert bytes(payload) == snapshot
