"""Split-Block Bloom Filter (SBBF) — vectorized numpy kernel.

Semantics mirror the reference (steelcake/filterz ``src/sbbf.zig``, which
follows the Apache Parquet BloomFilter spec):

- the filter is a flat array of 64-byte blocks; each block is 8 lanes of u64
  (ref src/sbbf.zig:5-7);
- a key's block is picked by multiply-shift reduction of the LOW 32 bits of
  its u64 hash (ref src/sbbf.zig:28-30, :55);
- inside the block, one bit per lane is set: bit ``((hash * SALT[lane]) >> 27) & 63``
  (ref src/sbbf.zig:72-80) — 8 bits per key, one cache line per probe;
- sizing: ``roundup(ceil(bits_per_key * n / 8), 64)`` bytes, zero-initialized
  (ref src/sbbf.zig:94-107);
- serialized bytes are little-endian u64 lanes (ref src/sbbf.zig:9-26).

The SIMD lane-parallelism of the reference becomes numpy batch-parallelism:
we insert/probe whole uint64 hash arrays at once, never per-row Python.

SBBF is the one natively MERGEABLE filter here: insert is an idempotent,
commutative bitwise OR into a fixed-size array (ref src/sbbf.zig:39-43), so
two filters built with the same geometry merge by ``a | b``. That makes it
usable both as a partition-local skip index and as a global mergeable
aggregate (treeAggregate / two-level applyInPandas).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 64  # bytes per block (ref src/sbbf.zig:7)
LANES = 8

# ref src/sbbf.zig:80
SALT = np.array(
    [0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
     0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31],
    dtype=np.uint64,
)

_SHR = np.uint64(27)
_LOW32 = np.uint64(0xFFFFFFFF)
_B63 = np.uint64(63)
_ONE = np.uint64(1)


def num_bytes(num_keys: int, bits_per_key: int) -> int:
    """Filter size in bytes: ceil(bpk*n/8) rounded up to 64 (ref src/sbbf.zig:95)."""
    raw = (bits_per_key * num_keys + 7) // 8
    return (raw + BLOCK_SIZE - 1) // BLOCK_SIZE * BLOCK_SIZE


def _masks(hashes: np.ndarray) -> np.ndarray:
    """(n, 8) uint64 block masks — one bit per lane (ref src/sbbf.zig:72-80)."""
    x = (hashes[:, None] * SALT[None, :]) >> _SHR
    return _ONE << (x & _B63)


def _block_indices(num_blocks: int, hashes: np.ndarray) -> np.ndarray:
    """Block per key from low 32 hash bits (ref src/sbbf.zig:28-30, :55)."""
    return ((np.uint64(num_blocks) * (hashes & _LOW32)) >> np.uint64(32)).astype(np.int64)


def empty_blocks(num_keys: int, bits_per_key: int) -> np.ndarray:
    """Zeroed (num_blocks, 8) uint64 block array for the given capacity."""
    return np.zeros((num_bytes(num_keys, bits_per_key) // BLOCK_SIZE, LANES), dtype=np.uint64)


def insert(blocks: np.ndarray, hashes: np.ndarray) -> None:
    """Scatter-OR a batch of u64 hashes into the block array (in place).

    Equivalent to the reference's per-key ``filter_insert`` loop
    (src/sbbf.zig:64-66, :94-107) but one vectorized pass per batch.
    """
    if blocks.shape[0] == 0 or hashes.size == 0:
        return
    h = hashes.astype(np.uint64, copy=False)
    from .. import native
    if native.sbbf_insert(blocks, h):  # byte-identical C fast path
        return
    idx = _block_indices(blocks.shape[0], h)
    m = _masks(h)
    # sort-by-block + bitwise_or.reduceat beats np.bitwise_or.at (per-element
    # scatter) ~5x: one OR-reduction per occupied block, then a plain gather
    order = np.argsort(idx, kind="stable")
    si = idx[order]
    sm = m[order]
    starts = np.flatnonzero(np.concatenate(([True], si[1:] != si[:-1])))
    reduced = np.bitwise_or.reduceat(sm, starts, axis=0)
    tgt = si[starts]
    blocks[tgt] |= reduced


def insert_check(blocks: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Insert a batch and report, per key, whether it was maybe-present at
    its turn (ref ``block_insert_check``/``filter_insert_check``,
    src/sbbf.zig:45-52, :68-70 — sequential semantics, so a duplicate later
    in the batch reports present). The C kernel is the hot path; the numpy
    fallback loops per key over vectorized lane ops (this API exists for
    reference parity — build-once pipelines use ``insert``)."""
    if hashes.size == 0:
        return np.zeros(0, dtype=bool)
    h = hashes.astype(np.uint64, copy=False)
    from .. import native
    res = native.sbbf_insert_check(blocks, h)
    if res is not None:
        return res
    nb = blocks.shape[0]
    out = np.empty(h.size, dtype=bool)
    for i in range(h.size):
        hi = h[i : i + 1]
        idx = _block_indices(nb, hi)[0]
        m = _masks(hi)[0]
        out[i] = bool(((blocks[idx] & m) == m).all())
        blocks[idx] |= m
    return out


def contains(blocks: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Vectorized probe: bool array, True where all 8 lane bits are set
    (ref src/sbbf.zig:32-37, :60-62)."""
    if hashes.size == 0:
        return np.zeros(0, dtype=bool)
    if blocks.shape[0] == 0:
        return np.zeros(hashes.size, dtype=bool)
    h = hashes.astype(np.uint64, copy=False)
    from .. import native
    res = native.sbbf_contains(blocks, h)
    if res is not None:
        return res
    idx = _block_indices(blocks.shape[0], h)
    m = _masks(h)
    return ((blocks[idx] & m) == m).all(axis=1)


def merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """OR-merge two equal-geometry filters (insert is an idempotent OR,
    ref src/sbbf.zig:39-43 — order- and duplication-insensitive)."""
    if a.shape != b.shape:
        raise ValueError(f"sbbf merge: geometry mismatch {a.shape} vs {b.shape}")
    return np.bitwise_or(a, b)


def serialize(blocks: np.ndarray) -> bytes:
    """Little-endian u64 lane bytes (ref src/sbbf.zig:9-26 normalizes to LE)."""
    return blocks.astype("<u8", copy=False).tobytes()


def deserialize(payload: bytes) -> np.ndarray:
    arr = np.frombuffer(payload, dtype="<u8").astype(np.uint64, copy=False)
    return arr.reshape(-1, LANES)


class SbbfFilter:
    """Build-once SBBF over a deduplicated u64 hash array.

    Mirrors the reference high-level API (``Filter(bits_per_key).init/check/
    mem_usage/ideal_mem_usage``, src/sbbf.zig:86-125).
    """

    kind = "sbbf"

    def __init__(self, blocks: np.ndarray, bits_per_key: int, num_keys: int) -> None:
        self.blocks = blocks
        self.bits_per_key = bits_per_key
        self.num_keys = num_keys

    @classmethod
    def build(cls, hashes: np.ndarray, bits_per_key: int = 16) -> "SbbfFilter":
        blocks = empty_blocks(len(hashes), bits_per_key)
        insert(blocks, hashes)
        return cls(blocks, bits_per_key, len(hashes))

    def check(self, hashes: np.ndarray) -> np.ndarray:
        return contains(self.blocks, hashes)

    def mem_usage(self) -> int:
        return self.blocks.size * 8

    def ideal_mem_usage(self) -> int:
        return self.num_keys * self.bits_per_key // 8

    def params(self) -> dict:
        return {"bits_per_key": str(self.bits_per_key), "num_keys": str(self.num_keys)}

    def serialize(self) -> bytes:
        return serialize(self.blocks)

    @classmethod
    def deserialize(cls, payload: bytes, params: dict) -> "SbbfFilter":
        return cls(deserialize(payload), int(params["bits_per_key"]), int(params["num_keys"]))

    def merge_with(self, other: "SbbfFilter") -> "SbbfFilter":
        if self.bits_per_key != other.bits_per_key:
            raise ValueError("sbbf merge: bits_per_key mismatch")
        return SbbfFilter(
            merge(self.blocks, other.blocks),
            self.bits_per_key,
            self.num_keys + other.num_keys,
        )
