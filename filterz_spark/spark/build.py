"""Partition filter builds — the Spark form of the reference's section model.

The reference cuts a 50M-key stream into ~1M-key sections and builds one
filter per section (src/bench.zig:33-50, :240-249). Here a "section" is a
DataFrame partition: keys are hashed JVM-side with the built-in ``xxhash64``
(zero per-row Python), shuffled once by hash so duplicates co-locate, and
each partition builds its filter inside one ``mapInArrow`` pass — sort+dedup
via ``np.unique`` (the reference's hash_section, src/bench.zig:258-280),
then the numpy kernel. The result is a small "filter index" DataFrame (one
row per partition: payload + params + lineage + metrics mirroring BenchStats,
src/bench.zig:186-193) that can be checkpointed and broadcast for probes.

Scale posture: the single shuffle is by the key hash itself, so skew in raw
keys (hot urls/langs) is irrelevant — xxhash64 output is uniform. Partition
count P sizes each build at num_keys/P; construction cost and failure
probability are per-partition, and a failed partition retries locally without
touching the others (attempts recorded in lineage).
"""

from __future__ import annotations

import json
import time
from typing import Iterator

import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import DataFrame, functions as F

from ..filters import FILTER_KINDS

# filter-index schema: one row per partition SHARD (normally one shard per
# partition; a partition whose Las-Vegas construction exhausts its seed
# budget is re-split into halves — ref ConstructError is a real code path,
# src/xorf.zig:52-56, src/ribbon.zig:136-138)
INDEX_SCHEMA = (
    "partition_id int, shard int, kind string, params string, num_keys long, "
    "payload binary, build_ns long, mem_usage long, ideal_mem_usage long, "
    "attempts int"
)

INDEX_FIELDS = ["partition_id", "shard", "kind", "params", "num_keys", "payload",
                "build_ns", "mem_usage", "ideal_mem_usage", "attempts"]

MAX_SPLIT_DEPTH = 4  # a partition may re-split at most this many times

# explicit Arrow schema: pyarrow would otherwise infer int64 for the int32
# fields and Spark's ArrowColumnVector rejects the width mismatch
_ARROW_INDEX_SCHEMA = pa.schema([
    ("partition_id", pa.int32()),
    ("shard", pa.int32()),
    ("kind", pa.string()),
    ("params", pa.string()),
    ("num_keys", pa.int64()),
    ("payload", pa.binary()),
    ("build_ns", pa.int64()),
    ("mem_usage", pa.int64()),
    ("ideal_mem_usage", pa.int64()),
    ("attempts", pa.int32()),
])


def hashed_keys(df: DataFrame, key_col: str) -> DataFrame:
    """Project the key column to its u64 hash JVM-side (xxhash64, seed 42).

    Catalyst prunes the scan to this single column (check ReadSchema in
    .explain); no Python touches raw keys.
    """
    return df.select(F.xxhash64(key_col).alias("h"))


def _construct_errors() -> tuple:
    """The Las-Vegas construction-failure types (executor-side import)."""
    from ..filters import ribbon, xorf
    return (xorf.ConstructError, ribbon.ConstructError, MemoryError)


def _build_partition_fn(kind: str, params: dict, skip_pids: frozenset | None = None):
    """mapInArrow closure: accumulate the partition's hashes, dedup, build."""

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np  # executor-side

        pid = TaskContext.get().partitionId()
        if skip_pids and pid in skip_pids:
            return  # before consuming: a skipped partition's batches are
            # never pulled through Arrow or materialized
        chunks = []
        for batch in batches:
            chunks.append(batch.column(0).to_numpy(zero_copy_only=False))
        if not chunks:
            return
        # int64 -> uint64 reinterpret, then sort+dedup (ref src/bench.zig:258-280)
        hashes = np.unique(np.concatenate(chunks).astype(np.int64).view(np.uint64))
        # Las-Vegas construction can fail after its seed budget; re-split the
        # partition's keys in halves and build shard filters (probe semantics
        # are OR-over-filters, so shards compose transparently)
        pending = [(hashes, 0)]
        shards = []
        attempts = 0
        while pending:
            h, depth = pending.pop()
            attempts += 1
            t0 = time.monotonic_ns()
            try:
                filt = FILTER_KINDS[kind].build(h, **params)
            except _construct_errors() as exc:  # noqa: F841
                # ONLY Las-Vegas seed exhaustion triggers a re-split —
                # a bad param / type error is not size-dependent and would
                # otherwise burn 2^depth redundant rebuild attempts before
                # surfacing from a leaf
                if depth >= MAX_SPLIT_DEPTH:
                    raise
                mid = h.size // 2
                pending.append((h[:mid], depth + 1))
                pending.append((h[mid:], depth + 1))
                continue
            shards.append((filt, int(h.size), time.monotonic_ns() - t0))
        for shard_id, (filt, nk, build_ns) in enumerate(shards):
            yield pa.RecordBatch.from_pydict({
                "partition_id": [pid],
                "shard": [shard_id],
                "kind": [kind],
                "params": [json.dumps(filt.params())],
                "num_keys": [nk],
                "payload": [filt.serialize()],
                "build_ns": [build_ns],
                "mem_usage": [filt.mem_usage()],
                "ideal_mem_usage": [filt.ideal_mem_usage()],
                "attempts": [attempts],
            }, schema=_ARROW_INDEX_SCHEMA)

    return fn


def build_filter_index(df: DataFrame, key_col: str, kind: str = "xorf",
                       params: dict | None = None,
                       num_partitions: int | None = None,
                       skip_pids: frozenset | None = None,
                       pre_partitioned: bool = False) -> DataFrame:
    """Hash keys, co-locate duplicates, build one filter per partition.

    ``repartition(P, h)`` is the single shuffle: duplicates of a key land in
    the same partition, so per-partition ``np.unique`` yields globally
    deduplicated keys (xor/ribbon construction precondition) without a
    separate ``distinct()`` shuffle.

    ``pre_partitioned=True``: the caller already hash-partitioned (and
    typically cached) the key column — skip the shuffle entirely and build
    over the existing partitions. Used when several filter kinds are built
    over the same key set (one shuffle amortized over N builds).
    """
    params = params or {}
    if pre_partitioned:
        hashed = df.select(F.col(key_col).alias("h"))
    else:
        hashed = hashed_keys(df, key_col)
        if num_partitions:
            hashed = hashed.repartition(num_partitions, "h")
        else:
            hashed = hashed.repartition("h")
    return hashed.mapInArrow(_build_partition_fn(kind, params, skip_pids), INDEX_SCHEMA)
