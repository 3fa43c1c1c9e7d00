"""Probe path — membership queries against a filter index.

The reference probes every section's filter for every query key and counts
hits (src/bench.zig:228-233): a hit means "this section may contain the key,
pay the 200us read" (README.md:47). Three probe strategies, by index size:

1. ``probe_membership`` (default): the index is collected once and shipped
   as a Spark BROADCAST VARIABLE — one torrent-distributed copy per
   executor, NOT a copy inside every pickled task closure — and each Arrow
   batch of the probe side is checked against every filter vectorized (the
   OR-over-partitions semantics of the section model). Map-only: the probe
   side never shuffles.
2. Pre-broadcast with ``broadcast_index`` and pass the handle to any number
   of ``probe_membership`` calls — amortizes the one driver->executor
   transfer across a query workload.
3. ``probe_membership_cogrouped``: for indexes too large to collect on the
   driver at all (10^5+ partitions x ~500KB payloads), the index STAYS a
   DataFrame. Each probe key is routed to the partition that built its
   filter (the build's own hash-placement function, reproduced JVM-side),
   and a cogrouped applyInPandas checks each key against only that
   partition's shard filters. Costs one shuffle of the probe side; payload
   bytes move executor<->executor only (never through the driver), each
   exactly once.

Scale posture: at the reference's 50-section scale the broadcast path is
exactly the Parquet row-group bloom pattern. The aggregate FPR across S
partition filters grows ~ S * p for the OR-probe (SURVEY.md §7.3) —
``expected_fpr`` surfaces it so callers size fp_bits for their S; the
cogrouped probe checks ONE partition per key, so its FPR stays the
per-filter p at any S.
"""

from __future__ import annotations

import json
from typing import Iterator

import pyarrow as pa
from pyspark import Broadcast
from pyspark.sql import DataFrame, functions as F

from ..filters import deserialize_filter


def collect_index(index_df: DataFrame) -> list[dict]:
    """Materialize the filter index to plain dicts (payload bytes + params).

    Uses the Arrow collect path — payload columns are tens of MB at bench
    scale and the row-pickling ``collect()`` serializer is several times
    slower on large binary values.
    """
    try:
        tbl = index_df.toArrow()
        cols = {name: tbl.column(name).to_pylist() for name in (
            "partition_id", "kind", "params", "payload", "num_keys",
            "build_ns", "mem_usage", "ideal_mem_usage")}
        n = tbl.num_rows
        get = lambda name, i: cols[name][i]  # noqa: E731
    except Exception:  # older pyspark without DataFrame.toArrow
        rows = index_df.collect()
        n = len(rows)
        get = lambda name, i: rows[i][name]  # noqa: E731
    return [
        {
            "partition_id": get("partition_id", i),
            "kind": get("kind", i),
            "params": json.loads(get("params", i)),
            "payload": bytes(get("payload", i)),
            "num_keys": get("num_keys", i),
            "build_ns": get("build_ns", i),
            "mem_usage": get("mem_usage", i),
            "ideal_mem_usage": get("ideal_mem_usage", i),
        }
        for i in range(n)
    ]


def broadcast_index(spark, index_rows: list[dict]) -> Broadcast:
    """Ship a collected filter index to the executors ONCE (torrent
    broadcast) and reuse the handle across many ``probe_membership`` calls.
    Destroy with ``.unpersist()`` when the query workload is done."""
    return spark.sparkContext.broadcast(index_rows)


def _probe_fn(index: list[dict] | Broadcast, hash_col_idx: int,
              out_cols: list[str]):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        index_rows = index.value if isinstance(index, Broadcast) else index
        filters = [
            deserialize_filter(r["kind"], r["payload"], r["params"])
            for r in index_rows
        ]
        for batch in batches:
            h = batch.column(hash_col_idx).to_numpy(zero_copy_only=False)
            h = h.astype(np.int64).view(np.uint64)
            hit = np.zeros(len(h), dtype=bool)
            for filt in filters:  # OR over partition filters (ref bench.zig:228-233)
                miss = ~hit
                if not miss.any():
                    break
                hit[miss] |= filt.check(h[miss])
            arrays = [batch.column(i) for i in range(batch.num_columns)]
            arrays.append(pa.array(hit))
            yield pa.RecordBatch.from_arrays(
                arrays, names=[*batch.schema.names, out_cols[-1]]
            )

    return fn


def probe_membership(probe_df: DataFrame, key_col: str,
                     index_rows: list[dict] | Broadcast,
                     hit_col: str = "maybe_present") -> DataFrame:
    """Append a boolean column: True iff ANY partition filter may contain the key.

    Zero false negatives (an inserted key always probes true in its
    partition's filter); false positives at the per-filter bound times the
    number of filters.

    ``index_rows`` may be a plain list (broadcast internally — the payloads
    travel to each executor once, not inside every task closure) or a
    ``Broadcast`` handle from ``broadcast_index`` (reused across calls).
    NOTE: the internal broadcast of a plain list cannot be unpersisted by
    the caller (it must outlive the returned lazy DataFrame) and lives
    until the session ends — for a QUERY LOOP over the same index, pass a
    ``broadcast_index`` handle and ``.unpersist()`` it yourself; the
    convenience list form is for one-shot probes.
    """
    if not isinstance(index_rows, Broadcast):
        index_rows = broadcast_index(probe_df.sparkSession, index_rows)
    with_hash = probe_df.withColumn("__h", F.xxhash64(key_col))
    cols = with_hash.columns
    schema_str = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in with_hash.schema.fields]
        + [f"{hit_col} boolean"]
    )
    out = with_hash.mapInArrow(
        _probe_fn(index_rows, cols.index("__h"), [hit_col]), schema_str
    )
    return out.drop("__h")


# sessions (by applicationId) whose repartition placement has been verified
# against the pmod(murmur3, P) reproduction below, per partition count
_ROUTING_VERIFIED: set = set()


def _assert_hash_routing(spark, num_partitions: int) -> None:
    """Fail-fast guard for the cogrouped probe's routing contract.

    The probe reproduces ``repartition(P, col)``'s placement JVM-side as
    ``pmod(F.hash(col), P)`` — an undocumented Spark internal
    (HashPartitioning = murmur3 seed 42). If a future Spark changes it,
    probes would route to the WRONG partition's filter and silently return
    false negatives instead of erroring. This routes a spread of sentinel
    hashes through a tiny real repartition and compares actual partition
    ids against the reproduction — once per session per partition count
    (~one 8-row job), raising loudly on any mismatch. The equivalence is
    also pinned per Spark version in tests/test_spark_layer.py.
    """
    token = (spark.sparkContext.applicationId, int(num_partitions))
    if token in _ROUTING_VERIFIED:
        return
    sentinels = [-(1 << 63), -1, 0, 1, 42, (1 << 63) - 1,
                 123456789123456789, -987654321987654321]
    placed = (spark.createDataFrame([(v,) for v in sentinels], "__h long")
              .repartition(num_partitions, "__h")
              .select("__h", F.spark_partition_id().alias("actual"),
                      F.pmod(F.hash("__h"), F.lit(num_partitions))
                      .cast("int").alias("expected"))
              .collect())
    bad = [(r["__h"], r["actual"], r["expected"])
           for r in placed if r["actual"] != r["expected"]]
    if bad:
        raise AssertionError(
            "repartition(P, col) no longer places rows at pmod(murmur3(col), "
            f"P) on this Spark version (mismatches: {bad}); "
            "probe_membership_cogrouped's routing would return false "
            "negatives — its placement reproduction must be updated")
    _ROUTING_VERIFIED.add(token)


def probe_membership_cogrouped(probe_df: DataFrame, key_col: str,
                               index_df: DataFrame, num_partitions: int,
                               hit_col: str = "maybe_present") -> DataFrame:
    """Membership probe with the index kept DISTRIBUTED — for filter indexes
    too large to collect or broadcast (driver-memory ceiling at 10^5+
    partitions).

    Requires an index built by ``build_filter_index(..., num_partitions)``
    over the same hash layout: the build shuffles keys with
    ``repartition(P, h)``, whose placement function is
    ``pmod(murmur3(h), P)`` — reproduced here JVM-side (``F.hash`` IS that
    murmur3, seed 42) to route every probe key to the one partition whose
    filter could contain it. A cogrouped applyInPandas then checks each
    key group against that partition's shard filters only.

    Semantics per key: zero false negatives (the key's hash was inserted in
    exactly this partition's filter); false positives at the SINGLE-filter
    bound (the OR-probe's ~S*p aggregate FPR does not apply). Cost: one
    shuffle of the probe side + one tiny shuffle of the index; payloads
    never touch the driver.

    NOTE: the first call per (session, num_partitions) runs an EAGER 8-row
    Spark job (the fail-fast routing-contract guard below) even though the
    returned plan is lazy — plan construction therefore needs a live
    cluster, unlike the purely-lazy broadcast/handle strategies.
    """
    _assert_hash_routing(probe_df.sparkSession, num_partitions)
    with_hash = probe_df.withColumn("__h", F.xxhash64(key_col))
    targeted = with_hash.withColumn(
        "__pid", F.pmod(F.hash("__h"), F.lit(num_partitions)).cast("int"))
    idx = index_df.select("partition_id", "kind", "params", "payload")
    out_fields = [f for f in with_hash.schema.fields if f.name != "__h"]
    schema_str = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields]
        + [f"{hit_col} boolean"]
    )
    out_names = [f.name for f in out_fields]

    def fn(_key, probes_pdf, index_pdf):
        import numpy as np

        filters = [
            deserialize_filter(k, bytes(p), json.loads(pr))
            for k, pr, p in zip(index_pdf["kind"], index_pdf["params"],
                                index_pdf["payload"])
        ]
        h = probes_pdf["__h"].to_numpy().astype(np.int64).view(np.uint64)
        hit = np.zeros(len(h), dtype=bool)
        for filt in filters:  # OR over this partition's SHARD filters only
            miss = ~hit
            if not miss.any():
                break
            hit[miss] |= filt.check(h[miss])
        out = probes_pdf[out_names].copy()
        out[hit_col] = hit
        return out

    return (
        targeted.groupBy("__pid")
        .cogroup(idx.groupBy("partition_id"))
        .applyInPandas(fn, schema_str)
    )


def expected_fpr(index_rows: list[dict], per_filter_fpr: float) -> float:
    """Aggregate false-positive rate over S partition filters ~ 1-(1-p)^S."""
    s = len(index_rows)
    return 1.0 - (1.0 - per_filter_fpr) ** s
