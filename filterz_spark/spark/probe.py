"""Probe path — membership queries against a filter index.

The reference probes every section's filter for every query key and counts
hits (src/bench.zig:228-233): a hit means "this section may contain the key,
pay the 200us read" (README.md:47). Here the filter index (small: one row
per partition) is collected and broadcast; the probe DataFrame is hashed
JVM-side and each Arrow batch is checked against every filter vectorized —
the OR-over-partitions semantics of the section model.

Scale posture: the index is P rows of a few hundred KB each; broadcasting it
is exactly the Parquet row-group bloom pattern. The probe side never
shuffles — membership is a map-only operation over the probe table. The
aggregate FPR across S partition filters grows ~ S * p (SURVEY.md §7.3);
``expected_fpr`` surfaces it so callers size fp_bits for their S.
"""

from __future__ import annotations

import json
from typing import Iterator

import pyarrow as pa
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


def _probe_fn(index_rows: list[dict], hash_col_idx: int, out_cols: list[str]):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

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


def probe_membership(probe_df: DataFrame, key_col: str, index_rows: list[dict],
                     hit_col: str = "maybe_present") -> DataFrame:
    """Append a boolean column: True iff ANY partition filter may contain the key.

    Zero false negatives (an inserted key always probes true in its
    partition's filter); false positives at the per-filter bound times the
    number of filters.
    """
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


def expected_fpr(index_rows: list[dict], per_filter_fpr: float) -> float:
    """Aggregate false-positive rate over S partition filters ~ 1-(1-p)^S."""
    s = len(index_rows)
    return 1.0 - (1.0 - per_filter_fpr) ** s
