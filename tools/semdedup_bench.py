"""Scale + two-parallelism evidence for semdedup: 1M synthetic 32-dim
embeddings in 4096 well-separated clusters (~244 vectors each — the
SemDeDup operating point where within-cluster pair cost sum(|c|^2) is
~30k pairs/cluster, ~120M total), with every 8th row of a cluster an
exact duplicate of the previous row so the drop rule engages (~12%).

All vectors are a pure function of (vec_id) — no RNG state — so the
corpus is reproducible and both parallelism levels see identical input.

Legs:
- semdedup_label: assignment precomputed (the pair join + kept-flag
  cost in isolation);
- semdedup_assign: assignment recomputed map-only from the true
  centroids via ivf_assign (adds the Arrow matmul pass).

Usage: python tools/semdedup_bench.py [cores] [reps] [n_vecs] [n_clusters]
"""

import json
import os
import sys
import time
from typing import Iterator

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from filterz_spark.ops.similarity import semdedup
from filterz_spark.spark.session import get_session

DIM = 32
_M = 2 ** 31


def _dim_keys(mul: int, add: int) -> np.ndarray:
    return ((np.arange(1, DIM + 1, dtype=np.int64) * mul + add) % _M) | 1


def _hash_rows(h: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """(len(h), DIM) uniform[-1,1) rows from exact int64 modular products
    — per-row decorrelated, unlike a shared-slope Weyl/sin sequence whose
    rows differ only by a constant offset (which manufactures spurious
    near-duplicates for offsets near 0)."""
    y = (h[:, None] * keys[None, :]) % _M
    return (y.astype(np.float64) / _M - 0.5) * 2.0


_K_NOISE = _dim_keys(1103515245, 12345)
_K_CENT = _dim_keys(2654435761 % _M, 1013904223)


def centroid_matrix(k: int) -> np.ndarray:
    h = (np.arange(k, dtype=np.int64) * 40503 + 11) % _M
    m = _hash_rows(h, _K_CENT)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def make_corpus(spark, n: int, k: int):
    cents = centroid_matrix(k)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        c = np.asarray(cents)
        for batch in batches:
            ids = batch.column(0).to_numpy()
            lab = (ids % k).astype(np.int32)
            g = ids // k                      # row index within the cluster
            # every g % 8 == 3 row reuses the previous row's noise ->
            # an exact within-cluster duplicate (deterministic, no RNG)
            gsrc = np.where((g % 8 == 3) & (g > 0), g - 1, g)
            h = (gsrc.astype(np.int64) * 2654435761
                 + lab.astype(np.int64) * 97 + 1) % _M
            noise = _hash_rows(h, _K_NOISE)
            # 0.22 puts typical same-cluster cosine ~0.65 — the drop set is
            # the constructed duplicates (~12.7% of rows) plus a natural
            # high-cosine tail (measured total ~16.7% at threshold 0.95),
            # deterministic either way
            v = c[lab] + 0.22 * noise
            v = v / np.linalg.norm(v, axis=1, keepdims=True)
            flat = pa.array(v.astype(np.float32).ravel())
            emb = pa.ListArray.from_arrays(
                pa.array(np.arange(len(ids) + 1) * DIM, type=pa.int32()), flat)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), emb, pa.array(lab)],
                names=["vec_id", "embedding", "label"])

    return spark.range(n).withColumnRenamed("id", "vec_id") \
        .mapInArrow(gen, "vec_id long, embedding array<float>, label int")


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 4096
    spark = get_session(cores=cores, app_name=f"semdedup-bench-{cores}")
    emb = make_corpus(spark, n, k).persist()
    out = {"cores": cores, "n_vecs": emb.count(), "n_clusters": k}
    cents = centroid_matrix(k)
    legs = [("semdedup_label", {"cluster_col": "label"}),
            ("semdedup_assign", {"centroids": cents})]
    for label, kw in legs:
        samples, rows = [], None
        for _ in range(reps):
            t0 = time.perf_counter()
            r = semdedup(emb, threshold=0.95, **kw) \
                .agg(F.count("*").alias("n"),
                     F.sum(F.col("kept").cast("long")).alias("kept")).collect()[0]
            rows = (r["n"], int(r["kept"]))
            samples.append(round(time.perf_counter() - t0, 2))
        out[label] = {"samples": samples, "best": min(samples),
                      "kept": rows[1], "dropped": rows[0] - rows[1]}
        print(f"LEG {label}: {out[label]}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
