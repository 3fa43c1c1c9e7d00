"""VERDICT-r06 #6: 10M-vector IVFPQ rehearsal (the SemDeDup/ANN
rehearsals stopped at 1M).

Synthesizes 10M deterministic 64-dim float32 vectors to parquet once
(clustered mixture so IVF has real structure: 256 latent centers +
noise), then measures:

- coarse k-means (ivf_train) wall,
- PQ codebook training (pq_train, standard byte codes: m=8 x
  k_sub=256) wall,
- IVFPQ index build (ivfpq_index: assign + encode + cluster-partitioned
  cache) wall,
- probe latency over 20 queries (ivfpq_ann_topk, n_probe in {8, 32},
  rerank=500) served from the cached index,
- recall@10 vs the exact cosine_topk ground truth for 5 queries in the
  lossy regime (the provably-exact regime is oracle-gated at small
  scale already).

Usage: python tools/r07_ann10m.py [cores] [n_vecs] [out_json]
Run once at 32 and once at 8 cores for the two-parallelism evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

DIM = 64
N_CLUSTERS = 256
DATA_TMPL = "/tmp/filterz_vecs_{n}_{d}"


def _gen_fn(dim: int, n_centers: int):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        rng_centers = np.random.default_rng(1234)
        centers = rng_centers.standard_normal((n_centers, dim)).astype(np.float32)
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            rng = np.random.default_rng(ids[0] + 99991)
            c = (ids % n_centers).astype(np.int64)
            mat = centers[c] + 1.0 * rng.standard_normal(
                (ids.size, dim)).astype(np.float32)
            flat = pa.array(mat.reshape(-1), pa.float32())
            offs = pa.array(np.arange(ids.size + 1, dtype=np.int32) * dim)
            vecs = pa.ListArray.from_arrays(offs, flat)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), vecs], names=["vec_id", "embedding"])

    return fn


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    from filterz_spark.ops.similarity import (cosine_topk, ivf_train,
                                              ivfpq_ann_topk, ivfpq_index,
                                              pq_train)
    from filterz_spark.spark.session import get_session

    spark = get_session(cores=cores, app_name=f"ann10m-{cores}")
    data = DATA_TMPL.format(n=n, d=DIM)
    out = {"cores": cores, "n_vecs": n, "dim": DIM,
           "n_clusters": N_CLUSTERS}
    if not os.path.exists(data + "/_SUCCESS"):
        t0 = time.monotonic()
        (spark.range(n).repartition(max(cores, 32))
         .mapInArrow(_gen_fn(DIM, N_CLUSTERS),
                     "vec_id long, embedding array<float>")
         .write.mode("overwrite").parquet(data))
        out["gen_wall"] = round(time.monotonic() - t0, 1)
    emb = spark.read.parquet(data)

    t0 = time.monotonic()
    centroids = ivf_train(emb, n_clusters=N_CLUSTERS, iters=2)
    out["ivf_train_wall"] = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    codebooks = pq_train(emb, m=8, k_sub=256, iters=1)
    out["pq_train_wall"] = round(time.monotonic() - t0, 1)
    t0 = time.monotonic()
    index = ivfpq_index(emb, centroids, codebooks)
    out["index_rows"] = index.count()  # materializes the cache
    out["index_build_wall"] = round(time.monotonic() - t0, 1)

    qids = [int(i * (n // 20) + 7) for i in range(20)]
    qvecs = {r["vec_id"]: list(r["embedding"]) for r in
             emb.where(F.col("vec_id").isin(qids)).collect()}
    for n_probe in (8, 32):
        t0 = time.monotonic()
        for qid in qids:
            ivfpq_ann_topk(emb, qvecs[qid], centroids, codebooks, k=10,
                           n_probe=n_probe, rerank=500,
                           index=index).collect()
        w = time.monotonic() - t0
        out[f"probe20_nprobe{n_probe}_wall"] = round(w, 1)
        out[f"probe_nprobe{n_probe}_per_query_s"] = round(w / len(qids), 2)

    recalls = {}
    for qid in qids[:5]:
        exact = {r["vec_id"] for r in
                 cosine_topk(emb, qvecs[qid], 10).collect()}
        got = {r["vec_id"] for r in
               ivfpq_ann_topk(emb, qvecs[qid], centroids, codebooks, k=10,
                              n_probe=32, rerank=500, index=index).collect()}
        recalls[qid] = len(exact & got) / 10.0
    out["recall_at10_nprobe32"] = recalls
    out["recall_at10_mean"] = round(sum(recalls.values()) / len(recalls), 3)
    payload = json.dumps(out)
    print(payload)
    if out_path:
        with open(out_path, "w") as f:
            f.write(payload + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
