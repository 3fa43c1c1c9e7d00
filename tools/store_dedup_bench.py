"""Scale rehearsal for dedup_against_store (incremental crawl dedup).

Builds a corpus signature store from one synthetic pages parquet, then
dedups a DISJOINT batch parquet against it — the composed "dedup today's
crawl against the corpus" step — reporting store-build and dedup walls
(best-of-N, this host's bimodal stalls) plus novel counts.

Usage:
    python tools/store_dedup_bench.py <corpus_parquet> <batch_parquet> \
        [k] [cores] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    corpus_path, batch_path = sys.argv[1], sys.argv[2]
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    cores = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 2

    from pyspark.sql import functions as F

    from filterz_spark.ops.dedup import (dedup_against_store,
                                         minhash_signature_arrays)
    from filterz_spark.spark.session import get_session

    spark = get_session(cores=cores, app_name=f"store-dedup-bench-{cores}")

    def docs_of(path):
        return spark.read.parquet(path).select(
            F.conv(F.element_at(F.split("url", "/"), -1), 16, 10)
            .cast("long").alias("doc_id"),
            "text", "lang")

    corpus, batch = docs_of(corpus_path), docs_of(batch_path)
    # disjoint id spaces: batch ids offset past the corpus range so a
    # "collision" is always signature-level, never an id clash
    off = corpus.agg(F.max("doc_id")).collect()[0][0] + 1
    batch = batch.withColumn("doc_id", F.col("doc_id") + off)
    store = "/tmp/filterz_store_dedup_bench"

    out = {"k": k, "cores": cores,
           "corpus_docs": corpus.count(), "batch_docs": batch.count()}

    build_samples = []
    for _ in range(reps):
        shutil.rmtree(store, ignore_errors=True)
        from filterz_spark.ops.dedup import write_signature_store
        t0 = time.perf_counter()
        write_signature_store(
            minhash_signature_arrays(corpus, 8, k), store,
            hash_family="km_md5", num_hashes=8, k=k, mode="overwrite")
        build_samples.append(round(time.perf_counter() - t0, 2))
    out["store_build"] = {"samples": build_samples,
                          "best": min(build_samples)}

    dedup_samples, novel = [], None
    for _ in range(reps):
        t0 = time.perf_counter()
        novel = dedup_against_store(batch, store, k=k).count()
        dedup_samples.append(round(time.perf_counter() - t0, 2))
    out["dedup"] = {"samples": dedup_samples, "best": min(dedup_samples),
                    "novel_docs": novel,
                    "docs_per_sec": int(out["batch_docs"] /
                                        min(dedup_samples))}

    # append leg: grow the store by the kept docs, then replay the batch —
    # every doc must now self-collide (idempotence at scale)
    t0 = time.perf_counter()
    dedup_against_store(batch, store, k=k, append=True).count()
    out["append_wall_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    replay = dedup_against_store(batch, store, k=k).count()
    out["replay"] = {"wall_sec": round(time.perf_counter() - t0, 2),
                     "novel_docs": replay}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
