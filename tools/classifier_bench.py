"""Scale + two-parallelism evidence for classifier_scores and
score_quantile_buckets over the 2M Zipf pages: a 100k-row deterministic
(token, weight) linear layer broadcast to ~220M exploded token rows
(one groupBy shuffle), then CCNet-style head/middle/tail bucketing of
the rounded scores (histogram bounded by distinct 4-decimal scores,
broadcast join back — the corpus is never rank-windowed).

Usage: python tools/classifier_bench.py [cores] [reps] [src_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from filterz_spark.ops.relational import score_quantile_buckets
from filterz_spark.ops.text import classifier_scores
from filterz_spark.spark.session import get_session


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    src = sys.argv[3] if len(sys.argv) > 3 else "/tmp/filterz_pages_2000000_zipf"
    spark = get_session(cores=cores, app_name=f"classifier-bench-{cores}")
    docs = spark.read.parquet(src).select(
        F.xxhash64("url").alias("doc_id"), "text")
    # deterministic 100k-token linear layer over the zipf vocabulary
    # (z<rank> tokens): weight(i) = ((i * 2654435761) % 2001 - 1000) / 1000
    weights = spark.range(100_000).select(
        F.concat(F.lit("z"), F.col("id")).alias("token"),
        (((F.col("id") * 2654435761) % 2001 - 1000) / 1000.0).alias("w"))
    out = {"cores": cores, "docs": docs.count(),
           "vocab_rows": weights.count()}

    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = classifier_scores(docs, weights, bias=0.1,
                              default_weight=-0.01) \
            .agg(F.count("*").alias("n"),
                 F.sum("n_tokens").alias("toks"),
                 F.round(F.sum("quality_prob"), 2).alias("psum")).collect()[0]
        rows = (r["n"], int(r["toks"]), float(r["psum"]))
        samples.append(round(time.perf_counter() - t0, 2))
    out["classifier_scores"] = {"samples": samples, "best": min(samples),
                                "out_rows": rows}

    scored = classifier_scores(docs, weights, bias=0.1,
                               default_weight=-0.01) \
        .select("doc_id", F.round("quality_prob", 4).alias("q")).persist()
    scored.count()
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        bc = {r["bucket"]: r["n"] for r in
              score_quantile_buckets(scored, "q")
              .groupBy("bucket").agg(F.count("*").alias("n")).collect()}
        samples.append(round(time.perf_counter() - t0, 2))
    out["quantile_buckets"] = {"samples": samples, "best": min(samples),
                               "bucket_counts": bc}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
