"""Round-7 probe #4: validate the curate barrier-before-filter fix."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "2"))
    from filterz_spark.spark.session import get_session
    from filterz_spark.ops.text import normalize_text

    spark = get_session(cores=cores, shuffle_partitions=cores,
                        **{"spark.ui.showConsoleProgress": "false"})
    sc = spark.sparkContext
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .repartition(cores)
    out = {}

    def timed(name, fn, r=reps):
        best = None
        for _ in range(r):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)

    norm = normalize_text(docs, keep_cols=("lang",))
    ws = F.split(F.col("norm_text"), " ")
    metrics = (norm
               .withColumn("n_tokens", F.size(ws).cast("long"))
               .withColumn("__dr", F.size(F.array_distinct(ws))
                           / F.col("n_tokens"))
               .select("doc_id", "lang", "norm_hash", "n_tokens", "__dr"))

    def run_variant(name, barrier_first):
        if barrier_first:
            m = metrics.localCheckpoint(eager=False)
        else:
            m = metrics
        surv = (m.filter((F.col("n_tokens") >= 5)
                         & (F.col("n_tokens") <= 100_000)
                         & (F.col("__dr") >= 0.3))
                .select("doc_id", "lang", "norm_hash", "n_tokens"))
        if not barrier_first:
            surv = surv.localCheckpoint(eager=False)
        keep = surv.groupBy("norm_hash").agg(F.min("doc_id").alias("doc_id"))
        deduped = surv.join(keep, ["norm_hash", "doc_id"], "left_semi")
        sc.setJobDescription(name)
        t0 = time.monotonic()
        n = deduped.count()
        out[name] = round(time.monotonic() - t0, 3)
        out[name + "_rows"] = n
        print(f"{name}: {out[name]} rows={n}", file=sys.stderr, flush=True)

    # each variant builds a FRESH localCheckpoint per run (as curate does)
    for r in range(reps):
        run_variant(f"barrier_after_filter_r{r}", False)
    for r in range(reps):
        run_variant(f"barrier_before_filter_r{r}", True)

    # also: metrics-project-only cost (is CSE saving the chain in 1 project?)
    sc.setJobDescription("metrics noop")
    timed("metrics_noop", lambda: metrics.write.format("noop")
          .mode("overwrite").save())
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
