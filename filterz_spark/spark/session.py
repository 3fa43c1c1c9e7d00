"""SparkSession factory with scale-appropriate defaults.

Tuned for the execution model the engine targets (SURVEY.md §4): AQE on for
runtime re-planning + skew-join splitting + small-partition coalescing
(size-aware coalescing per the north rule), Arrow enabled for every
pandas/Arrow UDF boundary, and shuffle partitions sized to the sandbox's
local[32] while staying overridable for cluster runs via normal Spark conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(cores: int | None = None, app_name: str = "filterz-spark",
                shuffle_partitions: int | None = None, **extra_conf) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 32)
    # One BLAS thread per python worker: Spark already runs `cores`
    # concurrent tasks, so a multi-threaded numpy matmul inside an Arrow
    # UDF oversubscribes cores^2 threads and collapses into kernel-side
    # scheduler thrash (observed: 32 ivf_assign workers at ~98% SYSTEM
    # time, zero progress, on the 1M-vector semdedup rehearsal). Workers
    # inherit the driver env in local mode; on a real cluster set the
    # same vars via spark.executorEnv.* — done below so it applies there
    # too. setdefault: an explicit caller override wins.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        # AQE: runtime coalescing of small shuffle partitions + skew-join splits
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow batches feed the vectorized UDF kernels; bigger batches =
        # fewer Python crossings (SIMD lanes -> batch parallelism, SURVEY §4)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
        # cached key columns are hashes (high-entropy, incompressible):
        # columnar-cache compression costs a full decode pass per read for
        # ~zero space win, and 10k-row cached batches bottleneck the
        # cache->Arrow feed (measured 11s -> 0.7s for 20M longs at local[32]
        # with these two settings)
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        .config("spark.sql.inMemoryColumnarStorage.batchSize", "262144")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        # cluster-mode twin of the os.environ pinning above
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS",
                os.environ["OPENBLAS_NUM_THREADS"])
        .config("spark.executorEnv.OMP_NUM_THREADS",
                os.environ["OMP_NUM_THREADS"])
        .config("spark.executorEnv.MKL_NUM_THREADS",
                os.environ["MKL_NUM_THREADS"])
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
