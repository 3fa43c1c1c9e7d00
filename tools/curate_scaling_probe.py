"""Isolated curate_training_set two-parallelism probe.

The in-sequence `curate_composed` leg of tools/pipeline_bench.py runs
directly after the multi-GB verify shuffles, so its 8-vs-32-core scaling
reading carries page-cache / shuffle-dir pressure from earlier stages
(round-5 analysis: 41-58 s clean vs 98.6 s in-sequence at 2M/32c on
uniform5k). This probe measures ONLY the composed pipeline, fresh JVM per
core count, best/median of N reps, on a pre-generated pages parquet.

Usage:
    python tools/curate_scaling_probe.py <pages_path> [reps]      # both legs
    python tools/curate_scaling_probe.py <pages_path> <reps> <cores>  # one leg
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRACTIONS = {"en": 0.5, "zh": 0.8, "es": 1.0, "de": 1.0, "fr": 1.0}


def one_leg(pages_path: str, reps: int, cores: int) -> dict:
    from pyspark.sql import functions as F

    from filterz_spark.ops.pipeline import curate_training_set
    from filterz_spark.spark.session import get_session

    spark = get_session(cores=cores, app_name=f"curate-probe-{cores}")
    pages = spark.read.parquet(pages_path)
    docs = pages.select(
        F.conv(F.element_at(F.split("url", "/"), -1), 16, 10)
        .cast("long").alias("doc_id"),
        "text", "lang")
    n_docs = docs.count()
    bench = docs.filter(F.col("doc_id") % (max(n_docs // 500, 1)) == 0) \
                .select("doc_id", "text").limit(500)
    samples, rows = [], None
    for _ in range(reps):
        t0 = time.perf_counter()
        rows = curate_training_set(docs, bench, FRACTIONS).count()
        samples.append(round(time.perf_counter() - t0, 2))
    spark.stop()
    return {"cores": cores, "n_docs": n_docs, "out_rows": rows,
            "samples": samples, "best": min(samples),
            "median": sorted(samples)[len(samples) // 2]}


def main() -> None:
    pages_path = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    if len(sys.argv) > 3:
        print(json.dumps(one_leg(pages_path, reps, int(sys.argv[3]))))
        return
    legs = {}
    for cores in (8, 32):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), pages_path,
             str(reps), str(cores)],
            capture_output=True, text=True, timeout=7200)
        sys.stderr.write(p.stderr)
        if p.returncode != 0:
            raise SystemExit(f"leg cores={cores} failed: {p.stdout[-500:]}")
        legs[cores] = json.loads(p.stdout.strip().splitlines()[-1])
    sp = round(legs[8]["best"] / legs[32]["best"], 2)
    print(json.dumps({"legs": legs, "speedup_best": sp,
                      "efficiency_vs_4x": round(sp / 4, 2)}))


if __name__ == "__main__":
    main()
