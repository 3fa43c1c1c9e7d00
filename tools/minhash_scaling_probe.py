"""Isolated MinHash-family two-parallelism probe.

The in-sequence zipf scaling run (BENCH/PIPELINE.md round-6 table) read
band_md5 0.94x and km_xxh 0.78x at 8->32 cores with visibly bimodal
samples; this probe measures each hash family ALONE — fresh JVM per core
count, best-of-N reps, nothing running before it — to separate the
string-hash DRAM-bandwidth wall from this host's stall noise.

Usage:
    python tools/minhash_scaling_probe.py <pages_path> [reps] [k]   # both legs
    python tools/minhash_scaling_probe.py <pages_path> <reps> <k> <cores>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILIES = ("km_md5", "band_md5", "km_xxh")


def one_leg(pages_path: str, reps: int, k: int, cores: int) -> dict:
    from pyspark.sql import functions as F

    from filterz_spark.ops.dedup import minhash_signature_arrays
    from filterz_spark.spark.session import get_session

    spark = get_session(cores=cores, app_name=f"minhash-probe-{cores}")
    pages = spark.read.parquet(pages_path)
    docs = pages.select(
        F.conv(F.element_at(F.split("url", "/"), -1), 16, 10)
        .cast("long").alias("doc_id"),
        "text", "lang")
    out = {"cores": cores, "k": k, "families": {}}
    for fam in FAMILIES:
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            # full-width noop sink: a column-pruned action (e.g. an
            # aggregate over doc_id alone) lets Catalyst drop the min-hash
            # aggregate expressions and skips the hashing entirely
            minhash_signature_arrays(
                docs, num_hashes=8, k=k, hash_family=fam) \
                .write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 2))
        out["families"][fam] = {"samples": samples, "best": min(samples)}
    spark.stop()
    return out


def main() -> None:
    pages_path = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    if len(sys.argv) > 4:
        print(json.dumps(one_leg(pages_path, reps, k, int(sys.argv[4]))))
        return
    legs = {}
    for cores in (8, 32):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), pages_path,
             str(reps), str(k), str(cores)],
            capture_output=True, text=True, timeout=7200)
        sys.stderr.write(p.stderr)
        if p.returncode != 0:
            raise SystemExit(f"leg cores={cores} failed: {p.stdout[-500:]}")
        legs[cores] = json.loads(p.stdout.strip().splitlines()[-1])
    scaling = {
        fam: round(legs[8]["families"][fam]["best"] /
                   legs[32]["families"][fam]["best"], 2)
        for fam in FAMILIES}
    print(json.dumps({"legs": legs, "speedup_best": scaling}))


if __name__ == "__main__":
    main()
