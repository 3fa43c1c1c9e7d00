"""Streaming near-dup rehearsal evidence (round 6).

Two measurements on the synthetic pages corpus (tools/pipeline_bench.py's
/tmp/filterz_pages_{n} parquet, generated on demand):

1. ``flatness``: N sequential micro-batches through StreamingNearDupDedup
   (the foreachBatch sink called directly — identical code path) with a
   growing novel/out store. With the round-6 scoped emit guard the
   per-batch wall must be FLAT in the number of already-emitted batches
   (the guard prunes to the current __batch_id partition); the pre-round-6
   guard anti-joined the ENTIRE emitted corpus per batch. Reports each
   batch's wall and the late/early ratio.

2. ``greedy``: one fat batch in ``within_batch="driver"`` vs
   ``"distributed"`` — the round-5 measurement (driver 4.5 s vs
   distributed 16.2 s at 200k) is the baseline the round-6 one-pass-
   per-round rewrite must beat; both modes must emit the identical set.

Usage:
    python tools/neardup_bench.py flatness [n_batches] [rows_per_batch]
    python tools/neardup_bench.py greedy   [n_docs ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STATE = "/tmp/fz_neardup_bench"


def _spark(cores: int = 32):
    from filterz_spark.spark.session import get_session
    return get_session(cores=cores)


def _pages(spark, n_docs: int):
    from tools.pipeline_bench import _ensure_dataset
    path = _ensure_dataset(spark, n_docs)
    from pyspark.sql import functions as F
    return (spark.read.parquet(path)
            .select(F.xxhash64("url").alias("doc_id"), "text"))


def flatness(n_batches: int = 50, rows_per_batch: int = 20_000) -> dict:
    from filterz_spark.streaming.neardup import StreamingNearDupDedup
    spark = _spark()
    docs = _pages(spark, n_batches * rows_per_batch) \
        .localCheckpoint(eager=True)
    base = os.path.join(STATE, "flatness")
    shutil.rmtree(base, ignore_errors=True)
    dd = StreamingNearDupDedup(base, run_token="t")
    walls = []
    for i in range(n_batches):
        batch = docs.filter(f"pmod(doc_id, {n_batches}) = {i}")
        t0 = time.perf_counter()
        dd(batch, i)
        walls.append(round(time.perf_counter() - t0, 3))
        print(f"# batch {i}: {walls[-1]}s", file=sys.stderr)
    # batch 0 pays session warm-up and has no store; compare a steady
    # early batch against the last ones (store ~25x larger)
    early = sorted(walls[1:6])[len(walls[1:6]) // 2]
    late = sorted(walls[-5:])[len(walls[-5:]) // 2]
    out = {"metric": "neardup_flatness", "n_batches": n_batches,
           "rows_per_batch": rows_per_batch,
           "wall_batch2_median_1_5": early, "wall_median_last5": late,
           "late_over_early": round(late / early, 3), "walls": walls,
           "novel_total": dd.novel_docs(spark).count()}
    shutil.rmtree(base, ignore_errors=True)
    return out


def greedy(sizes: list[int]) -> dict:
    from filterz_spark.streaming.neardup import StreamingNearDupDedup
    spark = _spark()
    out = {"metric": "neardup_greedy_modes", "configs": []}
    for n in sizes:
        docs = _pages(spark, n).localCheckpoint(eager=True)
        walls, emitted = {}, {}
        for mode in ("driver", "distributed"):
            base = os.path.join(STATE, f"greedy_{mode}")
            shutil.rmtree(base, ignore_errors=True)
            dd = StreamingNearDupDedup(base, run_token="t",
                                       within_batch=mode,
                                       max_batch_rows=50_000_000)
            t0 = time.perf_counter()
            dd(docs, 0)
            walls[mode] = round(time.perf_counter() - t0, 2)
            emitted[mode] = dd.novel_docs(spark).count()
            shutil.rmtree(base, ignore_errors=True)
        assert emitted["driver"] == emitted["distributed"], emitted
        out["configs"].append({"n_docs": n, "novel": emitted["driver"],
                               "wall_driver_s": walls["driver"],
                               "wall_distributed_s": walls["distributed"]})
        print(f"# n={n}: {out['configs'][-1]}", file=sys.stderr)
        docs.unpersist()
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "flatness"
    if mode == "flatness":
        n_b = int(sys.argv[2]) if len(sys.argv) > 2 else 50
        rpb = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
        print(json.dumps(flatness(n_b, rpb)))
    elif mode == "greedy":
        sizes = [int(a) for a in sys.argv[2:]] or [200_000, 1_000_000]
        print(json.dumps(greedy(sizes)))
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
