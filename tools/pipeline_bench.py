"""Pipeline-scale rehearsal: the composed curation pipeline + LSH near-dup
pass over a synthetic multi-million-doc pages table (FIXTURES.md §1 shape),
with per-stage walls, cumulative shuffle read/write deltas (Spark REST API),
and a bucket-skew probe — the composed-pipeline analogue of the 160M-key
filter scaling evidence in BENCH/BASELINE.md.

The pages table is generated ONCE to parquet (deterministic, sources.pages)
and the pipeline reads it from storage like a real corpus scan — generation
cost is reported separately from pipeline cost. ``html`` is not written: the
curation pipeline consumes (doc_id, text, lang) and benchmarking storage the
pipeline never reads would only distort input-bytes numbers.

Usage:
    python tools/pipeline_bench.py [n_docs] [cores]        one config, JSON
    python tools/pipeline_bench.py [n_docs] --scaling      8 vs 32 cores via
                                                           subprocesses
    python tools/pipeline_bench.py [n_docs] --vocab=zipf   realistic 250k-type
                                                           power-law vocabulary
                                                           (LSH collision
                                                           structure of a real
                                                           web corpus)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_TMPL = "/tmp/filterz_pages_{n}"
FRACTIONS = {"en": 0.5, "zh": 0.8, "es": 1.0, "de": 1.0, "fr": 1.0}


def _rest_totals(spark) -> dict:
    """Cumulative completed-stage IO totals from the monitoring REST API."""
    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app}/stages?status=complete",
                timeout=10) as r:
            stages = json.load(r)
        tot = {"shuffle_read": 0, "shuffle_write": 0, "input": 0, "output": 0}
        for s in stages:
            tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
            tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
            tot["input"] += s.get("inputBytes", 0)
            tot["output"] += s.get("outputBytes", 0)
        return tot
    except Exception:
        return {"shuffle_read": 0, "shuffle_write": 0, "input": 0, "output": 0}


def _ensure_dataset(spark, n_docs: int, vocab: str = "uniform5k") -> str:
    from filterz_spark.sources.pages import synth_pages
    path = DATA_TMPL.format(n=n_docs) + \
        ("" if vocab == "uniform5k" else f"_{vocab}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        t0 = time.perf_counter()
        (synth_pages(spark, n_docs, vocab=vocab)
         .select("url", "warc_ts", "text", "lang")
         .write.mode("overwrite").parquet(path))
        print(f"# generated {n_docs} {vocab} pages in "
              f"{time.perf_counter() - t0:.1f}s -> {path}", file=sys.stderr)
    return path


def run(n_docs: int, cores: int, vocab: str = "uniform5k",
        shingle_k: int = 2) -> dict:
    from pyspark.sql import functions as F

    from filterz_spark.ops.dedup import (lsh_candidate_pairs,
                                         minhash_signature_arrays,
                                         ngram_decontaminate)
    from filterz_spark.ops.pipeline import curate_training_set
    from filterz_spark.ops.text import normalize_text
    from filterz_spark.spark.session import get_session

    spark = get_session(cores=cores, app_name=f"pipeline-bench-{cores}",
                        **{"spark.ui.enabled": "true",
                           "spark.ui.showConsoleProgress": "false"})
    path = _ensure_dataset(spark, n_docs, vocab)
    pages = spark.read.parquet(path)
    # doc_id is the row counter embedded in the url path (hex) — unique and
    # derivable map-side, no windowed id assignment over the corpus
    docs = pages.select(
        F.conv(F.element_at(F.split("url", "/"), -1), 16, 10)
        .cast("long").alias("doc_id"),
        "text", "lang")
    # benchmark suite for decontamination: a small deterministic slice
    bench = docs.filter(F.col("doc_id") % (max(n_docs // 500, 1)) == 0) \
                .select("doc_id", "text").limit(500)

    stages: dict[str, dict] = {}

    reps = int(os.environ.get("PIPELINE_BENCH_REPS", "2"))

    def measure(name: str, thunk):
        # best-of-N walls: this host shows ~10x bimodal stalls (see
        # BENCH/BASELINE.md) — a single sample manufactures phantom
        # regressions. Shuffle deltas come from the FIRST rep only
        # (they are deterministic; accumulating reps would multiply them).
        before = _rest_totals(spark)
        samples = []
        out_rows = None
        after = before
        for i in range(reps):
            t0 = time.perf_counter()
            out_rows = thunk()
            samples.append(round(time.perf_counter() - t0, 2))
            if i == 0:
                after = _rest_totals(spark)
        stages[name] = {
            "wall_sec": min(samples),
            "samples": samples,
            "out_rows": out_rows,
            "shuffle_read_mb": round(
                (after["shuffle_read"] - before["shuffle_read"]) / 1e6, 1),
            "shuffle_write_mb": round(
                (after["shuffle_write"] - before["shuffle_write"]) / 1e6, 1),
            "input_mb": round((after["input"] - before["input"]) / 1e6, 1),
        }
        print(f"# {name}: {min(samples):.1f}s {samples} rows={out_rows} "
              f"shuffleW={stages[name]['shuffle_write_mb']}MB", file=sys.stderr)

    def noop(df) -> int:
        df.write.format("noop").mode("overwrite").save()
        return -1  # full-width materialization; row count not collected

    # ---- standalone stages (each materialized separately) ----
    norm = normalize_text(docs, keep_cols=("lang",))
    measure("normalize", lambda: noop(norm))
    measure("exact_dedup", lambda: (
        norm.groupBy("norm_hash").agg(F.min("doc_id").alias("doc_id")).count()))
    measure("decontaminate", lambda: (
        ngram_decontaminate(docs, bench, k=3, min_contamination=0.2).count()))
    # the round-5 scale mode: 8-byte xxhash64 join keys for the broadcast
    # shingle set (identical decisions gated in tests/test_ops.py)
    measure("decontaminate_xxh", lambda: (
        ngram_decontaminate(docs, bench, k=3, min_contamination=0.2,
                            shingle_key="xxhash64").count()))
    # default = km_md5 since round 5 (1 md5/shingle); band_md5 kept as the
    # round-1..4 comparison leg so the default-flip delta stays measured
    sigs = minhash_signature_arrays(docs, num_hashes=8, k=shingle_k)
    measure("minhash_signatures", lambda: noop(sigs))
    measure("minhash_signatures_band", lambda: noop(
        minhash_signature_arrays(docs, num_hashes=8, k=shingle_k,
                                 hash_family="band_md5")))
    measure("minhash_signatures_xxh", lambda: noop(
        minhash_signature_arrays(docs, num_hashes=8, k=shingle_k,
                                 hash_family="km_xxh")))
    measure("lsh_candidate_pairs", lambda: (
        lsh_candidate_pairs(docs, num_hashes=8, k=shingle_k).count()))

    # bucket-skew probe: the largest LSH bucket (what max_bucket_size guards)
    exploded = sigs.select(F.posexplode("sig").alias("band", "minhash"))
    r = (exploded.groupBy("band", "minhash").count()
         .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
         .collect()[0])
    skew = {"max_bucket": int(r["mx"]), "avg_bucket": round(float(r["avg"]), 2)}
    print(f"# bucket skew: max={skew['max_bucket']} avg={skew['avg_bucket']}",
          file=sys.stderr)

    # ---- signature-level pre-filter on the exact-verify stage ----
    # the candidate count entering exact n-gram verification, with and
    # without the free n_bands/num_hashes Jaccard-estimate cut (threshold
    # 0.8, margin 0.3 -> keep estimate >= 0.5, i.e. n_bands >= 4 of 8);
    # the drop factor is what the verify stage's cost scales by
    from filterz_spark.ops.dedup import ngram_jaccard_pairs
    from pyspark import StorageLevel
    # DISK_ONLY persist, not localCheckpoint: checkpoint blocks are not
    # CacheManager-registered, so unpersist() on them is a no-op and the
    # pair blocks would stay resident through the curate measurement below
    cand = lsh_candidate_pairs(docs, num_hashes=8, k=shingle_k,
                               signatures=sigs).persist(StorageLevel.DISK_ONLY)
    n_cand = cand.count()
    n_kept = cand.filter(F.col("n_bands") / 8.0 >= 0.5).count()
    prefilter = {"candidates": n_cand, "after_prefilter": n_kept,
                 "drop_factor": round(n_cand / max(n_kept, 1), 1)}
    print(f"# prefilter: {n_cand} -> {n_kept} candidates "
          f"({prefilter['drop_factor']}x fewer exactly-verified pairs)",
          file=sys.stderr)
    # exact-verify walls, gated on the MEASURED candidate count: the
    # verify join ships both pairs' shingle sets (~1.8 KB/pair of shuffle
    # at this doc length — 17 GB measured at 9.75M pairs), so verify-all
    # over the dense-vocab corpus's 244M pairs at 10M docs needs ~425 GB
    # of shuffle spill and dies on this box's disk (round-6 run log).
    # That infeasibility IS the prefilter's reason to exist; measuring the
    # delta requires a pair count whose spill fits. NOT a silent cap: the
    # skip is logged with the arithmetic.
    verify_cap = 25_000_000
    if n_cand <= verify_cap:
        measure("jaccard_verify_all", lambda: ngram_jaccard_pairs(
            docs, k=shingle_k, min_jaccard=0.8, candidates=cand).count())
        measure("jaccard_verify_prefiltered", lambda: ngram_jaccard_pairs(
            docs, k=shingle_k, min_jaccard=0.8, candidates=cand,
            prefilter_margin=0.3).count())
    else:
        est_gb = round(n_cand * 1.8e3 / 1e9)
        print(f"# jaccard_verify legs SKIPPED: {n_cand} candidates x "
              f"~1.8KB/pair ≈ {est_gb} GB shuffle spill exceeds this "
              "host's disk (measured 17 GB at 9.75M pairs). The prefilter "
              f"keeps {n_kept} ({prefilter['drop_factor']}x fewer); at "
              "corpus scale bound the verify stage with prefilter_margin "
              "+ max_bucket_size, not wall-clock.", file=sys.stderr)
        prefilter["verify_skipped_est_shuffle_gb"] = est_gb
    cand.unpersist()

    # ---- the composed single-plan pipeline ----
    measure("curate_composed", lambda: (
        curate_training_set(docs, bench, FRACTIONS).count()))

    total_wall = sum(s["wall_sec"] for s in stages.values())
    out = {
        "n_docs": n_docs, "cores": cores, "vocab": vocab,
        "shingle_k": shingle_k,
        "stages": stages, "skew": skew,
        "prefilter": prefilter,
        "composed_docs_per_sec": int(n_docs / stages["curate_composed"]["wall_sec"]),
        "total_wall_sec": round(total_wall, 2),
    }
    spark.stop()
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if args else 10_000_000
    vocab = "uniform5k"
    # shingle_k default: 2 on the dense uniform vocabulary (the pinned
    # cross-round comparison), 5 on zipf — word 5-grams are the standard
    # web-dedup shingle; 2-grams of a power-law vocabulary make most docs
    # share head-token shingles, so every band minhash collapses onto the
    # few lowest-hashing common shingles and candidate pairs go
    # quadratic-in-corpus (measured: the 10M zipf k=2 leg exceeded this
    # host's disk in pair expansion — the dense-vocab artifact inverted)
    shingle_k = None
    for a in sys.argv[1:]:
        if a.startswith("--vocab="):
            vocab = a.split("=", 1)[1]
        elif a.startswith("--shingle-k="):
            shingle_k = int(a.split("=", 1)[1])
    if shingle_k is None:
        shingle_k = 5 if vocab == "zipf" else 2
    if "--scaling" in sys.argv:
        results = {}
        for cores in (8, 32):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(n_docs),
                 str(cores), f"--vocab={vocab}",
                 f"--shingle-k={shingle_k}"],
                capture_output=True, text=True, timeout=7200)
            sys.stderr.write(p.stderr)
            if p.returncode != 0:
                raise SystemExit(f"cores={cores} failed: {p.stderr[-2000:]}")
            results[cores] = json.loads(p.stdout.strip().splitlines()[-1])
        eff = {}
        for name in results[8]["stages"]:
            w8 = results[8]["stages"][name]["wall_sec"]
            w32 = results[32]["stages"][name]["wall_sec"]
            eff[name] = {"wall8": w8, "wall32": w32,
                         "speedup": round(w8 / w32, 2) if w32 else None}
        print(json.dumps({"n_docs": n_docs, "runs": results,
                          "scaling": eff}))
        return
    cores = int(args[1]) if len(args) > 1 else 32
    print(json.dumps(run(n_docs, cores, vocab, shingle_k)))


if __name__ == "__main__":
    main()
