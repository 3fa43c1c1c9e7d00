"""Scale + two-parallelism evidence for dedup_lines and pack_sequences
over the 2M Zipf pages (lines derived as 8-token chunks + per-host
header/footer — same shape as the boilerplate rehearsal, ~30 line rows
per doc = ~60M through the line-key window; packing streams ~220M
tokens into 2048-token sequences).

Usage: python tools/linepack_bench.py [cores] [reps] [src_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from filterz_spark.ops.pack import pack_sequences
from filterz_spark.ops.text import dedup_lines
from filterz_spark.spark.session import get_session


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    src = sys.argv[3] if len(sys.argv) > 3 else "/tmp/filterz_pages_2000000_zipf"
    spark = get_session(cores=cores, app_name=f"linepack-bench-{cores}")
    pages = spark.read.parquet(src)
    w = F.split("text", " ")
    nl = F.ceil(F.size(w) / F.lit(8.0)).cast("int")
    lines_arr = F.transform(
        F.sequence(F.lit(1), nl),
        lambda i: F.array_join(F.slice(w, (i - 1) * 8 + 1, 8), " "))
    host = F.regexp_extract("url", "^https?://([^/]+)", 1)
    docs = pages.select(
        F.xxhash64("url").alias("doc_id"),
        F.concat(F.lit("header "), host, F.lit("\n"),
                 F.array_join(lines_arr, "\n"),
                 F.lit("\nfooter "), host).alias("text"))
    out = {"cores": cores, "docs": docs.count()}

    for label, kw in [("dedup_lines_exact", {}),
                      ("dedup_lines_hashed", {"join_on_hash": True})]:
        samples, rows = [], None
        for _ in range(reps):
            t0 = time.perf_counter()
            # force the full rebuild: a bare count() lets Catalyst prune
            # the array_sort/array_join clean_text expressions entirely
            r = dedup_lines(docs, **kw) \
                .agg(F.count("*").alias("n"),
                     F.sum(F.length("clean_text")).alias("chars"),
                     F.sum("n_lines_removed").alias("removed")).collect()[0]
            rows = (r["n"], int(r["chars"]), int(r["removed"]))
            samples.append(round(time.perf_counter() - t0, 2))
        out[label] = {"samples": samples, "best": min(samples),
                      "out_rows": rows}

    samples, rows = [], None
    for _ in range(reps):
        # token_offsets persists its sorted projection; an identical plan
        # in the next rep would silently serve from that cache
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        r = pack_sequences(pages.select(F.xxhash64("url").alias("doc_id"),
                                        "text"), seq_len=2048) \
            .agg(F.count("*").alias("n"),
                 F.countDistinct("seq_id").alias("seqs"),
                 F.sum("slice_len").alias("toks")).collect()[0]
        rows = (r["n"], int(r["seqs"]), int(r["toks"]))
        samples.append(round(time.perf_counter() - t0, 2))
    out["pack_sequences_2048"] = {"samples": samples, "best": min(samples),
                                  "out_rows": rows}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
