"""Planted-duplicate value gate for duplicate_spans at 2M-doc scale.

The clean Zipf corpus has ZERO cross-document 16-token duplicate spans
(independent power-law draws — webtext_bench measures pure cost there),
so this check plants exact evidence: every 50th doc is copied under a
larger id (bit 40 set). Because each clean span is unique to its doc,
the expected result is EXACT, not statistical:

- every copy's spans are all owned by its original -> n_dup_spans ==
  n_spans on every copy;
- every original keeps n_dup_spans == 0;
- total dup spans == total spans of the copied docs.

Usage: python tools/spans_value_check.py [cores] [src_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from filterz_spark.ops.dedup import duplicate_spans
from filterz_spark.spark.session import get_session


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    src = sys.argv[2] if len(sys.argv) > 2 else "/tmp/filterz_pages_2000000_zipf"
    spark = get_session(cores=cores, app_name=f"spans-check-{cores}")
    # clear bit 40 on the base ids so the copy namespace (bit 40 SET) is
    # disjoint and every copy id is strictly greater than its original
    base = spark.read.parquet(src).select(
        F.xxhash64("url").bitwiseAND(F.lit(~(1 << 40)).cast("long"))
        .alias("doc_id"), "text")
    copies = base.where(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").bitwiseOR(F.lit(1 << 40).cast("long"))
        .alias("doc_id"), "text")
    docs = base.unionByName(copies)
    t0 = time.perf_counter()
    stats = duplicate_spans(docs, window=16)
    is_copy = (F.col("doc_id").bitwiseAND(F.lit(1 << 40).cast("long")) != 0)
    r = stats.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_dup_spans").alias("dup_total"),
        F.sum(F.when(is_copy, F.col("n_spans"))).alias("copy_spans"),
        F.sum(F.when(is_copy, (F.col("n_dup_spans") != F.col("n_spans"))
                     .cast("long")).otherwise(F.lit(0))).alias("bad_copies"),
        F.sum(F.when(~is_copy, F.col("n_dup_spans")).otherwise(F.lit(0)))
        .alias("orig_dups")).collect()[0]
    wall = round(time.perf_counter() - t0, 2)
    out = {"cores": cores, "n_docs": r["n_docs"], "wall": wall,
           "dup_total": int(r["dup_total"]),
           "copy_spans": int(r["copy_spans"]),
           "bad_copies": int(r["bad_copies"]),
           "orig_dups": int(r["orig_dups"])}
    assert out["bad_copies"] == 0, out      # every copy fully duplicated
    assert out["orig_dups"] == 0, out       # originals own their spans
    assert out["dup_total"] == out["copy_spans"], out
    out["ok"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
