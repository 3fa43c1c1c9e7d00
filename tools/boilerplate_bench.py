"""Scale + two-parallelism evidence for remove_boilerplate over the 2M
Zipf pages (lines derived as 8-token chunks + per-host header/footer —
same shape as the driver entry, at 2M docs ~30 lines/doc = ~60M line
rows through the (group, line) shuffle)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from filterz_spark.ops.text import remove_boilerplate
from filterz_spark.spark.session import get_session


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    src = sys.argv[3] if len(sys.argv) > 3 else "/tmp/filterz_pages_2000000_zipf"
    spark = get_session(cores=cores, app_name=f"boilerplate-bench-{cores}")
    pages = spark.read.parquet(src)
    w = F.split("text", " ")
    nl = F.ceil(F.size(w) / F.lit(8.0)).cast("int")
    lines_arr = F.transform(
        F.sequence(F.lit(1), nl),
        lambda i: F.array_join(F.slice(w, (i - 1) * 8 + 1, 8), " "))
    host = F.regexp_extract("url", "^https?://([^/]+)", 1)
    docs = pages.select(
        F.xxhash64("url").alias("doc_id"), host.alias("source"),
        F.concat(F.lit("header "), host, F.lit("\n"),
                 F.array_join(lines_arr, "\n"),
                 F.lit("\nfooter "), host).alias("text"))
    out = {"cores": cores, "docs": docs.count()}
    for label, kw in [("exact", {}), ("hashed", {"join_on_hash": True})]:
        samples, rows = [], None
        for _ in range(reps):
            t0 = time.perf_counter()
            # force the full rebuild: a bare count() lets Catalyst prune
            # the array_sort/array_join clean_text expressions entirely
            r = remove_boilerplate(docs, min_docs=3, doc_frac=0.5, **kw) \
                .agg(F.count("*").alias("n"),
                     F.sum(F.length("clean_text")).alias("chars"),
                     F.sum("n_lines_removed").alias("removed")).collect()[0]
            rows = (r["n"], int(r["chars"]), int(r["removed"]))
            samples.append(round(time.perf_counter() - t0, 2))
        out[label] = {"samples": samples, "best": min(samples),
                      "out_rows": rows}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
