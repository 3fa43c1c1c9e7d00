"""Scale + two-parallelism evidence for duplicate_spans and
extract_html_text over the 2M Zipf pages (~110 tokens/doc => ~190M
16-token spans hashed map-side into the min-owner window shuffle; the
HTML leg wraps each page in a deterministic template — script/style/
comment blocks, block tags, entities — and measures the full map-only
extraction chain).

Usage: python tools/webtext_bench.py [cores] [reps] [src_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from filterz_spark.ops.dedup import duplicate_spans
from filterz_spark.ops.html import extract_html_text
from filterz_spark.spark.session import get_session


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    src = sys.argv[3] if len(sys.argv) > 3 else "/tmp/filterz_pages_2000000_zipf"
    spark = get_session(cores=cores, app_name=f"webtext-bench-{cores}")
    pages = spark.read.parquet(src)
    docs = pages.select(F.xxhash64("url").alias("doc_id"), "text", "url")
    out = {"cores": cores, "docs": docs.count()}

    for label, kw in [("duplicate_spans_md5", {}),
                      ("duplicate_spans_xxh", {"span_key": "xxhash64"})]:
        samples, rows = [], None
        for _ in range(reps):
            t0 = time.perf_counter()
            r = duplicate_spans(docs, window=16, **kw) \
                .agg(F.count("*").alias("n"),
                     F.sum("n_spans").alias("spans"),
                     F.sum("n_dup_spans").alias("dups")).collect()[0]
            rows = (r["n"], int(r["spans"]), int(r["dups"]))
            samples.append(round(time.perf_counter() - t0, 2))
        out[label] = {"samples": samples, "best": min(samples),
                      "out_rows": rows}

    host = F.regexp_extract("url", "^https?://([^/]+)", 1)
    html = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>"), host,
            F.lit("</title><style>body { color: #fff; }</style>"
                  "<script>if (1 < 2) { var s = \"</div>\"; }</script>"
                  "</head><body><h1>"), host,
            F.lit("</h1><!-- nav <p> --><div class='m'><p>"), F.col("text"),
            F.lit("</p><br/><li>A &amp; B &lt;= C</li></div></body></html>")
        ).alias("html"))
    samples, rows = [], None
    for _ in range(reps):
        t0 = time.perf_counter()
        # force the full extraction (sum of lengths defeats pruning)
        r = extract_html_text(html).agg(
            F.count("*").alias("n"),
            F.sum(F.length("text")).alias("chars")).collect()[0]
        rows = (r["n"], int(r["chars"]))
        samples.append(round(time.perf_counter() - t0, 2))
    out["html_extract"] = {"samples": samples, "best": min(samples),
                           "out_rows": rows}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
