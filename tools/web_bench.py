"""Scale + two-parallelism evidence for ops/web over the 2M Zipf pages."""
import json, sys, time
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from filterz_spark.ops.web import url_dedup, host_stats
from filterz_spark.spark.session import get_session

cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
spark = get_session(cores=cores, app_name=f"web-bench-{cores}")
pages = spark.read.parquet("/tmp/filterz_pages_2000000_zipf")
# derive doc ids + messy variants: ~4 spellings per logical URL so the
# dedup actually collapses (same id-space trick as the driver entry)
docs = pages.select(
    F.conv(F.element_at(F.split("url", "/"), -1), 16, 10).cast("long")
    .alias("doc_id"), "url",
    F.length("text").alias("n_chars")).withColumn(
    "url", F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTP://")).otherwise(F.lit("http://")),
        F.regexp_replace("url", "^https?://", ""),
        F.element_at(F.array(F.lit("?utm_source=x&b=2&a=1"), F.lit("?b=2&a=1"),
                             F.lit("?a=1&b=2&fbclid=z"), F.lit("")),
                     (F.col("doc_id") % 4 + 1).cast("int")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#f")).otherwise(F.lit(""))))
n = docs.count()
out = {"cores": cores, "docs": n}
for name, fn in [("url_dedup", lambda: url_dedup(docs).count()),
                 ("host_stats", lambda: host_stats(docs, size_col="n_chars").count())]:
    samples, val = [], None
    for _ in range(reps):
        t0 = time.perf_counter(); val = fn()
        samples.append(round(time.perf_counter() - t0, 2))
    out[name] = {"samples": samples, "best": min(samples), "out_rows": val}
print(json.dumps(out))
