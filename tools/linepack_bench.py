"""Scale + two-parallelism evidence for dedup_lines and pack_sequences
over the 2M Zipf pages (lines derived as 8-token chunks + per-host
header/footer — same shape as the boilerplate rehearsal, ~30 line rows
per doc = ~60M through the line-key window; packing streams ~220M
tokens into 2048-token sequences).

Usage: python tools/linepack_bench.py [cores] [reps] [src_dir]
       python tools/linepack_bench.py [cores] [reps] [src_dir] --hotkey

``--hotkey`` runs the round-7 planted-hot-key rehearsal instead: one
line (and one 16-token span) is planted into 50% of the docs, and the
combiner-friendly ``owner_strategy="agg"`` (default since round 7) is
raced against the round-6 ``"window"`` form on the same corpus —
dedup_lines AND duplicate_spans, with output-aggregate equality
asserted. The window form routes every copy of the hot key to ONE
reducer (WindowExec cannot pre-aggregate or split a partition); the agg
form collapses it map-side to one candidate row per task.
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


def hotkey_main(cores: int, reps: int, src: str) -> None:
    """Planted-hot-key rehearsal: agg vs window owner strategy."""
    from filterz_spark.ops.dedup import duplicate_spans

    spark = get_session(cores=cores, app_name=f"hotkey-bench-{cores}")
    pages = spark.read.parquet(src)
    w = F.split("text", " ")
    nl = F.ceil(F.size(w) / F.lit(8.0)).cast("int")
    lines_arr = F.transform(
        F.sequence(F.lit(1), nl),
        lambda i: F.array_join(F.slice(w, (i - 1) * 8 + 1, 8), " "))
    # plant a hot 30-token space-separated block + ONE hot line into 50%
    # of docs, prepended: the block yields 15 constant 16-token spans per
    # planted doc (tokens after it are contaminated by the "\n" joint),
    # the block line + the hot line give dedup_lines two viral line keys
    hot_line = "cookie banner accept all reject all manage preferences"
    hot_block = " ".join(f"boiler{i}" for i in range(30))
    doc_id = F.xxhash64("url")
    docs = pages.select(
        doc_id.alias("doc_id"),
        F.when(doc_id % 2 == 0,
               F.concat(F.lit(hot_block + "\n" + hot_line + "\n"),
                        F.array_join(lines_arr, "\n")))
        .otherwise(F.array_join(lines_arr, "\n")).alias("text"))
    out = {"cores": cores, "docs": docs.count(), "hot_frac": 0.5}

    for strat in ("agg", "window"):
        samples, rows = [], None
        for _ in range(reps):
            t0 = time.perf_counter()
            r = dedup_lines(docs, join_on_hash=True, owner_strategy=strat) \
                .agg(F.count("*").alias("n"),
                     F.sum(F.length("clean_text")).alias("chars"),
                     F.sum("n_lines_removed").alias("removed")).collect()[0]
            rows = (r["n"], int(r["chars"]), int(r["removed"]))
            samples.append(round(time.perf_counter() - t0, 2))
        out[f"dedup_lines_hot_{strat}"] = {
            "samples": samples, "best": min(samples), "out_rows": rows}
    assert (out["dedup_lines_hot_agg"]["out_rows"]
            == out["dedup_lines_hot_window"]["out_rows"]), out

    # spans over a 16-token window: the planted line + each doc's first
    # tokens make the hot span appear once per planted doc
    for strat in ("agg", "window"):
        samples, rows = [], None
        for _ in range(reps):
            t0 = time.perf_counter()
            r = duplicate_spans(docs, window=16, span_key="xxhash64",
                                owner_strategy=strat) \
                .agg(F.count("*").alias("n"),
                     F.sum("n_spans").alias("spans"),
                     F.sum("n_dup_spans").alias("dups")).collect()[0]
            rows = (r["n"], int(r["spans"]), int(r["dups"]))
            samples.append(round(time.perf_counter() - t0, 2))
        out[f"duplicate_spans_hot_{strat}"] = {
            "samples": samples, "best": min(samples), "out_rows": rows}
    assert (out["duplicate_spans_hot_agg"]["out_rows"]
            == out["duplicate_spans_hot_window"]["out_rows"]), out
    # the plant must actually be hot: every planted doc but the owner
    # carries 15 duplicated spans
    assert out["duplicate_spans_hot_agg"]["out_rows"][2] > 10_000_000, out
    print(json.dumps(out))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    src = sys.argv[3] if len(sys.argv) > 3 else "/tmp/filterz_pages_2000000_zipf"
    if "--hotkey" in sys.argv:
        return hotkey_main(cores, reps, src)
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
