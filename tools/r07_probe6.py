"""Round-7 extreme hot-key probe: ONE line key with 20M copies.

2M synthetic docs, each = 10 copies of the SAME line + 2 unique lines.
dedup_lines hashed mode: the window owner form routes all 20M copies of
the hot key to ONE reducer; the agg form collapses them map-side.
Equality of output aggregates asserted."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from filterz_spark.ops.text import dedup_lines  # noqa: E402
from filterz_spark.spark.session import get_session  # noqa: E402


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_session(cores=cores, app_name="hotkey-extreme")
    hot = "cookie banner accept all reject all manage preferences"
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.concat_ws("\n", *([F.lit(hot)] * 10)),
            F.lit("\nunique "), F.col("id").cast("string"),
            F.lit("\ntail "), F.xxhash64("id").cast("string")).alias("text"))
    out = {"cores": cores, "docs": n_docs, "hot_copies": n_docs * 10}
    for strat in ("agg", "window"):
        t0 = time.monotonic()
        r = dedup_lines(base, join_on_hash=True, owner_strategy=strat) \
            .agg(F.count("*").alias("n"),
                 F.sum("n_lines_kept").alias("kept"),
                 F.sum("n_lines_removed").alias("removed")).collect()[0]
        out[strat] = {"wall": round(time.monotonic() - t0, 2),
                      "out_rows": (r["n"], int(r["kept"]), int(r["removed"]))}
        print(strat, out[strat], file=sys.stderr, flush=True)
    assert out["agg"]["out_rows"] == out["window"]["out_rows"], out
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
