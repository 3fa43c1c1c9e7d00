"""VERDICT-r06 #8: degenerate-cluster stress for _salted_pair_join.

200k synthetic 32-dim vectors; cluster 0 holds 10% of them (20k rows ->
~200M within-cluster pairs), the rest spread over 100 clusters. The
salted group-pair join is raced at g=1 (degenerate: the hot cluster's
entire pair set lands on ONE reducer — the unsalted shape), g=8 (the
library default) and g=32. Verifies:

- pair COUNT identical across g (the replication scheme emits each
  unordered pair exactly once);
- the g(g+1)/2 fan-out: the hot cluster's joined rows spread over
  g(g+1)/2 (gi, gj) shuffle keys, measured directly as the max joined
  group size;
- wall at 32 cores per g.

Usage: python tools/r07_salted_stress.py [cores] [n_vecs] [hot_frac]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from filterz_spark.ops.similarity import _dot_expr, _salted_pair_join  # noqa: E402
from filterz_spark.spark.session import get_session  # noqa: E402


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    hot_frac = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
    dim = 32
    # force the shuffle join path (a 200k-row side would broadcast and
    # dodge the skew question entirely) — at corpus scale neither side
    # broadcasts, which is the regime the salt exists for
    spark = get_session(cores=cores, app_name="salted-stress",
                        **{"spark.sql.autoBroadcastJoinThreshold": "-1"})
    hot_n = int(n * hot_frac)
    # deterministic pseudo-vectors: 32 hash-derived floats in [-1, 1)
    vec = F.array(*[
        (F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(2_000_000))
         / F.lit(1_000_000.0) - F.lit(1.0)).alias(f"x{j}")
        for j in range(dim)])
    base = (spark.range(n).repartition(cores)
            .select(F.col("id").alias("vec_id"),
                    F.when(F.col("id") < hot_n, F.lit(0))
                    .otherwise(F.pmod(F.xxhash64("id"), F.lit(100))
                               .cast("int") + 1).alias("cluster"),
                    vec.alias("__v")))
    e = base.withColumn("__n", F.sqrt(_dot_expr(F.col("__v"), F.col("__v")))) \
        .localCheckpoint(eager=True)
    out = {"cores": cores, "n_vecs": n, "hot_cluster_rows": hot_n,
           "dim": dim,
           "hot_pairs": hot_n * (hot_n - 1) // 2}
    for g in (1, 8, 32):
        t0 = time.monotonic()
        # the cosine filter keeps the per-pair dot product in the plan —
        # a bare count() would prune the reducer's actual work away
        res = _salted_pair_join(e, "vec_id", ["cluster"], g=g) \
            .agg(F.count("*").alias("pairs"),
                 F.sum((F.col("cosine") >= 0.9).cast("long")).alias("near")) \
            .collect()[0]
        out[f"g{g}"] = {"wall": round(time.monotonic() - t0, 2),
                        "pairs": int(res["pairs"]), "near": int(res["near"])}
        print(f"g={g}", out[f"g{g}"], file=sys.stderr, flush=True)
    assert (out["g1"]["pairs"] == out["g8"]["pairs"] == out["g32"]["pairs"]
            and out["g1"]["near"] == out["g8"]["near"] == out["g32"]["near"]), out

    # fan-out evidence: joined rows per (cluster, gi, gj) shuffle key for
    # the hot cluster — the single g=1 group vs g(g+1)/2 salted groups
    for g in (1, 8):
        eg = e.withColumn("grp", F.pmod(F.xxhash64("vec_id"),
                                        F.lit(g)).cast("int"))
        a = eg.select(F.col("vec_id").alias("ia"), "cluster",
                      F.col("grp").alias("gi"),
                      F.explode(F.sequence(F.col("grp"),
                                           F.lit(g - 1))).alias("gj"))
        b = eg.select(F.col("vec_id").alias("ib"), "cluster",
                      F.explode(F.sequence(F.lit(0),
                                           F.col("grp"))).alias("gi"),
                      F.col("grp").alias("gj"))
        sizes = (a.join(b, ["cluster", "gi", "gj"])
                 .where(F.col("cluster") == 0)
                 .groupBy("gi", "gj").count()
                 .agg(F.count("*").alias("groups"),
                      F.max("count").alias("max_group"),
                      F.sum("count").alias("rows")).collect()[0])
        out[f"hot_fanout_g{g}"] = {
            "shuffle_key_groups": int(sizes["groups"]),
            "max_rows_one_key": int(sizes["max_group"]),
            "total_joined_rows": int(sizes["rows"])}
        print(f"fanout g={g}", out[f"hot_fanout_g{g}"], file=sys.stderr,
              flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
