"""Deduplication operators for training-data pipelines.

Exact dedup (hash-groupBy), MinHash+LSH (shingle -> minhash -> band ->
bucket-join), n-gram Jaccard verification, SimHash, and embedding-cosine
near-dup. Exact/MinHash/Jaccard are expressed with JVM built-ins (md5 as the
shared hash makes MinHash oracle-checkable in DuckDB, which has the same
md5); SimHash needs bit-twiddling -> vectorized numpy over mapInArrow.

Scale posture: every operator is a groupBy/join on a derived key — shingle
explosion is the only fan-out (x ~n_tokens per doc) and is immediately
re-aggregated map-side; LSH bucket join replaces the O(n^2) all-pairs
comparison with an equi-join on (band, minhash) that Spark shuffles by
bucket; Jaccard runs only on LSH candidates.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, functions as F


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash: (text_hash, keep_id, dup_count)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").cast("long").alias("dup_count"))
    )


def shingles(docs: DataFrame, k: int = 2, text_col: str = "text") -> DataFrame:
    """Word k-gram shingles: (doc_id, shingle). Spark-side via transform/slice."""
    words = F.split(F.col(text_col), " ")
    sh = F.expr(
        f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - {k - 1}, 1)), "
        f"i -> array_join(slice(split({text_col}, ' '), i, {k}), ' '))"
    )
    return docs.select("doc_id", F.explode(sh).alias("shingle"))


def minhash_signatures(docs: DataFrame, num_hashes: int = 8, k: int = 2) -> DataFrame:
    """Long-format MinHash signature: (doc_id, band, minhash).

    Hash family: md5 of 'band:shingle' — band-salted md5, identical in DuckDB
    so the full signature is oracle-checkable. minhash = lexicographic min of
    fixed-width hex = numeric min of the underlying 128-bit value.
    """
    sh = shingles(docs, k=k)
    bands = docs.sparkSession.range(num_hashes).select(F.col("id").cast("int").alias("band"))
    return (
        sh.crossJoin(F.broadcast(bands))
        .select("doc_id", "band",
                F.md5(F.concat_ws(":", F.col("band"), F.col("shingle"))).alias("h"))
        .groupBy("doc_id", "band")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(docs: DataFrame, num_hashes: int = 8, k: int = 2) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any (band, minhash) bucket.

    The equi-join on the bucket key is the scale move: no all-pairs shuffle,
    only docs with a colliding band meet. Returns (doc_a, doc_b, n_bands)."""
    sig = minhash_signatures(docs, num_hashes, k)
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(b, [F.col("a.band") == F.col("b.band"),
                   F.col("a.minhash") == F.col("b.minhash"),
                   F.col("a.doc_id") < F.col("b.doc_id")])
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_bands"))
    )


def ngram_jaccard_pairs(docs: DataFrame, k: int = 2, min_jaccard: float = 0.0,
                        num_hashes: int = 8) -> DataFrame:
    """Exact k-gram Jaccard for LSH candidate pairs (verification stage).

    (doc_a, doc_b, jaccard) for candidates with jaccard >= min_jaccard."""
    cand = lsh_candidate_pairs(docs, num_hashes=num_hashes, k=k).select("doc_a", "doc_b")
    sets = (
        shingles(docs, k=k).groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"))
    )
    j = (
        cand.join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sa"), "doc_a")
        .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sb"), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.size(F.array_intersect("sa", "sb")).cast("double")
                / F.size(F.array_union("sa", "sb")).cast("double"), 4
            ).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= min_jaccard)


def _simhash_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """64-bit SimHash per doc from per-word splitmix-mixed hashes (numpy)."""
    import numpy as np

    def mix(x):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    for batch in batches:
        doc_ids = batch.column(0).to_numpy(zero_copy_only=False)
        texts = batch.column(1).to_pylist()
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            words = t.split(" ") if t else []
            if not words:
                out[i] = 0
                continue
            # FNV-ish word bytes hash, then splitmix finalizer, vectorized
            wh = np.array([hash_word(w) for w in words], dtype=np.uint64)
            wh = mix(wh)
            bits = (wh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
            votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            out[i] = np.int64((votes > 0).astype(np.uint64)
                              .dot(np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.int64))
        yield pa.RecordBatch.from_arrays(
            [batch.column(0), pa.array(out, pa.int64())], names=["doc_id", "simhash"]
        )


def hash_word(w: str) -> int:
    """Deterministic FNV-1a over utf-8 bytes (process-independent, unlike
    Python's builtin hash)."""
    h = 0xCBF29CE484222325
    for b in w.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash int64). Near-dups = small hamming distance."""
    return docs.select("doc_id", "text").mapInArrow(
        _simhash_fn, "doc_id long, simhash long"
    )


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """SimHash near-dup pairs via 4-band bucketing (each 16-bit quarter is a
    bucket key; a pair within hamming distance 3 shares >= 1 exact quarter —
    the classic pigeonhole block trick) then exact hamming check."""
    sh = simhash(docs)
    quarters = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(q).alias("q"),
                     F.shiftrightunsigned("simhash", 16 * q).bitwiseAND(F.lit(0xFFFF)).alias("bucket"))
            for q in range(4)
        ])).alias("e"),
    ).select("doc_id", "simhash", "e.q", "e.bucket")
    a, b = quarters.alias("a"), quarters.alias("b")
    cand = (
        a.join(b, [F.col("a.q") == F.col("b.q"), F.col("a.bucket") == F.col("b.bucket"),
                   F.col("a.doc_id") < F.col("b.doc_id")])
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("ha"), F.col("b.simhash").alias("hb"))
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select("doc_a", "doc_b", hamming.cast("int").alias("hamming")) \
               .filter(F.col("hamming") <= max_hamming)
