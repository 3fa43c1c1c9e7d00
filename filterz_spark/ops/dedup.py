"""Deduplication operators for training-data pipelines.

Exact dedup (hash-groupBy), MinHash+LSH (shingle -> minhash -> band ->
bucket-join), n-gram Jaccard verification, SimHash, and embedding-cosine
near-dup. ALL of them — simhash included — are expressed with JVM built-ins
(md5 as the shared word hash makes every value oracle-checkable in DuckDB,
which has the same md5); nothing here runs per-row Python.

Scale posture: every operator is a groupBy/join on a derived key — shingle
explosion is the only fan-out (x ~n_tokens per doc) and is immediately
re-aggregated map-side; LSH bucket join replaces the O(n^2) all-pairs
comparison with an equi-join on (band, minhash) that Spark shuffles by
bucket; Jaccard runs only on LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..spark.partitioning import ensure_parallelism


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash: (text_hash, keep_id, dup_count).

    NULL texts form ONE group (md5(NULL)=NULL, SQL GROUP BY semantics —
    matching the ANSI oracle). That is usually what dedup wants for a
    missing-content sentinel, but if NULL-text docs must each survive
    (the streaming near-dup path's pass-through choice), filter them out
    before this operator and union them back.
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").cast("long").alias("dup_count"))
    )


def shingle_array(k: int = 2, text_col: str = "text"):
    """Column expression: the word k-gram shingle ARRAY of a text column —
    the zero-shuffle building block behind ``shingles``.

    Built as ``arrays_zip`` of k shifted slices of the word array with one
    ``concat_ws`` per element: a per-SHINGLE slice()+array_join() costs
    ~3.5x more inside Catalyst's higher-order functions (measured). Docs
    shorter than k words yield one whole-doc shingle (arrays_zip pads with
    nulls, which concat_ws skips) — same contract as the DuckDB oracle.
    """
    ws = F.split(F.col(text_col), " ")
    n_shingles = F.greatest(F.size(ws) - F.lit(k - 1), F.lit(1))
    shifted = [F.slice(ws, j + 1, n_shingles) for j in range(k)]
    return F.transform(F.arrays_zip(*shifted),
                       lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)]))


def shingles(docs: DataFrame, k: int = 2, text_col: str = "text") -> DataFrame:
    """Word k-gram shingles: (doc_id, shingle) — per-row expr (see
    ``shingle_array`` for the construction).

    The input is routed through ``ensure_parallelism`` first: the shingle
    expansion plus the md5 work every consumer fuses on top of it is the
    cost center of the signature pass, and Spark fuses it into the SCAN
    stage — a small or single-row-group input would otherwise run it on
    1-2 tasks (measured 3-5x on the round-6 bench legs at local[32]). At
    corpus scale the helper is a no-op (scan partitions >= cores)."""
    base = ensure_parallelism(docs.select("doc_id", text_col))
    return base.select("doc_id",
                       F.explode(shingle_array(k, text_col)).alias("shingle"))


def minhash_signature_arrays(docs: DataFrame, num_hashes: int = 8,
                             k: int = 2,
                             hash_family: str = "km_md5") -> DataFrame:
    """Banded MinHash signature, ONE row per doc: (doc_id, sig array<string>).

    Hash families (both bit-identical in DuckDB, so fully oracle-checkable):

    - ``km_md5`` (DEFAULT since round 5): Kirsch-Mitzenmacher double
      hashing — ONE md5 per shingle split into two 56-bit halves (h1, h2);
      band b's hash is ``h1 + b*h2`` (numeric min, stringified). The
      10M-doc pipeline rehearsal (BENCH/PIPELINE.md) measured the
      signature pass as the single most expensive curation stage with
      band_md5's 8 md5s per shingle — km_md5 cuts the md5 count 8x with
      the standard KM guarantee (Kirsch & Mitzenmacher 2006: two-hash
      derived families preserve Bloom/MinHash-style error behavior).
      56-bit halves keep ``h1 + b*h2`` < 2^61 for num_hashes <= 15 — no
      int64 overflow under ANSI mode (enforced).
    - ``band_md5`` (the round-1..4 default): md5 of 'band:shingle' —
      ``num_hashes`` independent md5 evaluations per shingle; minhash =
      lexicographic min of fixed-width hex = numeric min of the underlying
      128-bit value. Kept for fully-independent band hashes and for
      signature stores written by earlier rounds (the two families'
      signatures are NOT comparable — never mix them in one store).
    - ``km_xxh``: same KM construction over JVM ``xxhash64(shingle, salt)``
      instead of md5 — no hex-string materialization, ~4x less hash
      compute on the DRAM-bound signature pass. NOT DuckDB-reproducible
      (DuckDB has no xxhash64), so it carries no value oracle; set
      semantics (identical dedup decisions) are gated in tests/test_ops.py
      against the md5 families. Because xxhash is ALU-cheap, this family
      is PURE memory traffic: it wins only while bandwidth per core is
      ample (round-6 controlled probe, BENCH/PIPELINE.md: 1.7x faster
      than km_md5 at 8 cores on one box, SLOWER at 32 where it saturates
      the single memory controller and scales 1.16x vs km_md5's 2.99x).
      On a multi-node cluster each executor brings its own controllers,
      restoring the advantage.

    CHANGED in round 5: the default flipped from ``band_md5`` to
    ``km_md5`` — the builder's own rehearsal identified the 8-md5/shingle
    signature pass as the pipeline cost center. Pin ``band_md5``
    explicitly to reproduce round-1..4 signatures.

    This is the storage/compute form: all ``num_hashes`` band hashes are
    computed as columns of the SAME shingle row and reduced in one
    groupBy(doc_id) with per-band min aggregates — no band-replication of
    the shingle rows (the former crossJoin form shuffled num_hashes x
    n_shingles rows through a (doc_id, band) aggregate; this shuffles only
    map-side-combined partials, one row per doc per map partition). At
    corpus scale this table is what you persist; downstream consumers
    explode it on demand.
    """
    sh = shingles(docs, k=k)
    if hash_family in ("km_md5", "km_xxh"):
        if num_hashes > 15:
            raise ValueError(f"{hash_family} supports num_hashes <= 15 "
                             "(56-bit halves keep h1 + b*h2 overflow-free)")
        if hash_family == "km_md5":
            hs = (sh.select("doc_id", F.md5("shingle").alias("mh"))
                  .select("doc_id",
                          F.conv(F.substring("mh", 1, 14), 16, 10)
                          .cast("long").alias("h1"),
                          F.conv(F.substring("mh", 15, 14), 16, 10)
                          .cast("long").alias("h2")))
        else:
            # two independent 56-bit hashes straight from the JVM xxhash64
            # kernel (salted second draw) — no hex-string round trip
            mask = F.lit((1 << 56) - 1)
            hs = sh.select(
                "doc_id",
                F.xxhash64("shingle").bitwiseAND(mask).alias("h1"),
                F.xxhash64("shingle", F.lit(1)).bitwiseAND(mask).alias("h2"))
        mins = [F.min(F.col("h1") + F.lit(b) * F.col("h2")).alias(f"m{b}")
                for b in range(num_hashes)]
        agg = hs.groupBy("doc_id").agg(*mins)
        return agg.select(
            "doc_id", F.array(*[F.col(f"m{b}").cast("string")
                                for b in range(num_hashes)]).alias("sig"))
    if hash_family != "band_md5":
        raise ValueError(f"unknown hash_family {hash_family!r}")
    mins = [
        F.min(F.md5(F.concat_ws(":", F.lit(b), F.col("shingle")))).alias(f"m{b}")
        for b in range(num_hashes)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[f"m{b}" for b in range(num_hashes)]).alias("sig"))


# family-pinned batch signature stores: the hash families' signatures
# NEVER collide with each other (km decimal vs band hex strings), so a
# pipeline that joins old signatures written under one family with new
# ones derived under another silently stops deduplicating — the exact
# hazard the round-5 default flip (band_md5 -> km_md5) created for any
# persisted pre-flip store. The marker lives in an underscore-prefixed
# subdirectory: Spark's parquet reader ignores `_`-prefixed paths (the
# `_SUCCESS` convention), so `spark.read.parquet(path)` on the store is
# unaffected, and writing the marker THROUGH Spark keeps the store
# portable to any Spark-writable filesystem (HDFS/S3), unlike a
# driver-local ``open()`` sidecar.
SIGSTORE_META_DIR = "_filterz_signature_meta"
SIGSTORE_META_SCHEMA = ("hash_family string, num_hashes int, k int, "
                        "version int")


def write_signature_store(sig_arr: DataFrame, path: str, *,
                          hash_family: str, num_hashes: int, k: int,
                          mode: str = "error") -> None:
    """Persist an array-form signature table (as produced by
    ``minhash_signature_arrays``) WITH its family marker.

    ``mode="append"`` validates the existing marker first (family AND
    signature shape must match — appending 16-hash signatures to an
    8-hash store corrupts every downstream band position); any other
    mode (over)writes marker and data together. Appending to a
    pre-existing UNMARKED store raises: its family is unknown (written
    before this helper, or by foreign code) — stamp it explicitly with
    ``stamp_signature_store`` after verifying what produced it.
    """
    spark = sig_arr.sparkSession
    meta_path = f"{path.rstrip('/')}/{SIGSTORE_META_DIR}"
    if mode == "append":
        try:
            existing = spark.read.schema(SIGSTORE_META_SCHEMA) \
                .json(meta_path).collect()
        except Exception:
            existing = None
        if existing:
            m = existing[0]
            if (m["hash_family"], m["num_hashes"], m["k"]) != \
                    (hash_family, num_hashes, k):
                raise RuntimeError(
                    f"signature store at {path} was written with "
                    f"hash_family={m['hash_family']!r}, num_hashes="
                    f"{m['num_hashes']}, k={m['k']} but this append is "
                    f"({hash_family!r}, {num_hashes}, {k}): mixed "
                    "families/shapes never collide with each other, so "
                    "the store would silently stop deduplicating. Pin "
                    "the store's parameters, or write a fresh store.")
        else:
            # does DATA already exist without a marker?
            try:
                spark.read.parquet(path).schema
                has_data = True
            except Exception:
                has_data = False
            if has_data:
                raise RuntimeError(
                    f"signature store at {path} has data but no "
                    f"{SIGSTORE_META_DIR} marker: its hash family is "
                    "unknown (pre-marker store or foreign directory). "
                    "Verify what produced it and stamp it with "
                    "stamp_signature_store, or point at a fresh path.")
    sig_arr.write.mode(mode).parquet(path)
    stamp_signature_store(spark, path, hash_family=hash_family,
                          num_hashes=num_hashes, k=k)


def stamp_signature_store(spark, path: str, *, hash_family: str,
                          num_hashes: int, k: int) -> None:
    """(Re)write the family marker of a signature store — for adopting a
    store written before markers existed, AFTER verifying its lineage."""
    # driver-side Hadoop FS write (see spark.fsio): the 1-row Spark job
    # this replaces cost ~4.5 s per stamp; the directory stays readable by
    # the unchanged spark.read.json reader
    import json as _json

    from ..spark.fsio import overwrite_json_marker
    meta_path = f"{path.rstrip('/')}/{SIGSTORE_META_DIR}"
    overwrite_json_marker(spark, meta_path, _json.dumps({
        "hash_family": hash_family, "num_hashes": num_hashes, "k": k,
        "version": 1}))


def read_signature_store(spark, path: str, *, hash_family: str,
                         num_hashes: int | None = None,
                         k: int | None = None) -> DataFrame:
    """Open a family-pinned signature store, validating the marker against
    what the caller is about to join it with. A store without a marker is
    refused loudly (unknown family — never guess), same contract as the
    streaming store's meta.json."""
    meta_path = f"{path.rstrip('/')}/{SIGSTORE_META_DIR}"
    try:
        rows = spark.read.schema(SIGSTORE_META_SCHEMA).json(meta_path) \
            .collect()
    except Exception:
        rows = []
    if not rows:
        raise RuntimeError(
            f"signature store at {path} has no {SIGSTORE_META_DIR} marker: "
            "its hash family is unknown, and joining signatures across "
            "families silently disables dedup (their values never "
            "collide). If the store's lineage is known, stamp it with "
            "stamp_signature_store first.")
    m = rows[0]
    if m["hash_family"] != hash_family:
        raise RuntimeError(
            f"signature store at {path} was written with hash_family="
            f"{m['hash_family']!r} but the caller expects {hash_family!r}: "
            "signatures from different families never collide, so the "
            f"join would match nothing. Pin hash_family="
            f"{m['hash_family']!r} (and re-derive new signatures under "
            "it), or rebuild the store.")
    for name, want, got in (("num_hashes", num_hashes, m["num_hashes"]),
                            ("k", k, m["k"])):
        if want is not None and want != got:
            raise RuntimeError(
                f"signature store at {path} was written with {name}={got} "
                f"but the caller expects {name}={want}: band positions "
                "would misalign. Re-derive with the store's parameters "
                "or rebuild the store.")
    return spark.read.parquet(path)


def dedup_against_store(docs: DataFrame, store, *,
                        hash_family: str = "km_md5",
                        num_hashes: int = 8, k: int = 2,
                        append: bool = False) -> DataFrame:
    """Incremental near-dedup: docs from a NEW batch that do not LSH-collide
    with an existing corpus signature store — the "dedup today's crawl
    against the corpus" step of a growing training set.

    ``store`` is either a PATH to a family-pinned store (as written by
    ``write_signature_store`` — the marker supplies AND validates
    hash_family/num_hashes/k, mismatches raise) or an array-form signature
    DataFrame (as produced by ``minhash_signature_arrays``; the three
    parameters then describe how it was derived — the caller owns that
    contract, same as joining any two signature tables).

    Returns ``docs`` (all original columns) minus every doc sharing ANY
    (band, minhash) bucket with the store. Matching is signature-level
    (the streaming near-dup's store rule, streaming/neardup.py) — chain
    ``ngram_jaccard_pairs`` on the dropped set where exact verification
    is required. Within-batch duplicates are intentionally NOT resolved
    here (order-dependent greedy semantics belong to the streaming
    operator; for batch use, run ``exact_dedup``/``dedup_clusters`` over
    the batch first). A doc whose signatures are ALREADY in the store
    collides with itself and is dropped, so re-running a partially
    appended batch is idempotent.

    ``append=True`` (path stores only) appends the KEPT docs' signatures
    via ``write_signature_store(mode="append")`` — marker re-validated,
    so a concurrent family flip still fails loudly.

    Scale shape: the batch side explodes to num_hashes rows/doc and
    semi-joins the store's exploded signatures on (band, minhash) — ONE
    shuffle on a ~16-byte key, no doc text moves, store never touches the
    driver. At 100 TB the store side is the big one; Spark's AQE picks
    the build side, and the join key is the same uniformly-hashed
    (band, minhash) space the LSH bucket analysis in BENCH/PIPELINE.md
    bounds (cap degenerate buckets upstream when WRITING the store, via
    lsh_candidate_pairs' max_bucket_size discipline).
    """
    spark = docs.sparkSession
    if isinstance(store, str):
        store_arr = read_signature_store(spark, store,
                                         hash_family=hash_family,
                                         num_hashes=num_hashes, k=k)
    else:
        store_arr = store
        if append:
            raise ValueError(
                "append=True requires a path store (a DataFrame store has "
                "no durable location to append to)")
    sig_new = minhash_signature_arrays(docs, num_hashes, k, hash_family)
    if append:
        # the append action runs first and would otherwise recompute the
        # signature pass and the store join for the caller's novel plan
        sig_new = sig_new.localCheckpoint(eager=False)
    new_bands = minhash_signatures(docs, signatures=sig_new)
    store_bands = minhash_signatures(docs, signatures=store_arr)
    collided = new_bands.join(store_bands, ["band", "minhash"],
                              "left_semi").select("doc_id")
    if append:
        collided = collided.localCheckpoint(eager=False)
        kept_sigs = sig_new.join(collided, "doc_id", "left_anti")
        write_signature_store(kept_sigs, store, hash_family=hash_family,
                              num_hashes=num_hashes, k=k, mode="append")
    return docs.join(collided, "doc_id", "left_anti")


def minhash_signatures(docs: DataFrame, num_hashes: int = 8, k: int = 2,
                       signatures: DataFrame | None = None,
                       hash_family: str = "km_md5") -> DataFrame:
    """Long-format MinHash signature: (doc_id, band, minhash) — the join
    form, an explode of the array form (pass a precomputed/materialized
    ``signatures`` array table to share one signature pass across the
    LSH -> Jaccard -> components pipeline)."""
    arr = signatures if signatures is not None \
        else minhash_signature_arrays(docs, num_hashes, k, hash_family)
    return arr.select("doc_id", F.posexplode("sig").alias("band", "minhash"))


def lsh_candidate_pairs(docs: DataFrame, num_hashes: int = 8, k: int = 2,
                        max_bucket_size: int | None = 10_000,
                        materialize_signatures: bool = True,
                        signatures: DataFrame | None = None,
                        pair_strategy: str = "group",
                        hash_family: str = "km_md5") -> DataFrame:
    """Candidate near-dup pairs: docs sharing any (band, minhash) bucket.

    The equi-join on the bucket key is the scale move: no all-pairs shuffle,
    only docs with a colliding band meet. Returns (doc_a, doc_b, n_bands).

    ``max_bucket_size`` guards the self-join against degenerate hot buckets
    (e.g. millions of empty/boilerplate docs sharing a minhash): a bucket of
    b docs yields b^2/2 pairs, so one web-scale junk cluster would otherwise
    go quadratic. Buckets above the cap are dropped from candidate
    generation (their members are boilerplate-identical; handle them with
    exact_dedup, which is linear). None disables the cap.

    ``materialize_signatures`` (default True) localCheckpoints the compact
    array-form signature table (one row per doc) before the self-join —
    but ONLY under ``pair_strategy="join"``: Catalyst does not share the
    subtree between the join sides, so the lazy join form runs the
    shingle+md5 pipeline twice; the group plan scans it exactly once and
    skips the checkpoint (materializing there is pure cost). To share one
    signature pass across the candidate -> Jaccard -> components pipeline,
    supply your own (materialized) ``signatures`` array table.

    ``pair_strategy`` picks the within-bucket pair-generation plan; both
    produce identical results and shuffle the SAME (band, minhash) key, so
    they share one skew profile (a hot bucket lands on one reducer either
    way — that is what ``max_bucket_size`` bounds):

    - ``"group"`` (default): ONE shuffle — groupBy the bucket key, collect
      the (capped) member list, expand ordered pairs expression-side
      (posexplode x slice). No self-join, no window sort, and the bucket
      cap is a free ``size()`` filter on the aggregated row.
    - ``"join"``: the classic bucketed self-join (window count for the cap,
      equi-join, pair groupBy). Kept for memory-constrained reducers: its
      per-bucket state is streamed join rows, never a whole member array.
    """
    if pair_strategy not in ("group", "join"):
        raise ValueError(f"unknown pair_strategy {pair_strategy!r}")
    sig_arr = signatures if signatures is not None \
        else minhash_signature_arrays(docs, num_hashes, k, hash_family)
    if materialize_signatures and signatures is None and pair_strategy == "join":
        # only the self-join duplicates the signature subtree; the group
        # plan scans it exactly once, so materializing there is pure cost
        sig_arr = sig_arr.localCheckpoint(eager=True)
    sig = minhash_signatures(docs, num_hashes, k, signatures=sig_arr)

    if pair_strategy == "group":
        buckets = (sig.groupBy("band", "minhash")
                   .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
                   .filter(F.size("ids") >= 2))
        if max_bucket_size is not None:
            buckets = buckets.filter(F.size("ids") <= max_bucket_size)
        # ordered pairs from the sorted member list: (i, doc_a) x the tail
        # slice after i — doc_a < doc_b holds by construction
        e = buckets.select("ids", F.posexplode("ids").alias("i", "doc_a"))
        pairs = e.select(
            "doc_a",
            F.explode(F.slice("ids", F.col("i") + 2,
                              F.size("ids") - F.col("i") - 1)).alias("doc_b"))
        return (pairs.groupBy("doc_a", "doc_b")
                .agg(F.count("*").cast("long").alias("n_bands")))

    if max_bucket_size is not None:
        # bucket size as a WINDOW count over the same (band, minhash) key
        # the self-join shuffles on — no extra aggregation+join subtree
        # (which would re-execute the whole signature pipeline per side)
        from pyspark.sql import Window
        w = Window.partitionBy("band", "minhash")
        sig = (sig.withColumn("bucket_n", F.count("*").over(w))
               .filter(F.col("bucket_n") <= max_bucket_size)
               .drop("bucket_n"))
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
                        num_hashes: int = 8,
                        signatures: DataFrame | None = None,
                        candidates: DataFrame | None = None,
                        prefilter_margin: float | None = None,
                        hash_family: str = "km_md5") -> DataFrame:
    """Exact k-gram Jaccard for LSH candidate pairs (verification stage).

    (doc_a, doc_b, jaccard) for candidates with jaccard >= min_jaccard.
    Pass ``signatures`` (array form) and/or ``candidates`` to reuse work
    already done by an upstream LSH stage instead of recomputing it.

    ``prefilter_margin`` (opt-in): signature-level pre-filter BEFORE the
    exact shingle-set join. The LSH stage's ``n_bands`` column is the
    number of matching MinHash positions, so ``n_bands / num_hashes`` is
    the unbiased MinHash Jaccard estimate — a FREE per-pair filter (no
    extra join, no extra hash) that drops candidates whose estimate sits
    below ``min_jaccard - prefilter_margin``. The 10M rehearsal produced
    757M LSH candidates; exactly verifying all of them is the next wall
    at corpus scale, and most collide on 1 band out of many. The margin
    bounds the estimator's noise: with H INDEPENDENT band hashes
    (``band_md5``) the estimate of a true-J pair is Binomial(H, J)/H, so
    P(drop a pair with J >= min_jaccard) <= exp(-2*H*margin^2)
    (Hoeffding) — e.g. H=16, margin=0.4 -> <= 0.6% per borderline pair.
    Under the KM families (the default) band matches are positively
    correlated through the shared (h1, h2) draw, so the binomial bound is
    approximate — the estimator stays unbiased, but size margins
    conservatively (or pin band_md5) where the bound must hold exactly.
    None (default) disables the filter: exact verification of every
    candidate, the oracle-entry regime.

    Contract: candidates must carry ``n_bands`` (lsh_candidate_pairs
    always emits it) and ``num_hashes`` MUST equal the value the
    candidates were built with — n_bands does not record it, so a
    mismatch silently rescales every estimate (e.g. 16-hash candidates
    divided by the default 8 double their estimates and the cut
    under-drops; the reverse over-drops qualifying pairs)."""
    if candidates is None:
        candidates = lsh_candidate_pairs(docs, num_hashes=num_hashes, k=k,
                                         signatures=signatures,
                                         hash_family=hash_family)
    if prefilter_margin is not None:
        if "n_bands" not in candidates.columns:
            raise ValueError("prefilter_margin requires candidates with an "
                             "n_bands column (as emitted by "
                             "lsh_candidate_pairs)")
        cut = min_jaccard - prefilter_margin
        candidates = candidates.filter(
            F.col("n_bands") / F.lit(float(num_hashes)) >= cut)
    cand = candidates.select("doc_a", "doc_b")
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


def ngram_decontaminate(train: DataFrame, bench: DataFrame, k: int = 3,
                        min_contamination: float = 0.0,
                        broadcast_bench: bool = True,
                        shingle_key: str = "string") -> DataFrame:
    """Benchmark decontamination: per train doc, what fraction of its
    distinct k-gram shingles appears in ANY benchmark document —
    (doc_id, n_shingles, contaminated_n, contamination).

    The scale shape: the benchmark suite is tiny next to the corpus, so its
    distinct shingle set is BROADCAST and the check is a map-only left join
    on the corpus side (no corpus shuffle beyond the per-doc aggregate).
    Docs at or above ``min_contamination`` are returned — feed the ids to
    an anti-join to drop them from the training set.

    ``broadcast_bench=False`` switches to a shuffle join on the shingle —
    for the rare case where the "benchmark" side is itself corpus-sized
    (e.g. cross-corpus decontamination) and would not fit an executor.

    ``shingle_key`` picks the join-key representation:

    - ``"string"`` (default): the raw shingle text — exact set semantics,
      DuckDB-reproducible (the oracle mode).
    - ``"xxhash64"``: join on the JVM ``xxhash64`` of the shingle — the
      scale mode. Cuts the broadcast relation to 8 bytes/shingle and the
      probe-side compare to an int64 (the 10M rehearsal showed this stage
      DRAM-bound on hash-over-strings); a 64-bit collision can mark one
      extra shingle contaminated (P ~ n_bench_shingles * n_doc_shingles /
      2^64 per doc — vanishing), so it is OPT-IN and equivalence of
      contamination DECISIONS on seeded data is gated in tests/test_ops.py.

    Corpus-side plan: per-doc shingle dedup happens MAP-SIDE
    (``array_distinct`` on the row's shingle array before the explode) —
    a ``dropDuplicates(doc_id, shingle)`` would shuffle every corpus
    shingle (measured 424 MB for a 200k-doc slice; corpus-sized at scale)
    just to establish a per-row-computable property. The only remaining
    shuffle is the per-doc aggregate's map-side-combined partials: one
    row per doc per partition.
    """
    if shingle_key not in ("string", "xxhash64"):
        raise ValueError(f"unknown shingle_key {shingle_key!r}")
    bench_sh = shingles(bench, k=k).select("shingle")
    # same scan-parallelism guard as ``shingles``: the per-doc shingle
    # dedup + explode is the corpus-side cost center and would otherwise
    # run inside a 1-2-task scan stage on small/coarse inputs
    tr = ensure_parallelism(train.select("doc_id", "text")).select(
        "doc_id", F.explode(F.array_distinct(shingle_array(k))).alias("shingle"))
    if shingle_key == "xxhash64":
        bench_sh = bench_sh.select(F.xxhash64("shingle").alias("shingle"))
        tr = tr.select("doc_id", F.xxhash64("shingle").alias("shingle"))
    bench_sh = bench_sh.distinct().withColumn("hit", F.lit(1))
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
    marked = tr.join(bench_sh, "shingle", "left")
    return (marked.groupBy("doc_id")
            .agg(F.count("*").alias("n_shingles"),
                 F.sum(F.coalesce("hit", F.lit(0))).cast("long")
                 .alias("contaminated_n"))
            .select("doc_id", F.col("n_shingles").cast("long").alias("n_shingles"),
                    "contaminated_n",
                    F.round(F.col("contaminated_n") / F.col("n_shingles"), 4)
                    .alias("contamination"))
            .filter(F.col("contamination") >= min_contamination))


SIMHASH_BITS = 60  # 15 md5 hex chars -> non-negative int64, portable SQL


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash int64): 60-bit SimHash from md5 word hashes.

    Word hash = first 15 hex chars of md5(word) as an integer (the same
    portable trick doc_fingerprints uses — md5 is identical in DuckDB, so
    the FULL simhash value is oracle-checkable in SQL). Per bit j, the vote
    is #words-with-bit-set*2 > #words; all-occurrence voting (a repeated
    word votes once per occurrence, standard SimHash). Whole pipeline is
    explode + groupBy with 60 conditional sums — JVM codegen, no Python.
    """
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    wh = F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
    hashed = words.select("doc_id", wh.alias("wh"))
    bit_sums = [
        F.sum(F.shiftrightunsigned("wh", j).bitwiseAND(F.lit(1))).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = hashed.groupBy("doc_id").agg(F.count("*").alias("n"), *bit_sums)
    sim = None
    for j in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{j}") * 2 > F.col("n"), F.lit(1 << j)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_sql(table: str = "documents") -> str:
    """The DuckDB twin of ``simhash`` — bit-for-bit identical values."""
    sums = ", ".join(f"sum((wh >> {j}) & 1) AS s{j}" for j in range(SIMHASH_BITS))
    bits = " + ".join(
        f"(CASE WHEN s{j} * 2 > n THEN {1 << j} ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return (
        f"WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w "
        f"FROM {table}), "
        f"hashed AS (SELECT doc_id, CAST(concat('0x', substring(md5(w), 1, 15)) "
        f"AS BIGINT) AS wh FROM words), "
        f"agg AS (SELECT doc_id, count(*) AS n, {sums} FROM hashed GROUP BY doc_id) "
        f"SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM agg"
    )


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 3,
                       max_bucket_size: int | None = None) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole block bucketing.

    Recall contract: the simhash is split into ``max_hamming + 1`` equal-ish
    bit blocks; a pair within hamming distance ``max_hamming`` differs in at
    most ``max_hamming`` blocks, so it SHARES at least one exact block —
    candidate generation has guaranteed recall 1 for the advertised
    threshold (then an exact hamming check filters). More blocks = more
    bucket joins, so large max_hamming trades cost for recall guarantee.

    Pair generation uses the same single-shuffle group expansion as
    ``lsh_candidate_pairs``: groupBy the (block, bucket) key, collect the
    member list (with each member's simhash riding along), expand ordered
    pairs expression-side. ``max_bucket_size`` (OPT-IN, default None =
    uncapped so the recall guarantee above is unconditional) bounds the
    quadratic blow-up of a degenerate bucket (e.g. a boilerplate cluster
    collapsing one bit block): over-cap buckets are dropped from candidate
    generation — the recall guarantee then holds only for pairs outside
    such buckets (handle the dropped mass with exact_dedup, linear).
    """
    n_blocks = max_hamming + 1
    block_bits = (SIMHASH_BITS + n_blocks - 1) // n_blocks
    sh = simhash(docs)
    blocks = sh.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(q).alias("q"),
                F.shiftrightunsigned("simhash", block_bits * q)
                .bitwiseAND(F.lit((1 << block_bits) - 1)).alias("bucket"))
            for q in range(n_blocks)
        ])).alias("e"),
    ).select("doc_id", "simhash", "e.q", "e.bucket")
    buckets = (blocks.groupBy("q", "bucket")
               .agg(F.sort_array(F.collect_list(F.struct("doc_id", "simhash")))
                    .alias("mem"))
               .filter(F.size("mem") >= 2))
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("mem") <= max_bucket_size)
    e = buckets.select("mem", F.posexplode("mem").alias("i", "a"))
    pairs = e.select(
        F.col("a.doc_id").alias("doc_a"), F.col("a.simhash").alias("ha"),
        F.explode(F.slice("mem", F.col("i") + 2,
                          F.size("mem") - F.col("i") - 1)).alias("b"))
    cand = (pairs.select("doc_a", F.col("b.doc_id").alias("doc_b"),
                         "ha", F.col("b.simhash").alias("hb"))
            .distinct())
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select("doc_a", "doc_b", hamming.cast("int").alias("hamming")) \
               .filter(F.col("hamming") <= max_hamming)


def duplicate_spans(docs: DataFrame, window: int = 16,
                    id_col: str = "doc_id", text_col: str = "text",
                    span_key: str = "md5",
                    owner_strategy: str = "agg") -> DataFrame:
    """Exact substring-dedup statistics, the Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499) signal at document granularity: every
    ``window``-token span is owned by the corpus-wide FIRST document
    containing it (min ``id_col``); a span occurring in any LATER doc is
    a duplicated span. Returns one row per doc:
    (doc_id, n_spans, n_dup_spans, dup_frac) — filter on ``dup_frac``
    to drop heavily-duplicated docs, or feed the flagged docs to a
    span-removal rewrite. Docs shorter than ``window`` tokens form ONE
    span over all their tokens; a doc's own repeats of a span it owns
    are NOT counted as duplicates (ownership is per-document).

    ``span_key="md5"`` (default) keys spans by the first 15 md5 hex
    chars (60 bits) — DuckDB-portable, oracle-checkable;
    ``"xxhash64"`` is the engine-hash opt-in (full 64 bits, ~2x less
    hashing CPU, no SQL twin) — same trade documented on
    ``minhash_signature_arrays``.

    Scale shape: the span fan-out (~n_tokens rows/doc) is MAP-ONLY and
    hashes each span string to an 8-byte key before anything moves —
    the exchange carries (doc_id, fp) pairs only, never span text.

    ``owner_strategy`` picks how the corpus-wide min owner per span key
    is computed; both produce identical rows:

    - ``"agg"`` (default, round 7): fully COMBINER-FRIENDLY — spans
      first collapse to (doc_id, fp, count) in one map-side-combined
      groupBy; the owner then comes from ``min(struct(doc_id, count))``
      per fp, whose partial aggregation collapses a viral span (one
      16-gram in 10^10 rows at corpus scale) to ONE candidate row per
      map task, and the per-doc answer is
      ``n_dup = n_spans - owned_instances`` — an equi-join of two
      doc-keyed count tables, never a per-instance join back. No stage
      anywhere receives all copies of a hot key on one task (the
      map-side exchange is computed once and reused by both aggregation
      branches — ReusedExchange in the plan).
    - ``"window"``: the round-6 single-shuffle analytic window
      (min over ``Window.partitionBy(fp)``). One shuffle fewer for
      skew-free corpora, but a window partition cannot be pre-aggregated
      or split (AQE skew handling covers joins, NOT WindowExec), so
      every copy of a hot span lands on one reducer — opt-in only where
      the span-frequency distribution is known benign.

    No all-pairs stage exists at any scale under either strategy.
    """
    from pyspark.sql import Window

    if span_key not in ("md5", "xxhash64"):
        raise ValueError(f"unknown span_key {span_key!r}")
    if owner_strategy not in ("agg", "window"):
        raise ValueError(f"unknown owner_strategy {owner_strategy!r}")
    toks = F.split(F.col(text_col), " ")
    n_spans = F.greatest(F.size(toks) - F.lit(window - 1), F.lit(1))
    spans = F.transform(
        F.sequence(F.lit(1), n_spans),
        lambda i: F.array_join(F.slice(toks, i, window), " "))
    span_col = F.explode(spans).alias("span")
    fp = (F.xxhash64("span") if span_key == "xxhash64"
          else F.conv(F.substring(F.md5("span"), 1, 15), 16, 10)
          .cast("long"))
    per_span = (ensure_parallelism(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)))
        .select("doc_id", span_col)
        .select("doc_id", fp.alias("fp")))
    if owner_strategy == "window":
        owner = F.min("doc_id").over(Window.partitionBy("fp"))
        flagged = per_span.select(
            "doc_id", (F.col("doc_id") > owner).cast("long").alias("is_dup"))
        return (flagged.groupBy("doc_id")
                .agg(F.count("*").cast("long").alias("n_spans"),
                     F.sum("is_dup").alias("n_dup_spans"))
                .select("doc_id", "n_spans", "n_dup_spans",
                        (F.col("n_dup_spans") / F.col("n_spans"))
                        .alias("dup_frac")))
    # combiner-friendly owner selection: an instance is non-dup iff its
    # doc IS the span's min owner, so
    #   n_dup(doc) = n_spans(doc) - sum of counts over spans doc owns.
    # (doc_id, fp) collapses within-doc repeats map-side; min(struct)
    # partials collapse the hot fp to one row per task; both branches
    # reuse the same map-side exchange.
    per_span_c = (per_span.groupBy("doc_id", "fp")
                  .agg(F.count("*").alias("__c")))
    totals = per_span_c.groupBy("doc_id").agg(
        F.sum("__c").cast("long").alias("n_spans"))
    owned = (per_span_c.groupBy("fp")
             .agg(F.min(F.struct("doc_id", "__c")).alias("__w"))
             .groupBy(F.col("__w.doc_id").alias("doc_id"))
             .agg(F.sum("__w.__c").alias("__own")))
    return (totals.join(owned, "doc_id", "left")
            .select("doc_id", "n_spans",
                    (F.col("n_spans") - F.coalesce("__own", F.lit(0)))
                    .cast("long").alias("n_dup_spans"))
            .select("doc_id", "n_spans", "n_dup_spans",
                    (F.col("n_dup_spans") / F.col("n_spans"))
                    .alias("dup_frac")))
