"""Streaming near-duplicate dedup against a persistent signature store.

The incremental-crawl shape: documents arrive in micro-batches; each batch
is LSH-checked against EVERYTHING ingested so far (a parquet store of
(doc_id, band, minhash) bucket rows) plus itself, novel docs are emitted,
and their signatures are appended to the store — so a page seen in any
earlier batch (or earlier in this batch, by doc_id order) never re-emits.

Novelty contract (deterministic, order-greedy): WITHIN a micro-batch,
docs are scanned in ascending doc_id; a doc is NOVEL iff none of its
(band, minhash) buckets has been seen before — in the store or on an
already-kept doc. ACROSS batches, arrival order wins (a doc in an earlier
batch keeps its buckets regardless of id) — first-arrival semantics, like
any streaming dedup. The streaming result therefore equals the same
``greedy_novel`` applied chunk-by-chunk in arrival order (gated in
tests/test_streaming.py), NOT a globally id-sorted batch pass over the
concatenation. Docs with NULL text produce no shingles: they cannot
collide, so they are emitted as trivially novel with nothing stored.

Scale posture: the store-vs-batch collision check is a distributed
semi-join on the bucket key (the store never leaves executors; at corpus
scale it is bucketed-by-minhash parquet). The within-batch greedy has two
implementations producing the identical novel set: the default collects
only the BATCH's signatures — a micro-batch is driver-sized by definition
(same assumption as foreachBatch sketch merging); KEEP it that way by
bounding the trigger (``maxFilesPerTrigger`` / ``maxOffsetsPerTrigger``)
on fat sources, and the ``max_batch_rows`` guard raises loudly if not —
and ``within_batch="distributed"`` runs the greedy as iterated
local-minima MIS rounds (``greedy_novel_distributed``) with nothing
batch-sized on the driver, for fat bootstrap/replay batches no trigger
bound can shrink. Kept-doc filtering back onto the batch is a semi-join
on a created-from-ids DataFrame (never an ``isin`` literal list, which
would grow the PLAN with the batch). Replay
discipline mirrors ForeachBatchSketcher: at-least-once redeliveries are
skipped via a batch-id high-watermark tied to a run token, and the store
append is guarded by recording emitted batch ids — a replayed batch
neither re-emits nor double-appends.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

from ..ops.dedup import minhash_signature_arrays

STORE_SCHEMA = "doc_id long, band int, minhash string"


def greedy_novel_distributed(sigs: DataFrame, max_rounds: int = 200) -> DataFrame:
    """The order-greedy novelty rule, computed DISTRIBUTED: (doc_id) frame
    of the docs ``greedy_novel`` would keep, without collecting signatures.

    The greedy scan is a lexicographic maximal-independent-set over the
    conflict graph "shares >= 1 (band, minhash) bucket", and lexicographic
    greedy MIS equals iterated local-minima selection: each round KEEPS
    every undecided doc that is the minimum doc_id in ALL of its buckets
    (= minimum among its conflict neighbors), REJECTS undecided docs
    sharing a bucket with a newly-kept doc, and recurses on the rest.
    Rejected docs never claim buckets — identical to the driver greedy
    (equivalence gated in tests/test_streaming.py).

    Each round is two bucket-keyed shuffles on the REMAINING docs only and
    the frontier shrinks by at least the global-minimum doc per round (in
    practice geometrically: everything outside collision clusters resolves
    in round 1, chains inside a cluster take one round per link). The
    per-round state is localCheckpointed to cut compounding lineage, same
    discipline as ops.relational.dedup_components. Raises if ``max_rounds``
    rounds leave docs undecided (a pathological >200-link dependency chain
    — at that depth the corpus needs exact_dedup first, not near-dup).
    """
    und = (sigs.select("doc_id", F.posexplode("sig").alias("band", "minhash"))
           .localCheckpoint(eager=True))
    spark = sigs.sparkSession
    kept_all = spark.createDataFrame([], "doc_id long")
    kept_rounds: list = []
    for _ in range(max_rounds):
        if not und.limit(1).count():
            und.unpersist()
            # materialize the union ONCE, then free the per-round blocks
            # (the returned frame is self-contained; caller unpersists it)
            out = kept_all.localCheckpoint(eager=True)
            for kr in kept_rounds:
                kr.unpersist()
            return out
        mins = und.groupBy("band", "minhash").agg(F.min("doc_id").alias("mn"))
        # materialized per round: kept_all and the next frontier both read
        # it, and the parent frontier's checkpoint blocks are freed below
        kept = (und.join(mins, ["band", "minhash"])
                .groupBy("doc_id")
                .agg(F.max(F.when(F.col("doc_id") != F.col("mn"), 1)
                           .otherwise(0)).alias("blocked"))
                .filter("blocked = 0").select("doc_id")
                .localCheckpoint(eager=True))
        kept_rounds.append(kept)
        kept_buckets = (und.join(kept, "doc_id", "left_semi")
                        .select("band", "minhash").distinct())
        decided = kept.unionByName(
            und.join(kept_buckets, ["band", "minhash"], "left_semi")
            .select("doc_id").distinct())
        nxt = und.join(decided, "doc_id", "left_anti") \
                 .localCheckpoint(eager=True)
        kept_all = kept_all.unionByName(kept)
        und.unpersist()
        und = nxt
    raise RuntimeError(
        f"greedy_novel_distributed did not converge in {max_rounds} rounds: "
        "the batch contains a dependency chain longer than max_rounds "
        "(every round resolves at least one link). Raise max_rounds, or "
        "exact-dedup the batch first to collapse the chain.")


def greedy_novel(sig_rows: list, seen_buckets: set) -> list:
    """Order-greedy novelty: ``sig_rows`` = (doc_id, [minhash per band]),
    scanned in ascending doc_id. Mutates ``seen_buckets`` with kept docs'
    buckets; returns kept doc_ids."""
    novel = []
    for doc_id, sig in sorted(sig_rows, key=lambda r: r[0]):
        buckets = [(band, mh) for band, mh in enumerate(sig)]
        if any(b in seen_buckets for b in buckets):
            continue
        seen_buckets.update(buckets)
        novel.append(doc_id)
    return novel


class StreamingNearDupDedup:
    """foreachBatch sink: near-dup-dedup each micro-batch against the
    persistent store, emit novel docs to ``out_dir`` parquet, append their
    bucket rows to ``store_dir`` parquet.

    Usage:
        dd = StreamingNearDupDedup(base_dir, num_hashes=8, k=2)
        q = (stream.writeStream.foreachBatch(dd)
             .trigger(availableNow=True)
             .option("checkpointLocation", ckpt).start())
    """

    def __init__(self, base_dir: str, num_hashes: int = 8, k: int = 2,
                 run_token: str | None = None,
                 max_batch_rows: int = 5_000_000,
                 hash_family: str = "km_md5",
                 within_batch: str = "driver") -> None:
        self.base_dir = base_dir
        self.store_dir = os.path.join(base_dir, "store")
        self.out_dir = os.path.join(base_dir, "novel")
        self.meta_path = os.path.join(base_dir, "meta.json")
        self.num_hashes = num_hashes
        self.k = k
        self.run_token = run_token
        # ``within_batch`` picks the within-batch greedy implementation
        # (both produce the identical novel set — gated in tests):
        # - "driver" (default): collect the batch's signatures, one Python
        #   pass. Lowest latency for the common driver-sized micro-batch;
        #   guarded by max_batch_rows below.
        # - "distributed": iterated local-minima MIS rounds, nothing
        #   batch-sized ever reaches the driver — for fat replay/bootstrap
        #   batches (e.g. trigger(availableNow) over a month of backlog)
        #   where no trigger bound keeps the batch driver-sized.
        if within_batch not in ("driver", "distributed"):
            raise ValueError(f"unknown within_batch {within_batch!r}")
        self.within_batch = within_batch
        # loud guard on the driver-sized-micro-batch assumption: the
        # "driver" greedy collects one signature row per doc, so a fat
        # batch would otherwise become a SILENT driver OOM. Sized for
        # ~1 KB/row -> a few GB of driver heap at the default. Not
        # consulted in "distributed" mode.
        self.max_batch_rows = max_batch_rows
        # the store is FAMILY-PINNED: signatures from different hash
        # families never collide (km decimal vs band hex strings), so
        # mixing them would silently disable dedup against everything
        # already stored. The family is recorded in meta.json and checked
        # on every batch; a pre-round-5 store (no recorded family) was
        # written by the then-default band_md5.
        self.hash_family = hash_family
        os.makedirs(base_dir, exist_ok=True)

    # NOTE: the (run_token, last_batch_id, atomic tmp+rename) replay guard
    # here mirrors ForeachBatchSketcher._load/_store (windowed.py), where
    # the guard is coupled to per-window sketch payloads; a semantics fix
    # to either must be applied to both (see commit a7d0c2f).
    def _load_meta(self) -> int:
        if not os.path.exists(self.meta_path):
            return -1
        with open(self.meta_path) as f:
            obj = json.load(f)
        # family mismatch is fatal regardless of lineage: the parquet
        # store under store_dir was written by obj's family, and a new
        # run_token does not rewrite it
        stored_fam = obj.get("hash_family", "band_md5")
        if stored_fam != self.hash_family:
            raise RuntimeError(
                f"signature store at {self.base_dir} was written with "
                f"hash_family={stored_fam!r} but this instance is "
                f"configured with {self.hash_family!r}: the families' "
                "signatures never collide, so continuing would silently "
                "stop deduplicating against everything already stored. "
                f"Pin hash_family={stored_fam!r}, or point at a fresh "
                "base_dir to start a new store.")
        if self.run_token is not None and obj.get("run_token") != self.run_token:
            return -1  # new checkpoint lineage: batch ids restart at 0
        return obj.get("last_batch_id", -1)

    def _store_meta(self, batch_id: int) -> None:
        tmp = f"{self.meta_path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"last_batch_id": batch_id,
                       "run_token": self.run_token,
                       "hash_family": self.hash_family}, f)
        os.replace(tmp, self.meta_path)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self._load_meta():
            return  # at-least-once redelivery of an applied batch
        spark = batch_df.sparkSession
        sigs = minhash_signature_arrays(batch_df, self.num_hashes, self.k,
                                        hash_family=self.hash_family) \
            .localCheckpoint(eager=True)
        novel_ckpt = None
        try:
            if self.within_batch == "driver":
                n_sig = sigs.count()  # metadata-cheap: sigs is checkpointed
                if n_sig > self.max_batch_rows:
                    raise RuntimeError(
                        f"micro-batch has {n_sig} signature rows > "
                        f"max_batch_rows={self.max_batch_rows}: the "
                        "within-batch greedy pass collects the BATCH's "
                        "signatures to the driver (the store never leaves "
                        "executors). Bound the trigger on the source "
                        "(maxFilesPerTrigger / maxOffsetsPerTrigger) so "
                        "micro-batches stay driver-sized, raise "
                        "max_batch_rows with matching driver memory, or "
                        "switch to within_batch='distributed'.")
            # distributed store-collision check: in driver mode only
            # COLLIDED batch ids come back to the driver; in distributed
            # mode nothing does — the store never leaves executors either way
            exploded = sigs.select(
                "doc_id", F.posexplode("sig").alias("band", "minhash"))
            if os.path.exists(self.store_dir):
                store = spark.read.schema(STORE_SCHEMA).parquet(self.store_dir)
                collided_ids = (exploded
                                .join(store, ["band", "minhash"], "left_semi")
                                .select("doc_id").distinct())
            else:
                collided_ids = None

            if self.within_batch == "distributed":
                cand = sigs if collided_ids is None else \
                    sigs.join(collided_ids, "doc_id", "left_anti")
                # returned frame is already materialized (localCheckpoint
                # inside greedy_novel_distributed); unpersisted in finally
                novel_ckpt = greedy_novel_distributed(cand)
                novel_keep = novel_ckpt
                has_novel = bool(novel_keep.limit(1).count())
                store_novel_broadcastable = False
            else:
                collided = set() if collided_ids is None else \
                    {r["doc_id"] for r in collided_ids.collect()}
                # batch signatures are driver-sized; greedy pass resolves
                # within-batch collisions deterministically by doc_id order
                rows = [(r["doc_id"], list(r["sig"])) for r in sigs.collect()
                        if r["doc_id"] not in collided]
                novel = set(greedy_novel(rows, set()))
                # Kept-id filters are broadcast SEMI-JOINS against a
                # created-from-ids DataFrame, not isin() — a fat batch's
                # IN-list would bloat the plan (one literal per kept doc)
                # and serialize through expression parsing; a broadcast
                # hash relation is O(ids) bytes shipped once per executor.
                novel_keep = spark.createDataFrame(
                    [(int(i),) for i in sorted(novel)], "doc_id long")
                has_novel = bool(novel)
                store_novel_broadcastable = True
            # docs with NULL text have no shingles (the signature pipeline
            # drops them) — they can never collide with anything, so they
            # are trivially novel: emit them, nothing to store. Resolved
            # DISTRIBUTED (anti-join against the signature ids), never by
            # collecting the batch's ids: the max_batch_rows guard bounds
            # SIGNATURE rows only, and a batch that is mostly sig-less
            # (e.g. a broken upstream extractor NULLing text) can be
            # arbitrarily larger than it.
            sigless_ids = batch_df.select("doc_id").join(
                sigs.select("doc_id"), "doc_id", "left_anti")
            has_sigless = bool(sigless_ids.limit(1).count())
            if has_novel or has_sigless:
                # crash ordering: OUT before STORE, with an idempotence
                # guard. crash after out/before store -> replay recomputes
                # the same novel set (store unchanged) and the anti-join
                # skips re-append; crash after store/before meta -> replay
                # sees the docs collide with their own stored buckets,
                # emits nothing, and out already has them from before the
                # crash. Either way: exactly once.
                emit_ids_df = novel_keep.unionByName(sigless_ids)
                emit = batch_df.join(emit_ids_df, "doc_id", "left_semi")
                if os.path.exists(self.out_dir):
                    prior = spark.read.parquet(self.out_dir).select("doc_id")
                    emit = emit.join(prior, "doc_id", "left_anti")
                (emit.withColumn("__batch_id", F.lit(batch_id))
                 .write.mode("append").parquet(self.out_dir))
                if has_novel:
                    store_keep = F.broadcast(novel_keep) \
                        if store_novel_broadcastable else novel_keep
                    (sigs.join(store_keep, "doc_id", "left_semi")
                     .select("doc_id",
                             F.posexplode("sig").alias("band", "minhash"))
                     .write.mode("append").parquet(self.store_dir))
            self._store_meta(batch_id)
        finally:
            sigs.unpersist()
            if novel_ckpt is not None:
                novel_ckpt.unpersist()

    def novel_docs(self, spark) -> DataFrame:
        return spark.read.parquet(self.out_dir)
